package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: schema contract, deterministic stub decode,
  * partition-parallel batch shape, frame-sampling explode shape.
  */
class MultimodalSpec extends SparkSuite {

  private def media = Multimodal.fromDocuments(
    spark.read.parquet(sf("sf0.001") + "/documents.parquet"))

  test("media table schema: binary payload + typed metadata struct") {
    val sch = media.schema
    assert(sch("content").dataType.typeName == "binary")
    val meta = sch("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq ==
      Seq("width", "height", "sampleRateHz", "durationMs", "format"))
  }

  test("stub decode is deterministic and row-independent") {
    val a = Multimodal.extractFeatures(spark, media, dim = 16)
      .collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(spark, media, dim = 16)
      .collect().sortBy(_.media_id)
    assert(a.length == 500 && a.forall(_.features.length == 16))
    assert(a.zip(b).forall { case (x, y) =>
      x.features.sameElements(y.features) })
    assert(a.forall(_.features.forall(f => f >= -1f && f <= 1f)))
    // distinct payloads ⇒ distinct features (hash quality smoke)
    assert(a.map(_.features.toSeq).distinct.length == a.length)
  }

  test("feature extraction is partition-parallel (no collect/driver loop)") {
    val ds = Multimodal.extractFeatures(spark, media.repartition(4), dim = 4)
    assert(ds.rdd.getNumPartitions == 4)
    assert(ds.count() == 500)
  }

  test("resize rewrites typed metadata only") {
    val r = Multimodal.resize(media, 224, 224)
    val row = r.select("meta.width", "meta.height", "meta.format").head()
    assert(row.getInt(0) == 224 && row.getInt(1) == 224)
    assert(Seq("png", "wav", "mp4").contains(row.getString(2)))
  }

  test("mm_phash_pairs: planted near-dup images pair up, unrelated and " +
      "non-image payloads don't") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-phash").toString
    def words(seed: Int, n: Int): String =
      (0 until n).map(i => s"w${(i * 31 + seed * 7) % 97}_$seed" +
        (if (i % 5 == 0) s" common$i" else "")).mkString(" ")
    val base = (0 until 60).map(i => s"tok${i * 13 % 101}").mkString(" ")
    val near = base.split(" ").updated(20, "EDITED").mkString(" ")
    val docs = Seq(
      (3L, base),          // image kind (doc_id % 3 == 0)
      (6L, base),          // exact duplicate image → hamming 0
      (9L, near),          // one-token edit → few bits
      (12L, words(5, 60)), // unrelated image → far
      (4L, base))          // identical payload but NOT image kind
    docs.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$tmp/documents.parquet")

    val got = graft.queries.MultimodalQueries.queries("mm_phash_pairs")(
        spark, tmp)
      .collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")) ->
        r.getAs[Long]("hamming")).toMap

    assert(got((3L, 6L)) == 0L, s"exact dup must be hamming 0: $got")
    assert(got.contains((3L, 9L)) && got((3L, 9L)) <= 10L,
      s"one-token edit must land under the threshold: $got")
    assert(got.contains((6L, 9L)), s"near-dup pairs with both copies: $got")
    assert(!got.keys.exists(p => p._1 == 12L || p._2 == 12L),
      s"unrelated image must not pair: $got")
    assert(!got.keys.exists(p => p._1 == 4L || p._2 == 4L),
      s"non-image media must not enter the image near-dup pass: $got")
  }

  test("mm_video_near_pairs: planted trimmed copy and one-frame re-encode " +
      "pair with the original; unrelated and non-video payloads don't") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-vnear").toString
    // 3 frames of 32 tokens each
    val full = (0 until 96).map(i => s"t${i * 17 % 191}_v").toVector
    val trimmed = full.drop(32)                 // first frame cut away
    val reenc = full.updated(40, "GLITCH")      // one token inside frame 1
    val other = (0 until 96).map(i => s"u${i * 13 % 181}_w").toVector
    val docs = Seq(
      (2L, full.mkString(" ")),     // video (doc_id % 3 == 2): original
      (5L, trimmed.mkString(" ")),  // video: frame-aligned trim
      (8L, reenc.mkString(" ")),    // video: re-encode artifact in frame 1
      (11L, other.mkString(" ")),   // video: unrelated
      (3L, full.mkString(" ")))     // identical payload but image kind
    docs.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$tmp/documents.parquet")

    val got = graft.queries.MultimodalQueries
      .queries("mm_video_near_pairs")(spark, tmp)
      .collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")) ->
        ((r.getAs[Long]("shared_frames"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b")))).toMap

    // trim: both surviving windows hash identically -> containment 1
    assert(got.get((2L, 5L)).contains((2L, 3L, 2L)),
      s"trimmed copy must pair with full containment: $got")
    // re-encode: frames 0 and 2 survive the frame-1 edit (2*2 >= 3)
    assert(got.get((2L, 8L)).contains((2L, 3L, 3L)),
      s"one-frame re-encode must pair on the untouched frames: $got")
    assert(!got.keys.exists(p => p._1 == 11L || p._2 == 11L),
      s"unrelated video must not pair: $got")
    assert(!got.keys.exists(p => p._1 == 3L || p._2 == 3L),
      s"non-video media must not enter the video near-dup pass: $got")
  }

  test("mm_audio_near_pairs: planted exact dup, end-trim and local edit " +
      "pair with the original; unrelated and non-audio payloads don't") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-anear").toString
    // 140 tokens — enough for all 65 fingerprint windows (stride 2, w 4)
    val full = (0 until 140).map(i => s"s${i * 19 % 211}_a").toVector
    val trimmed = full.dropRight(20)            // end trim: late bits only
    val edited = full.updated(30, "CLICK")      // local artifact: ≤4 bits
    val other = (0 until 140).map(i => s"z${i * 23 % 199}_b").toVector
    val docs = Seq(
      (1L, full.mkString(" ")),     // audio (doc_id % 3 == 1): original
      (4L, full.mkString(" ")),     // audio: exact duplicate → hamming 0
      (7L, trimmed.mkString(" ")),  // audio: end trim
      (10L, edited.mkString(" ")),  // audio: one-token local edit
      (13L, other.mkString(" ")),   // audio: unrelated
      (2L, full.mkString(" ")))     // identical payload but video kind
    docs.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$tmp/documents.parquet")

    val got = graft.queries.MultimodalQueries
      .queries("mm_audio_near_pairs")(spark, tmp)
      .collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")) ->
        r.getAs[Long]("hamming")).toMap

    assert(got((1L, 4L)) == 0L, s"exact dup must be hamming 0: $got")
    // a trim at the END leaves every earlier window — and its sign-of-
    // derivative bit — identical; only windows crossing the cut move
    assert(got.contains((1L, 7L)) && got((1L, 7L)) <= 10L,
      s"end-trim must land under the threshold: $got")
    // a one-token edit touches ≤2 windows ⇒ ≤4 fingerprint bits
    assert(got.contains((1L, 10L)) && got((1L, 10L)) <= 4L,
      s"local edit must flip at most 4 bits: $got")
    assert(!got.keys.exists(p => p._1 == 13L || p._2 == 13L),
      s"unrelated audio must not pair: $got")
    assert(!got.keys.exists(p => p._1 == 2L || p._2 == 2L),
      s"non-audio media must not enter the audio near-dup pass: $got")
  }

  test("frame sampling explodes one video into N frames by duration") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
    val perMedia = frames.groupBy("media_id").count()
    val joined = media.filter(col("kind") === "video")
      .select(col("media_id"), (col("meta.durationMs") / 1000 + 1).cast("long").as("expect"))
      .join(perMedia, "media_id")
    assert(joined.filter(col("count") =!= col("expect")).isEmpty)
  }
}
