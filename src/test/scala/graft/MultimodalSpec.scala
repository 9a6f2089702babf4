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

  test("frame sampling explodes one video into N frames by duration") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
    val perMedia = frames.groupBy("media_id").count()
    val joined = media.filter(col("kind") === "video")
      .select(col("media_id"), (col("meta.durationMs") / 1000 + 1).cast("long").as("expect"))
      .join(perMedia, "media_id")
    assert(joined.filter(col("count") =!= col("expect")).isEmpty)
  }
}
