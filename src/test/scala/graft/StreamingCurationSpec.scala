package graft

import org.apache.spark.sql.functions._
import graft.queries.{CurationQueries, TextQueries}
import graft.streaming.StreamingCuration

/** Stream/batch parity for stream-time curation: the streaming split must
  * agree document-for-document with the oracle-checked batch filter, and
  * the curated stream must carry scrubbed text.
  */
class StreamingCurationSpec extends SparkSuite {

  test("streaming curation partitions the input; verdicts and reasons " +
      "match the batch filter; curated text is PII-scrubbed") {
    val root = java.nio.file.Files.createTempDirectory("scur").toString
    val ok = "the cat sat on a mat of straw and felt quite fine today yes"
    val rows = Seq(
      (1L, ok, "en", "src0"),
      (2L, ok + " reach me at bob@example.com now", "en", "src0"),
      (3L, "the of a", "en", "src0"),                        // too_short
      (4L, ok + " " + Seq.fill(20)("spam").mkString(" "), "en",
        "src0"),                                             // repetitive
      (5L, "palabras sin articulos ingleses aqui mismo hoy bien tal vez",
        "es", "src1"))                                       // no_stopwords
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$root/in/documents.parquet")

    val q = StreamingCuration.start(spark, s"$root/in/documents.parquet",
      s"$root/curated", s"$root/rejected", s"$root/ckpt")
    q.awaitTermination()

    val curated = spark.read.parquet(s"$root/curated")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rejected = spark.read.parquet(s"$root/rejected")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // Partition: every doc lands in exactly one stream.
    assert(curated.keySet.intersect(rejected.keySet).isEmpty)
    assert(curated.keySet ++ rejected.keySet == rows.map(_._1).toSet)

    // Parity with the oracle-checked batch filter.
    val batch = CurationQueries.queries("curation_gopher_filter")(
      spark, s"$root/in")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(4), r.getBoolean(5)))).toMap
    assert(curated.keySet == batch.filter(_._2._2).keySet)
    rejected.foreach { case (id, reasons) =>
      assert(reasons == batch(id)._1, s"doc $id: $reasons vs ${batch(id)._1}")
    }

    // The curated stream's text is scrubbed (and only where PII existed).
    assert(curated(2L) == ok + " reach me at <PII> now")
    assert(curated(1L) == ok)

    // Idempotent restart: the checkpoint replays nothing — outputs stay
    // identical after a second availableNow run over the same input.
    val q2 = StreamingCuration.start(spark, s"$root/in/documents.parquet",
      s"$root/curated", s"$root/rejected", s"$root/ckpt")
    q2.awaitTermination()
    assert(spark.read.parquet(s"$root/curated").count() == curated.size)
    assert(spark.read.parquet(s"$root/rejected").count() == rejected.size)
  }
}
