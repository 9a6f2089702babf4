package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** Fixture pin for the PII scrub: the gated corpus is digit-free (every
  * count 0 there, which the oracle replays bit-exactly but which exercises
  * nothing), so the masking semantics are pinned here on constructed PII.
  */
class TextPiiSpec extends SparkSuite {

  test("emails, phones and IPv4s are counted and masked; clean text keeps " +
      "its surroundings; PII-free text passes through untouched") {
    val dir = java.nio.file.Files.createTempDirectory("pii").toString
    val rows = Seq(
      (1L, "contact alice.smith+spam@example.co.uk for details", "en", "src0"),
      (2L, "call +1 (555) 123-4567 or 555 987 6543 today", "en", "src0"),
      (3L, "server at 10.0.255.1 responded", "en", "src0"),
      (4L, "nothing sensitive here at all", "en", "src0"))
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")

    val out = TextQueries.queries("text_pii_scrub")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((1L, 0L, 0L, "contact <PII> for details".length.toLong)))
    assert(out(2L)._2 == 2L, s"phones: ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 1L, "server at <PII> responded".length.toLong)))
    // pass-through: no counts, clean_len == original length
    assert(out(4L) == ((0L, 0L, 0L, rows(3)._2.length.toLong)))

    // The masked TEXT itself (the column a pipeline would write out):
    val masked = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), TextQueries.piiScrub(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(masked(1L) == "contact <PII> for details")
    assert(masked(2L) == "call <PII> or <PII> today")
    assert(masked(3L) == "server at <PII> responded")
    assert(masked(4L) == rows(3)._2)
  }
}
