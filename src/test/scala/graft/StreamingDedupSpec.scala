package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SaveMode
import graft.streaming.StreamingDedup

/** StreamingDedup: first-seen-wins across micro-batches AND restarts
  * (state store continuity), duplicates dropped by content not id, and
  * the in-batch dedup contract.
  */
class StreamingDedupSpec extends SparkSuite {
  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")

  private def write(dir: String, rows: Seq[(Long, String, Timestamp)]): Unit =
    rows.toDF("doc_id", "text", "ingest_ts")
      .repartition(1)
      .write.mode(SaveMode.Append).parquet(dir)

  test("cross-batch and cross-restart duplicates collapse to first arrival") {
    val root = Files.createTempDirectory("graft-sdd").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")

    write(in, Seq((1L, "alpha", ts(0)), (2L, "beta", ts(0)), (3L, "alpha", ts(1))))
    StreamingDedup.runOnce(spark, in, out, ckpt)
    val first = spark.read.parquet(out).collect()
    assert(first.length == 2, s"in-batch dup not dropped: ${first.toSeq}")
    assert(first.map(_.getString(1)).distinct.length == 2)

    // restart with new arrivals: 'beta' is a cross-restart duplicate
    // (only state-store continuity can catch it), 'gamma' is new
    write(in, Seq((4L, "beta", ts(2)), (5L, "gamma", ts(2))))
    StreamingDedup.runOnce(spark, in, out, ckpt)
    val docs = spark.read.parquet(out)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs.size == 3, s"expected alpha,beta,gamma once each: $docs")
    assert(docs.values.toSet == Set("alpha", "beta", "gamma"))
    assert(!docs.contains(4L), "cross-restart duplicate of 'beta' survived")
    assert(docs.contains(5L), "new doc 'gamma' missing")
  }
}
