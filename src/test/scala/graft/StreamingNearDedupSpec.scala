package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalDedup
import graft.streaming.StreamingNearDedup

/** Streaming near-dedup: per-arrival probe against the persisted band
  * index must agree with the batch IncrementalDedup run at every step,
  * the index must accumulate exactly once, and a no-new-data restart
  * must be a no-op.
  */
class StreamingNearDedupSpec extends SparkSuite {
  import spark.implicits._

  private def docsSlice(lo: Long, hi: Long): DataFrame =
    spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select(col("doc_id"), col("text"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
          .as("ingest_ts"))

  test("arrival-order probes match the batch operator at every step; " +
      "index accumulates exactly once; empty restart is a no-op") {
    val root = Files.createTempDirectory("snd").toString
    val slices = Seq(docsSlice(0, 40), docsSlice(40, 80), docsSlice(80, 200))

    var expected = Set.empty[(Long, Long, Double)]
    var indexedSoFar: Option[DataFrame] = None
    for ((slice, k) <- slices.zipWithIndex) {
      // reference: batch probe of this arrival against everything before
      val deltaIdx = IncrementalDedup.buildIndex(slice)
      indexedSoFar.foreach { idx =>
        expected ++= IncrementalDedup.probe(idx, deltaIdx, cap = 50)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }
      indexedSoFar = Some(indexedSoFar
        .map(_.unionByName(deltaIdx)).getOrElse(deltaIdx)
        .localCheckpoint())

      // stream: the arrival lands as a new file, the query drains it
      slice.coalesce(1).write.mode("append").parquet(s"$root/in")
      StreamingNearDedup.runOnce(spark, s"$root/in", s"$root/pairs",
        s"$root/index", s"$root/ckpt")

      val got = StreamingNearDedup.pairsView(spark, s"$root/pairs")
        .select("delta_id", "base_id", "est_jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == expected,
        s"step $k: stream-only=${got.diff(expected)} " +
          s"batch-only=${expected.diff(got)}")
    }
    assert(expected.nonEmpty,
      "fixture should contain cross-arrival near-dup pairs")

    // every doc indexed exactly once (8 band rows each)
    val nDocs = slices.map(_.count()).sum
    val idx = spark.read.parquet(s"$root/index")
    assert(idx.count() == nDocs * 8)
    assert(idx.select("doc_id").distinct().count() == nDocs)

    // a restart with nothing new changes neither pairs nor index
    val pairsBefore = spark.read.parquet(s"$root/pairs").count()
    StreamingNearDedup.runOnce(spark, s"$root/in", s"$root/pairs",
      s"$root/index", s"$root/ckpt")
    assert(spark.read.parquet(s"$root/pairs").count() == pairsBefore)
    assert(spark.read.parquet(s"$root/index").count() == nDocs * 8)
  }

  test("crash between pairs append and index append: replay duplicates " +
      "raw pairs, pairsView stays exactly-once, index exactly-once") {
    val root = Files.createTempDirectory("snd-fault").toString
    docsSlice(0, 100).coalesce(1).write.mode("append").parquet(s"$root/in")
    StreamingNearDedup.runOnce(spark, s"$root/in", s"$root/pairs",
      s"$root/index", s"$root/ckpt")

    // second arrival: exact copies of indexed docs under new ids —
    // guaranteed est=1.0 pairs against the index; crash once in the gap
    docsSlice(0, 50)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .coalesce(1).write.mode("append").parquet(s"$root/in")
    var armed = true
    StreamingNearDedup.faultpoint = _ =>
      if (armed) { armed = false; throw new RuntimeException("injected") }
    try intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingNearDedup.runOnce(spark, s"$root/in", s"$root/pairs",
        s"$root/index", s"$root/ckpt")
    } finally StreamingNearDedup.faultpoint = _ => ()

    // restart: the batch replays (pairs re-append), then commits
    StreamingNearDedup.runOnce(spark, s"$root/in", s"$root/pairs",
      s"$root/index", s"$root/ckpt")
    val raw = spark.read.parquet(s"$root/pairs")
      .filter(col("batch_id") > 0)
    val view = StreamingNearDedup.pairsView(spark, s"$root/pairs")
      .filter(col("batch_id") > 0)
    // every copied doc found its original...
    assert(view.count() >= 50, s"view=${view.count()}")
    // ...duplicates visible raw (the at-least-once window was exercised)...
    assert(raw.count() >= 2 * view.count(),
      s"raw=${raw.count()} view=${view.count()}")
    // ...but the view and the index are exactly-once
    assert(view.count() ==
      view.select("delta_id", "base_id").distinct().count())
    val idx = spark.read.parquet(s"$root/index")
    assert(idx.count() == 150 * 8)
    assert(idx.select("doc_id").distinct().count() == 150)
  }

  test("index compaction bounds the file count across many batches; a " +
      "crash inside the compaction's duplicate window loses no index " +
      "row, keeps pairsView exactly-once, and the next compaction " +
      "converges") {
    val root = Files.createTempDirectory("snd-compact").toString
    def fileCount(): Int = {
      val dir = new org.apache.hadoop.fs.Path(s"$root/index")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(dir).map(_.getPath.getName).count(_.startsWith("part-"))
    }
    // 4 single-file arrivals; compactAfterFiles=1 forces a compaction
    // after every batch. Batch 2's compaction crashes in the duplicate
    // window (compacted files appended, superseded not yet deleted).
    var crashes = 0
    StreamingNearDedup.compactFaultpoint = id =>
      if (id == 2L) { crashes += 1; throw new RuntimeException("injected") }
    try {
      for (k <- 0 until 4) {
        docsSlice(k * 50L, (k + 1) * 50L).coalesce(1)
          .write.mode("append").parquet(s"$root/in")
        def run(): Unit = StreamingNearDedup.runOnce(spark, s"$root/in",
          s"$root/pairs", s"$root/index", s"$root/ckpt",
          compactAfterFiles = 1)
        if (k == 2) {
          intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
            run()
          }
          // the crash left every index row duplicated — but batch 2 was
          // committed before compaction, so CONTENT is already complete
          val dup = spark.read.parquet(s"$root/index")
          assert(dup.count() > 150 * 8, "duplicate window not exercised")
          assert(dup.distinct().count() == 150 * 8)
        } else run()
      }
    } finally StreamingNearDedup.compactFaultpoint = _ => ()
    assert(crashes == 1, s"compaction crash fired $crashes times")
    // batch 3's compaction converged the duplicates and the file count
    assert(fileCount() <= 2, s"files=${fileCount()}")
    val idx = spark.read.parquet(s"$root/index")
    assert(idx.count() == 200 * 8, s"rows=${idx.count()}")
    assert(idx.select("doc_id").distinct().count() == 200)
    // pairs agree with a single batch IncrementalDedup replay of the
    // same arrival order (the compaction changed no probe answer)
    var expected = Set.empty[(Long, Long)]
    var indexed: Option[DataFrame] = None
    for (k <- 0 until 4) {
      val deltaIdx = IncrementalDedup.buildIndex(docsSlice(k * 50L, (k + 1) * 50L))
      indexed.foreach { i =>
        expected ++= IncrementalDedup.probe(i, deltaIdx, cap = 50)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      indexed = Some(indexed.map(_.unionByName(deltaIdx))
        .getOrElse(deltaIdx).localCheckpoint())
    }
    val got = StreamingNearDedup.pairsView(spark, s"$root/pairs")
      .select("delta_id", "base_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"stream-only=${got.diff(expected)} batch-only=${expected.diff(got)}")
    assert(got.nonEmpty, "fixture should contain cross-arrival pairs")
  }
}
