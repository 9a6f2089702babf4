package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{ChangeEvent, ChangeEventId, Ns}
import graft.operators.CdcPipeline
import graft.streaming.StreamingCdc
import graft.streaming.StreamingCdc.StreamConfig

/** DSv2 StreamingWrite sink (graft.sinks.MessageSink) — parity with the
  * foreachBatch runtime on every contract StreamingCdcSpec pins there:
  * publish + token commit, dedup view, invalidate truncation (mid-batch
  * included), checkpoint restart, the crash-replay duplicate window, and
  * capped-token convergence. Same fixtures, both sink paths, compared
  * directly.
  */
class MessageSinkSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-dsv2sink").toString

  private def ev(token: Int, op: String): ChangeEvent =
    ChangeEvent(ChangeEventId(f"$token%06d"), op, None, None,
      Some(Ns("db", "c")), Some(s"""{"_id":$token}"""),
      if (op == "delete" || op == "invalidate") None
      else Some(s"""{"_id":$token,"v":$token}"""),
      None, None)

  private def writeBatchFile(dir: String, events: Seq[ChangeEvent]): Unit =
    events.toDF().coalesce(1).write.mode("append").parquet(dir)

  private def cfg(name: String, root: String): StreamConfig =
    StreamConfig(name, s"$root/in", s"$root/messages-$name",
      s"$root/tokens-$name", s"$root/ckpt-$name", maxFilesPerTrigger = 1,
      sourceFormat = "changestream", sinkFormat = "dsv2")

  private def dedup(c: StreamConfig): DataFrame =
    CdcPipeline.dedupByMsgId(
      spark.read.parquet(c.messagesDir).drop("batch_id"))

  test("parity: dsv2 and foreachBatch publish identical message sets, " +
      "identical latest token, strictly increasing per-batch ranges") {
    val root = tmp()
    val ops = Seq("insert", "update", "replace", "delete")
    val events = (1 to 80).map(i => ev(i, ops(i % 4))) ++
      Seq(ev(81, "drop"), ev(82, "rename")) ++ // skipped ops ride along
      (83 to 120).map(i => ev(i, ops(i % 4)))
    val in = s"$root/in"
    // several files => several micro-batches through the token-ordered
    // changestream source
    events.grouped(30).foreach(g => writeBatchFile(in, g))

    // same streamName on both paths — subjects must match for the
    // set-equality compare
    val a = cfg("pr-dsv2", root).copy(streamName = Some("PARITY"))
    val b = a.copy(name = "pr-feb", messagesDir = s"$root/messages-pr-feb",
      tokensDir = s"$root/tokens-pr-feb", checkpointDir = s"$root/ckpt-pr-feb",
      sinkFormat = "foreachbatch")
    StreamingCdc.runAll(spark, Seq(a), availableNow = true)
    StreamingCdc.runAll(spark, Seq(b), availableNow = true)

    // identical published sets (set-equality both directions)
    assert(dedup(a).exceptAll(dedup(b)).isEmpty &&
      dedup(b).exceptAll(dedup(a)).isEmpty,
      "dsv2 and foreachBatch message sets diverge")
    // identical commit point
    assert(StreamingCdc.latestToken(spark, a.tokensDir) ==
      StreamingCdc.latestToken(spark, b.tokensDir))
    // per-batch msgId ranges strictly increase on the dsv2 path
    val ranges = spark.read.parquet(a.messagesDir)
      .groupBy(col("batch_id"))
      .agg(min(col("msgId")).as("lo"), max(col("msgId")).as("hi"))
      .orderBy(col("batch_id"))
      .select("lo", "hi").as[(String, String)].collect()
    assert(ranges.sliding(2).forall {
      case Array((_, hiA), (loB, _)) => hiA < loB
      case _ => true
    }, s"batch ranges overlap: ${ranges.toSeq}")
    // n_published on tokens matches the published rows
    val nTok = spark.read.parquet(a.tokensDir)
      .agg(sum(col("n_published"))).head().getLong(0)
    assert(nTok == spark.read.parquet(a.messagesDir).count())
  }

  test("F2 via epoch commit: a mid-batch invalidate truncates the batch, " +
      "commits the pre-cut token, stops the stream durably") {
    val root = tmp()
    val c = cfg("inv", root)
    writeBatchFile(c.inputDir, (1 to 10).map(ev(_, "insert")))
    writeBatchFile(c.inputDir,
      (11 to 15).map(ev(_, "insert")) ++ Seq(ev(16, "invalidate")) ++
        (17 to 20).map(ev(_, "insert")))
    writeBatchFile(c.inputDir, (21 to 30).map(ev(_, "insert")))
    StreamingCdc.runAll(spark, Seq(c), availableNow = true)

    val ids = spark.read.parquet(c.messagesDir)
      .select("msgId").as[String].collect().toSeq.sorted
    assert(ids == (1 to 15).map(i => f"$i%06d"),
      s"expected truncation at the invalidate, got $ids")
    assert(StreamingCdc.wasInvalidated(c.name))
    // durable: a fresh runAll on the same dirs publishes nothing more
    writeBatchFile(c.inputDir, (31 to 35).map(ev(_, "insert")))
    StreamingCdc.runAll(spark, Seq(c), availableNow = true)
    assert(spark.read.parquet(c.messagesDir).count() == 15,
      "an invalidated stream must not resume publishing")
  }

  test("C2/C3: kill in the publish->token window replays with observable " +
      "duplicates; the dedup view and token converge (at-least-once)") {
    val root = tmp()
    // row budget => two epochs, so the kill can land on epoch 1
    val c = cfg("crash", root).copy(maxRowsPerTrigger = Some(25L))
    writeBatchFile(c.inputDir, (1 to 25).map(ev(_, "insert")))
    writeBatchFile(c.inputDir, (26 to 50).map(ev(_, "insert")))

    val tripped = new java.util.concurrent.atomic.AtomicBoolean(false)
    StreamingCdc.faultpoint = (name, batchId) =>
      if (name == c.name && batchId == 1L &&
          tripped.compareAndSet(false, true))
        throw new java.io.IOException("sinkspec: injected kill")
    try {
      val thrown = intercept[Exception] {
        StreamingCdc.runAll(spark, Seq(c), availableNow = true)
      }
      assert(Iterator.iterate[Throwable](thrown)(_.getCause)
        .takeWhile(_ != null).take(10)
        .exists(_.toString.contains("sinkspec")), s"wrong failure: $thrown")
      // restart: replays the uncommitted epoch
      StreamingCdc.runAll(spark, Seq(c), availableNow = true)
    } finally StreamingCdc.faultpoint = (_, _) => ()

    val raw = spark.read.parquet(c.messagesDir)
    assert(raw.count() >= 50, "replay must re-publish the killed epoch")
    val deduped = dedup(c).select("msgId").as[String].collect().toSeq.sorted
    assert(deduped == (1 to 50).map(i => f"$i%06d"))
    assert(StreamingCdc.latestToken(spark, c.tokensDir).contains("000050"))
  }

  test("D1: capped tokens trim on the dsv2 path and converge to the same " +
      "latest token as uncapped") {
    val root = tmp()
    val c = cfg("cap", root).copy(tokensCapped = true, tokensMaxRows = 3)
    (1 to 8).foreach(b =>
      writeBatchFile(c.inputDir, (b * 10 + 1 to b * 10 + 9).map(ev(_, "insert"))))
    StreamingCdc.runAll(spark, Seq(c), availableNow = true)
    val tok = spark.read.parquet(c.tokensDir)
    assert(tok.count() <= 4, s"trim must cap the table, got ${tok.count()}")
    assert(StreamingCdc.latestToken(spark, c.tokensDir).contains("000089"))
  }
}
