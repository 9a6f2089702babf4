package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible streaming-correctness artifact (VERDICT r9 #8): the
  * streaming twins (CDC publish/commit, gap-sessionization, heavy
  * hitters, near-dedup, consumer state view) are pinned in their specs on
  * constructed fixtures — this main re-proves their batch parity on the
  * ROUND'S real testdata at bench scale and emits one JSON file, so each
  * round's artifacts capture streaming correctness the way
  * CORRECTNESS_r{N}.json captures batch.
  *
  * Usage: sbt "runMain graft.StreamingReport [sfDir] [outFile]"
  * (defaults: /root/testdata/sf0.1, STREAMING_report.json)
  */
object StreamingReport {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outFile = if (args.length > 1) args(1) else "STREAMING_report.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-sr").toString
    val events = graft.queries.Tables.load(spark, sfDir, "events")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sections = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var allPass = true
    def section(name: String, json: String, pass: Boolean): Unit = {
      sections(name) = json
      allPass &&= pass
      println(s"[streaming-report] $name: ${if (pass) "PASS" else "FAIL"}")
    }

    // ---- 1. CDC publish + token commit (S1→F→P→K1/K2) -----------------
    // Full DSv2 change-stream path over the events table; exactly-once
    // after consumer dedup must equal the batch publishable count.
    val cdcMessages: DataFrame = {
      graft.operators.EventsCdc.toEnvelopes(events)
        .repartitionByRange(16, col("_id").getField("_data"))
        .write.mode("overwrite").parquet(s"$root/in")
      val cnt = spark.read.parquet(s"$root/in").count()
      val c = graft.streaming.StreamingCdc.StreamConfig(
        "report", s"$root/in", s"$root/messages", s"$root/tokens",
        s"$root/ckpt", sourceFormat = "changestream")
      val t0 = System.nanoTime()
      graft.streaming.StreamingCdc.runAll(spark, Seq(c), availableNow = true)
      val sec = (System.nanoTime() - t0) / 1e9
      val raw = spark.read.parquet(s"$root/messages")
      val published = raw.count()
      val distinctMsgs = graft.operators.CdcPipeline
        .dedupByMsgId(raw.drop("batch_id")).count()
      val expected = events.filter(col("event_type") =!= "error").count()
      section("cdc",
        s"""{"events":$cnt,"published":$published,""" +
          s""""published_distinct":$distinctMsgs,"expected":$expected,""" +
          s""""events_per_sec":${cnt / sec},""" +
          s""""exactly_once":${distinctMsgs == expected}}""",
        distinctMsgs == expected)
      raw.drop("batch_id")
    }

    // ---- 2. Gap-sessionization (flatMapGroupsWithState) ---------------
    // Stream the whole events table plus one far-future sentinel per
    // user; once the watermark passes the sentinels, every REAL session
    // has closed (sentinel sessions stay open and are withheld). The
    // closed set must equal the batch session_window query bit-exactly.
    locally {
      val ev3 = events.select(col("user_id"), col("ts"), col("value"))
      val bounds = ev3.agg(max(col("ts")).as("mx")).head()
      val maxTs = bounds.getTimestamp(0)
      // sentinel = max_ts + gap(1d) + span-cover delay margin (31d)
      val sentinelTs = new java.sql.Timestamp(
        maxTs.getTime + 32L * 86400000L)
      ev3.write.mode("overwrite").parquet(s"$root/sess-in")
      ev3.select(col("user_id")).distinct()
        .select(col("user_id"), lit(sentinelTs).as("ts"),
          lit(0.0).as("value"))
        .coalesce(1).write.mode("append").parquet(s"$root/sess-in")
      val schema = ev3.schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "100000").parquet(s"$root/sess-in")
      // watermark delay covers the fixture's full span, so intra-batch
      // arrival order can never drop a real event as late; the final
      // watermark (sentinel − delay) still clears every real close point
      val q = graft.streaming.StreamingSessionization
        .sessions(spark, stream, gap = "1 day", watermarkDelay = "30 days")
        .writeStream.format("memory").queryName("sr_sessions")
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      val got = spark.table("sr_sessions")
        .select(col("user_id"), col("session_start"), col("n"),
          col("sum_value"))
        .collect().map(_.toSeq).toSet
      val want = graft.queries.AnalyticsQueries
        .queries("events_session_windows")(spark, sfDir)
        .collect().map(_.toSeq).toSet
      val dupFree = got.size == spark.table("sr_sessions").count()
      section("sessionization",
        s"""{"streamed_closed":${got.size},"batch_sessions":${want.size},""" +
          s""""exactly_once":$dupFree,"match":${got == want}}""",
        got == want && dupFree)
    }

    // ---- 3. Streaming heavy hitters (Misra-Gries + recount) -----------
    locally {
      val in = docs.select(col("doc_id"), col("text"),
        lit(new java.sql.Timestamp(0L)).as("ingest_ts"))
      in.repartition(8).write.mode("overwrite").parquet(s"$root/hh-in")
      graft.streaming.StreamingHeavyHitters.runOnce(spark, s"$root/hh-in",
        s"$root/hh-sum", s"$root/hh-ckpt", capacity = 512,
        maxFilesPerTrigger = 2)
      val cand = graft.streaming.StreamingHeavyHitters
        .summary(spark, s"$root/hh-sum")
        .select("token").as[String].collect().toSeq
      val tk = docs.select(explode(split(col("text"), " ")).as("tok"))
      val n = tk.count()
      val streamed = tk.filter(col("tok").isin(cand: _*))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 256 >= n)
        .orderBy(col("cnt").desc, col("tok"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val want = graft.queries.TextQueries
        .queries("text_heavy_hitters")(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      section("heavy_hitters",
        s"""{"summary_candidates":${cand.size},""" +
          s""""heavy_hitters":${streamed.size},""" +
          s""""match":${streamed == want}}""",
        streamed == want && streamed.nonEmpty)
    }

    // ---- 4. Streaming near-dedup (band index over arrivals) -----------
    // Three arrival slices by doc_id; the streamed pair log must equal
    // the batch incremental operator probed slice-by-slice.
    locally {
      graft.functions.TextHashes.register(spark)
      val ids = docs.select(col("doc_id")).orderBy(col("doc_id"))
        .as[Long].collect()
      val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
      val slices = Seq(
        docs.filter(col("doc_id") <= cuts(0)),
        docs.filter(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
        docs.filter(col("doc_id") > cuts(1)))
      var expected = Set.empty[(Long, Long)]
      var indexedSoFar: Option[DataFrame] = None
      for (slice <- slices) {
        val s3 = slice.select(col("doc_id"), col("text"),
          lit(new java.sql.Timestamp(0L)).as("ingest_ts"))
        val deltaIdx = graft.operators.IncrementalDedup.buildIndex(s3)
        indexedSoFar.foreach { idx =>
          expected ++= graft.operators.IncrementalDedup
            .probe(idx, deltaIdx, cap = 50)
            .collect().map(r => (r.getLong(0), r.getLong(1)))
        }
        indexedSoFar = Some(indexedSoFar
          .map(_.unionByName(deltaIdx)).getOrElse(deltaIdx)
          .localCheckpoint())
        s3.coalesce(1).write.mode("append").parquet(s"$root/nd-in")
        graft.streaming.StreamingNearDedup.runOnce(spark, s"$root/nd-in",
          s"$root/nd-pairs", s"$root/nd-index", s"$root/nd-ckpt")
      }
      val got = graft.streaming.StreamingNearDedup
        .pairsView(spark, s"$root/nd-pairs")
        .select("delta_id", "base_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      section("near_dedup",
        s"""{"streamed_pairs":${got.size},""" +
          s""""batch_pairs":${expected.size},""" +
          s""""match":${got == expected}}""",
        got == expected && got.nonEmpty)
    }

    // ---- 5. Consumer state view over the published CDC stream ---------
    locally {
      val msgsDir = s"$root/messages"
      val src = spark.readStream
        .schema(spark.read.parquet(msgsDir).schema).parquet(msgsDir)
      val q = graft.streaming.StreamingStateView.stateView(spark, src)
        .writeStream.outputMode("update")
        .foreachBatch((d: org.apache.spark.sql.Dataset[
            graft.streaming.StreamingStateView.StateRow], _: Long) =>
          d.write.mode("append").parquet(s"$root/state-log"))
        .option("checkpointLocation", s"$root/state-ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val last = spark.read.parquet(s"$root/state-log")
        .groupBy(col("stream"), col("key"))
        .agg(max(struct(col("last_msg_id"), col("last_op"),
          col("live"))).as("s"))
        .select(col("stream"), col("key"), col("s.last_msg_id"),
          col("s.last_op"), col("s.live"))
      val gotLive = last.filter(col("live"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getString(2), r.getString(3))).toSet
      val want = graft.operators.CdcPipeline
        .stateView(spark.read.parquet(msgsDir))
        .collect().map(r => (r.getAs[String]("stream"),
          r.getAs[String]("key"), r.getAs[String]("last_msg_id"),
          r.getAs[String]("last_op"))).toSet
      section("state_view",
        s"""{"live_keys":${gotLive.size},"batch_keys":${want.size},""" +
          s""""match":${gotLive == want}}""",
        gotLive == want && gotLive.nonEmpty)
    }

    val body = sections.map { case (k, v) => s""""$k":$v""" }
      .mkString(",")
    val line = s"""{"sf":"$sfDir","all_pass":$allPass,$body}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
    if (!allPass) sys.exit(2)
  }
}
