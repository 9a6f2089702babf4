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

    // ---- 1. CDC publish + token commit, N=2 collections concurrently --
    // The reference's defining orchestration (C1, connector.go:128-174)
    // is N concurrent watches: split events into two "collections" by
    // user_id parity, run ONE runAll fan-out over both DSv2 change-stream
    // configs, then assert PER COLLECTION: exactly-once after consumer
    // dedup (= the batch publishable count) and publish ORDER (the
    // per-batch msgId ranges must be disjoint and increasing in batch_id
    // — per-collection order is the reference's delivery contract;
    // maxRowsPerTrigger forces ≥3 micro-batches so the check has teeth).
    locally {
      val splits = Seq(
        ("coll_a", col("user_id") % 2 === 0),
        ("coll_b", col("user_id") % 2 === 1))
      val cfgs = splits.map { case (nm, cond) =>
        graft.operators.EventsCdc.toEnvelopes(events.filter(cond))
          .repartitionByRange(16, col("_id").getField("_data"))
          .write.mode("overwrite").parquet(s"$root/in-$nm")
        val rows = spark.read.parquet(s"$root/in-$nm").count()
        graft.streaming.StreamingCdc.StreamConfig(
          nm, s"$root/in-$nm", s"$root/messages-$nm", s"$root/tokens-$nm",
          s"$root/ckpt-$nm", sourceFormat = "changestream",
          maxRowsPerTrigger = Some(math.max(1L, rows / 3)))
      }
      val cnt = splits.map { case (nm, _) =>
        spark.read.parquet(s"$root/in-$nm").count() }.sum
      val t0 = System.nanoTime()
      graft.streaming.StreamingCdc.runAll(spark, cfgs, availableNow = true)
      val sec = (System.nanoTime() - t0) / 1e9
      var pass = true
      val per = splits.map { case (nm, cond) =>
        val raw = spark.read.parquet(s"$root/messages-$nm")
        val published = raw.count()
        val distinctMsgs = graft.operators.CdcPipeline
          .dedupByMsgId(raw.drop("batch_id")).count()
        val expected = events
          .filter(cond && col("event_type") =!= "error").count()
        // order: consecutive batches' [min,max] msgId ranges are disjoint
        // and increasing (msgIds are monotone resume tokens)
        val ranges = raw.groupBy(col("batch_id"))
          .agg(min(col("msgId")).as("mn"), max(col("msgId")).as("mx"))
          .orderBy(col("batch_id"))
          .collect().map(r => (r.getString(1), r.getString(2)))
        val ordered = ranges.length >= 3 &&
          ranges.sliding(2).forall {
            case Array((_, mxPrev), (mnNext, _)) => mxPrev < mnNext
            case _ => true
          }
        val ok = distinctMsgs == expected && ordered
        pass &&= ok
        s""""$nm":{"published":$published,""" +
          s""""published_distinct":$distinctMsgs,"expected":$expected,""" +
          s""""batches":${ranges.length},"ordered":$ordered,""" +
          s""""exactly_once":${distinctMsgs == expected}}"""
      }
      // section 5 (consumer state view) reads the combined publish log
      splits.foreach { case (nm, _) =>
        spark.read.parquet(s"$root/messages-$nm")
          .write.mode("append").parquet(s"$root/messages") }
      section("cdc",
        s"""{"collections":2,"events":$cnt,""" +
          s""""events_per_sec":${cnt / sec},${per.mkString(",")}}""",
        pass)
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

    // ---- 5b. Streaming semantic decontamination (arrival-sliced) -------
    // Corpus shards arrive in three slices; each micro-batch probes the
    // persisted eval bucket index and publishes its contaminated vectors.
    // The streamed union must equal the batch decontam_semantic query on
    // the full corpus — valid whenever no LSH bucket exceeds the caps
    // (asserted below; see StreamingDecontam's parity contract).
    locally {
      import graft.queries.{CurationQueries, DedupQueries}
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val m = CurationQueries.DecontamMod
      val planes = DedupQueries.lshPlanes(spark, sfDir)
      val tables = DedupQueries.LshTables
      val cap = DedupQueries.VecBucketCap
      // parity precondition: no bucket over the cap on the FULL corpus
      val maxOcc = emb.select(
          posexplode(expr(s"lsh_buckets(embedding, $tables, $planes)"))
            .as(Seq("t", "b")))
        .groupBy(col("t"), col("b")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head().getLong(0)
      graft.streaming.StreamingDecontam.indexEval(spark,
        emb.filter(col("vec_id") % m === 0), s"$root/dc-idx", tables, planes)
      val corpus = emb.filter(col("vec_id") % m =!= 0)
      val ids = corpus.select(col("vec_id")).orderBy(col("vec_id"))
        .collect().map(_.getLong(0))
      val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
      val slices = Seq(
        corpus.filter(col("vec_id") <= cuts(0)),
        corpus.filter(col("vec_id") > cuts(0) && col("vec_id") <= cuts(1)),
        corpus.filter(col("vec_id") > cuts(1)))
      for (slice <- slices) {
        slice.coalesce(1).write.mode("append").parquet(s"$root/dc-in")
        graft.streaming.StreamingDecontam.runOnce(spark, s"$root/dc-in",
          s"$root/dc-out", s"$root/dc-ledger", s"$root/dc-idx",
          s"$root/dc-ckpt", tables, planes, capEval = cap,
          cosMin = CurationQueries.DecontamCosMin.toDouble)
      }
      val got = graft.streaming.StreamingDecontam
        .contamView(spark, s"$root/dc-out")
        .select(col("vec_id"), col("eval_id"), col("cos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val want = graft.queries.CurationQueries
        .queries("decontam_semantic")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // Contract (see StreamingDecontam's scaladoc): eval occupancy ≤
      // combined occupancy, so a bucket the stream drops was dropped by
      // the batch query too — the stream can only find MORE. Under the
      // no-overfull-bucket precondition the two are bit-equal (the spec
      // pins that regime); when the batch's combined cap binds (true at
      // sf0.1: max occupancy above the cap), the pass criterion is
      // dominance — every batch-contaminated vector is streamed-
      // contaminated with at-least-equal best cosine.
      val exact = maxOcc <= cap
      val gotBest = got.groupBy(_._1).map { case (v, rs) =>
        v -> rs.map(_._3).max }
      val dominated = want.forall { case (v, _, c) =>
        gotBest.get(v).exists(_ >= c) }
      val pass =
        if (exact) got == want else dominated && got.size >= want.size
      section("decontam",
        s"""{"streamed_contaminated":${got.size},""" +
          s""""batch_contaminated":${want.size},""" +
          s""""max_bucket_occupancy":$maxOcc,"bucket_cap":$cap,""" +
          s""""parity_mode":"${if (exact) "exact" else "dominance"}",""" +
          s""""match":$pass}""",
        pass && got.nonEmpty)
    }

    // ---- 6. Sibling-cancel probe (C1 errgroup semantics) ---------------
    // One slow collection (24 single-file micro-batches) runs beside a
    // poisoned one (faultpoint throws in its second batch, after publish,
    // before token commit — the reference's fault-injection seam). The
    // first hard failure must cancel the slow sibling mid-stream: runAll
    // surfaces the failure, the poisoned query records an exception, and
    // the slow collection commits strictly fewer batches than its input
    // holds.
    locally {
      import graft.streaming.StreamingCdc
      val slowIn = s"$root/sc-slow-in"; val poisonIn = s"$root/sc-poison-in"
      graft.operators.EventsCdc.toEnvelopes(
          events.filter(col("user_id") % 2 === 0))
        .repartition(24).write.mode("overwrite").parquet(slowIn)
      graft.operators.EventsCdc.toEnvelopes(
          events.filter(col("user_id") % 2 === 1).limit(400))
        .repartition(4).write.mode("overwrite").parquet(poisonIn)
      val slowCfg = StreamingCdc.StreamConfig("sc_slow", slowIn,
        s"$root/sc-slow-msgs", s"$root/sc-slow-tokens", s"$root/sc-slow-ckpt",
        maxFilesPerTrigger = 1)
      val poisonCfg = StreamingCdc.StreamConfig("sc_poison", poisonIn,
        s"$root/sc-poison-msgs", s"$root/sc-poison-tokens",
        s"$root/sc-poison-ckpt", maxFilesPerTrigger = 1)
      StreamingCdc.faultpoint = (nm, batchId) =>
        if (nm == "sc_poison" && batchId >= 1)
          throw new RuntimeException("planted publish fault (report probe)")
      val outcome = scala.util.Try(
        StreamingCdc.runAll(spark, Seq(slowCfg, poisonCfg),
          availableNow = true))
      StreamingCdc.faultpoint = (_, _) => ()
      val slowCommitted = spark.read.parquet(s"$root/sc-slow-tokens").count()
      val failed = outcome.isFailure
      val cancelled = slowCommitted < 24
      section("sibling_cancel",
        s"""{"poison_failure_surfaced":$failed,""" +
          s""""slow_batches_committed":$slowCommitted,""" +
          s""""slow_batches_total":24,"cancelled_mid_stream":$cancelled}""",
        failed && cancelled)
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
