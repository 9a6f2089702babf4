package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Model
import graft.operators.CdcPipeline

/** The reference's streaming runtime (SURVEY.md §2/§3), Spark-native:
  *
  *   S1  change-stream source  → `readStream` over a parquet directory of
  *       change-event envelopes (the zero-egress stand-in for a MongoDB
  *       change stream; offsets = file positions, checkpointed)
  *   F1  publishable filter, P1–P4 projections → CdcPipeline.toMessages
  *   F2  invalidate → batch truncated at the invalidate, query stopped
  *       (internal/mongo/client.go:232-236)
  *   K1  publish → idempotent append to the `messages` table
  *   K2  token commit → append to the `tokens` table AFTER the publish —
  *       the commit point (internal/mongo/client.go:248-254)
  *   C1  per-collection fan-out → one StreamingQuery per config
  *   C2/C3 resume/replay → Structured Streaming checkpoint; a replayed
  *       batch whose token was never committed re-publishes (the
  *       reference's at-least-once duplicate window, README.md:118-127);
  *       a replayed batch whose token IS committed is skipped (idempotent)
  *   C4  graceful shutdown → stopAll()
  *
  * Delivery contract (pinned by StreamingCdcSpec): the raw `messages`
  * table is at-least-once exactly like the reference — duplicates appear
  * iff a crash lands between publish and token commit; the deduplicated
  * view (CdcPipeline.dedupByMsgId, = JetStream Nats-Msg-Id consumer dedup)
  * is exactly-once. Per-collection order is (batch_id, msgId).
  *
  * Scale: each batch is one narrow codegen'd map over the envelope; the
  * only non-map work is the commit bookkeeping, which touches a one-row
  * DataFrame. Many collections = many independent queries (C1), exactly
  * the reference's goroutine-per-collection, but each partition-parallel.
  */
object StreamingCdc {

  final case class StreamConfig(
      name: String,                 // watched-collection analog
      inputDir: String,             // envelope parquet source (S1)
      messagesDir: String,          // K1 sink table
      tokensDir: String,            // K2 token table
      checkpointDir: String,
      streamName: Option[String] = None, // P5 default: upper(name)
      tokensCapped: Boolean = false,     // D1 capped-collection analog
      tokensMaxRows: Int = 1024,
      maxFilesPerTrigger: Int = 8,
      // D2 — collMod changeStreamPreAndPostImages (client.go:166-173):
      // when disabled, pre-images are unavailable and
      // fullDocumentBeforeChange publishes as absent (update_test.go:52-56
      // version gate).
      preAndPostImages: Boolean = true,
      // S1 source: "changestream" = the DSv2 MicroBatchStream with
      // resume-token offsets + F1 pushdown (graft.sources); "parquet" =
      // the plain file source (offsets = file positions, micro-batches
      // shaped by maxFilesPerTrigger).
      sourceFormat: String = "parquet",
      // changestream-source admission control: row budget per trigger
      // (whole files in token order until the budget is hit). None =
      // all available.
      maxRowsPerTrigger: Option[Long] = None,
      // K1/K2 sink: "foreachbatch" = the micro-batch driver loop below;
      // "dsv2" = the DataSource V2 StreamingWrite (graft.sinks
      // .MessageSink) — same two-phase publish/token contract declared
      // through Spark's epoch commit API. Parity + crash-replay pinned
      // on both paths by StreamingCdcSpec/StreamFuzz.
      sinkFormat: String = "foreachbatch") {
    def resolvedStreamName: String =
      streamName.getOrElse(Model.defaultStreamName(name))
  }

  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

  /** tokens-table schema: one row per committed micro-batch (K2). */
  val tokenSchema: StructType = StructType(Seq(
    StructField("batch_id", LongType, nullable = false),
    StructField("value", StringType, nullable = true), // last resume token
    StructField("n_published", LongType, nullable = false)))

  val messagesSchema: StructType = StructType(Seq(
    StructField("subject", StringType, nullable = false),
    StructField("msgId", StringType, nullable = false),
    StructField("data", StringType, nullable = false),
    StructField("batch_id", LongType, nullable = false)))

  /** F2 state: query name → invalidate seen (stop requested). */
  private val invalidated = new ConcurrentHashMap[String, java.lang.Boolean]()

  /** K4 — per-collection published-message counter (post-filter, the
    * reference's nats_messages_published_total semantics,
    * prometheus.go:94-119). Read by Observability.
    */
  val publishedTotal = new ConcurrentHashMap[String, java.lang.Long]()

  def wasInvalidated(name: String): Boolean =
    invalidated.getOrDefault(name, false)

  /** F2 DURABILITY (found by StreamFuzz v2, seeds 11/40/54/62): the
    * in-memory invalidate flag dies with the process, and once the
    * invalidate batch's token is committed the ledger early-return skips
    * re-observing it — so a restart after an unrelated abort (a sibling's
    * errgroup cancel, a trim-window crash) would resume publishing PAST
    * the invalidate. The reference never resumes an invalidated watch
    * (resuming from an invalidate token is itself invalid in MongoDB;
    * watcher.go stops for good) — mirror that with a durable marker file
    * in the tokens dir, written wherever the in-memory flag is set.
    * Underscore-prefixed: invisible to Spark's listing, the part- filters
    * of ledger/trim, and tableExists' *.parquet probe.
    */
  private def invalidatedMarker(tokensDir: String) =
    new org.apache.hadoop.fs.Path(tokensDir, "_invalidated")

  private[graft] def markInvalidatedAt(spark: SparkSession, name: String,
      tokensDir: String): Unit = {
    invalidated.put(name, true)
    val p = invalidatedMarker(tokensDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) fs.create(p, true).close()
  }

  private def markInvalidated(spark: SparkSession, cfg: StreamConfig): Unit =
    markInvalidatedAt(spark, cfg.name, cfg.tokensDir)

  private def hasInvalidatedMarker(spark: SparkSession,
      cfg: StreamConfig): Boolean = {
    val p = invalidatedMarker(cfg.tokensDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Fault-injection seam (the test/faultinjection layer's analog,
    * restart_mongo_test.go / restart_nats_test.go): invoked between
    * publish (K1) and token commit (K2) — the at-least-once window.
    * Throwing here simulates a storage blip after the publish landed but
    * before the commit point; replay must re-publish (observable
    * duplicates) and converge. No-op in production.
    */
  @volatile private[graft]
  var faultpoint: (String, Long) => Unit = (_, _) => ()

  /** S2 — latest committed token: max_by over the tokens table. */
  def latestToken(spark: SparkSession, tokensDir: String): Option[String] = {
    val t = spark.read.parquet(tokensDir)
    if (t.isEmpty) None
    else Option(t.agg(expr("max_by(value, batch_id)")).head().getString(0))
  }

  /** Committed batch ids — the idempotence ledger for replay skips.
    *
    * Seeded from the tokens table ONCE per run (start() drops the cache
    * entry), then maintained in memory: the ledger is append-only from
    * this process, so re-reading and collecting the whole table every
    * micro-batch would be O(ledger) driver work per trigger — quadratic
    * over an uncapped stream's lifetime. Trimming only removes OLD ids
    * from disk; the in-memory superset stays correct for membership.
    */
  private val ledgerCache =
    new ConcurrentHashMap[String, java.util.Set[java.lang.Long]]()

  private def committedBatches(
      spark: SparkSession, cfg: StreamConfig): java.util.Set[java.lang.Long] =
    committedBatchIds(spark, cfg.name, cfg.tokensDir)

  private[graft] def committedBatchIds(spark: SparkSession, name: String,
      tokensDir: String): java.util.Set[java.lang.Long] =
    ledgerCache.computeIfAbsent(tokensDir, _ =>
      Observability.CommandMetrics.time(name, "tokens_read") {
        val s = ConcurrentHashMap.newKeySet[java.lang.Long]()
        // Footer fast path (round-12 fixed-cost shave): the parquet
        // footers carry row counts, so an EMPTY ledger — every fresh
        // start — is decided driver-side from two file opens instead of
        // a Spark collect job. A non-empty ledger (restart path) still
        // reads through Spark: it is rare per process lifetime and the
        // table is capped-small.
        val hconf = spark.sparkContext.hadoopConfiguration
        val dir = new org.apache.hadoop.fs.Path(tokensDir)
        val fs = dir.getFileSystem(hconf)
        val parts = fs.listStatus(dir).map(_.getPath)
          .filter(_.getName.startsWith("part-"))
        val totalRows = parts.iterator.map { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(p, hconf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum
        if (totalRows > 0)
          spark.read.parquet(tokensDir).select("batch_id")
            .collect().foreach(r => s.add(r.getLong(0)))
        s
      })

  /** One micro-batch: truncate at invalidate (F2), publish (K1), then
    * commit the token (K2). Mirrors the reference's per-event loop
    * (internal/mongo/client.go:217-257) at batch granularity.
    */
  private[streaming] def processBatch(
      cfg: StreamConfig)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (wasInvalidated(cfg.name)) return
    // C2/C3 replay: skip batches whose token commit already landed — but
    // still PROBE a replayed batch for the invalidate (F2 durability: a
    // crash can land between the token commit and the marker write below;
    // the probe costs one job on replayed batches only).
    if (committedBatches(spark, cfg).contains(batchId)) {
      if (CdcPipeline.containsInvalidate(batch)) markInvalidated(spark, cfg)
      return
    }

    // ONE action publishes the batch (round-12 fixed-cost shave; the
    // separate invalidate-probe job is gone): the F2 cut rides the same
    // job as a broadcast 1-row subtree whose invalidate-equality filter
    // pushes into its own source scan (~0 rows in steady state), and the
    // driver learns "saw invalidate" from an Observation on that subtree.
    // The two subtree scans stay deterministic under the change-stream
    // contract (append-only input, the [start,end] token range pins the
    // same rows on both passes). persist() would still be a net loss —
    // caching materializes every row into block storage to save a
    // columnar re-scan of ~0 rows (~15% throughput tax measured at the
    // bench SF).
    processUncachedBatch(cfg, batch, batchId)
  }

  private def processUncachedBatch(
      cfg: StreamConfig, batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import Observability.CommandMetrics
    // F2 — invalidate cut, observed (no separate action): `cut_seen` is
    // non-null iff the batch contains an invalidate.
    val obsInv = new org.apache.spark.sql.Observation(
      s"graft-inv-${cfg.name}-$batchId")
    val cut = CdcPipeline.invalidateCut(batch)
      .observe(obsInv, max(col("cut")).as("cut_seen"))
    val truncated = CdcPipeline.truncateWithCut(batch, cut)
    // D2 — pre/post images disabled ⇒ the source never delivers pre-images.
    val effective =
      if (cfg.preAndPostImages) truncated
      else truncated.withColumn("fullDocumentBeforeChange",
        lit(null).cast("string"))

    val msgs = CdcPipeline
      .toMessages(spark, cfg.resolvedStreamName)(effective)
      .withColumn("batch_id", lit(batchId))
      // Per-collection order within the batch (SURVEY.md §7 hard part 4):
      // a micro-batch of one collection is small — sort it locally before
      // the append so file order matches token order.
      .sortWithinPartitions(col("msgId"))

    // K1 — publish. Crash after this but before the token append ⇒ the
    // replayed batch re-publishes: the reference's duplicate window.
    // The subject set (for the K4 timing samples) and the K2 token stats
    // (max msgId, row count) ride along as OBSERVED metrics on the append
    // pass itself — the micro-batch runs exactly one job over the
    // messages, not three (append + distinct-collect + agg as before;
    // the extra passes were a measurable ~15% streaming-throughput tax).
    val obs = new org.apache.spark.sql.Observation(s"graft-${cfg.name}-$batchId")
    val observed = msgs.observe(obs,
      collect_set(col("subject")).as("subjects"),
      max(col("msgId")).as("max_msg_id"),
      count(lit(1)).as("n_published"))
    val t0 = System.nanoTime()
    CommandMetrics.time(cfg.name, "messages_append") {
      observed.write.mode("append").parquet(cfg.messagesDir)
    }
    // nats_message_duration_seconds analog at batch granularity: the
    // publish duration, observed once per subject present in the batch
    // (subjects per collection are bounded by the operation-type set).
    // INTENTIONAL divergence from the reference's per-publish timing
    // (client.go:121-127): a micro-batch engine appends once per batch,
    // so all subjects in a batch share one sample — splitting the
    // append per subject would multiply actions on the hot path for a
    // metrics nit. Contract pinned by ObservabilitySpec.
    val pubSec = (System.nanoTime() - t0) / 1e9
    val stats = obs.get // resolved: the append above was the action
    stats("subjects").asInstanceOf[scala.collection.Seq[Any]]
      .foreach(s => CommandMetrics.observePublish(s.toString, pubSec))

    faultpoint(cfg.name, batchId)

    // K2 — token commit point, from the same observed pass. The commit
    // marker is ONE row, so it is written driver-side with the parquet
    // writer directly (round-12 fixed-cost shave: a Spark job per trigger
    // just to serialize one row was ~0.1 s of scheduler overhead at the
    // bench SF). Same commit discipline: the file lands AFTER the publish
    // append, written under a dot-prefixed temp name and RENAMED into its
    // part- name only after close() (ADVICE r12: the writer opens the
    // destination at build(), so a rename-free write could crash into a
    // truncated, footer-less part- file that poisons every later read).
    // A crash before the rename leaves only a dot-file — ignored by
    // Spark's listing and by the part- filters of the ledger and trim —
    // i.e. an uncommitted batch, exactly the at-least-once window the
    // replay tests pin.
    val nPublished = stats("n_published").asInstanceOf[Long]
    CommandMetrics.time(cfg.name, "tokens_append") {
      writeTokenRow(spark, cfg.tokensDir, batchId,
        stats("max_msg_id").asInstanceOf[String], nPublished)
    }
    committedBatches(spark, cfg).add(batchId)
    if (cfg.tokensCapped) trimTokens(spark, cfg)
    publishedTotal.merge(cfg.name, nPublished, (a, b) => a + b) // K4 counter

    // F2: stop requested — learned from the cut-subtree observation of
    // the SAME job that published (no separate probe action). The wait is
    // BOUNDED (ADVICE r12): the metric rides a subtree under a broadcast
    // exchange, and if a future Spark version / plan change stops
    // delivering observed metrics from there, an unbounded get() would
    // hang every micro-batch. Await the observation's own completion
    // future with a deadline; on timeout fall back to the explicit
    // one-action probe (the pre-r12 path) so the batch completes with
    // correct F2 semantics and the degradation is visible in the log
    // rather than a silent hang.
    val sawInvalidate =
      (try Some(scala.concurrent.Await.result(
        obsInv.future, scala.concurrent.duration.Duration(30, "s")))
      catch { case _: java.util.concurrent.TimeoutException => None }) match {
        case Some(r) => r.getAs[Any]("cut_seen") != null
        case None =>
          Console.err.println(s"[graft] WARN ${cfg.name} batch $batchId: " +
            "invalidate observation unresolved after 30s; falling back to " +
            "explicit probe")
          CdcPipeline.containsInvalidate(batch)
      }
    if (sawInvalidate) markInvalidated(spark, cfg)
  }

  /** Driver-side single-row token write via parquet-hadoop's example
    * writer: physical schema (required int64 batch_id, optional binary
    * value (STRING), required int64 n_published) matches [[tokenSchema]],
    * so Spark reads these files interchangeably with the Spark-written
    * ones (ensureTable's empty seed file, trimTokens' compaction output).
    */
  private[graft] def writeTokenRow(spark: SparkSession, tokensDir: String,
      batchId: Long, value: String, nPublished: Long): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.{MessageTypeParser}
    val schema = MessageTypeParser.parseMessageType(
      """message token {
        |  required int64 batch_id;
        |  optional binary value (UTF8);
        |  required int64 n_published;
        |}""".stripMargin)
    val hconf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    GroupWriteSupport.setSchema(schema, hconf)
    val name = s"part-$batchId-${java.util.UUID.randomUUID()}.snappy.parquet"
    val path = new org.apache.hadoop.fs.Path(tokensDir, name)
    // Two-phase commit (ADVICE r12): build() opens the DESTINATION file,
    // so write under a dot-temp (invisible to readers: Spark skips
    // dot-files; committedBatches/trimTokens filter on the part- prefix;
    // the .inprogress suffix keeps it out of tableExists' *.parquet probe)
    // and rename after close() — rename is atomic on a posix fs.
    val tmp = new org.apache.hadoop.fs.Path(tokensDir, s".$name.inprogress")
    val fs = tmp.getFileSystem(hconf)
    val w = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(tmp, hconf))
      .withConf(hconf)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try {
      val g = new SimpleGroup(schema)
      g.add("batch_id", batchId)
      if (value != null) g.add("value", value)
      g.add("n_published", nPublished)
      w.write(g)
    } finally w.close()
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(s"token commit rename failed: $tmp -> $path")
  }

  /** D1 capped-collection analog: keep only the newest tokensMaxRows rows.
    * Both capped and uncapped converge to the same latestToken answer
    * (mirrors the dual-run acceptance tests, insert_test.go:55-61).
    *
    * Crash-safe compaction (the tokens table is the COMMIT POINT — an
    * `overwrite` here could lose the ledger if the process dies between
    * delete and write): append the kept rows as a NEW file first, only
    * then delete the pre-existing files. A crash in between leaves the
    * kept rows duplicated next to the old files — `latestToken`
    * (max_by) and the ledger (set membership) are insensitive to
    * duplicates, and the next trim converges the row count.
    */
  private[graft] def trimTokens(spark: SparkSession, cfg: StreamConfig): Unit =
    trimTokensAt(spark, cfg.name, cfg.tokensDir, cfg.tokensMaxRows)

  private[graft] def trimTokensAt(spark: SparkSession, name: String,
      tokensDir: String, tokensMaxRows: Int): Unit = {
    val t = spark.read.parquet(tokensDir)
    if (t.count() > tokensMaxRows) {
      val hconf = spark.sparkContext.hadoopConfiguration
      val dir = new org.apache.hadoop.fs.Path(tokensDir)
      val fs = dir.getFileSystem(hconf)
      val oldFiles = fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("part-"))
      val keep = t.orderBy(col("batch_id").desc).limit(tokensMaxRows)
        .collect()
      val kept = spark.createDataFrame(
        java.util.Arrays.asList(keep: _*), tokenSchema)
      kept.coalesce(1).write.mode("append").parquet(tokensDir)
      // fault-injection hook in the trim RACE WINDOW (kept rows appended,
      // old files not yet deleted — the crash point the scaladoc above
      // reasons about; batchId -1 marks "inside trim"). No-op in
      // production; StreamFuzz v2 kills here to probe the duplicate-file
      // recovery path across restarts.
      faultpoint(name, -1L)
      oldFiles.foreach(p => fs.delete(p, false))
    }
  }

  /** Start one per-collection query (C1 unit). D1/D3 setup runs first,
    * idempotently, like connector.Run (pkg/connector/connector.go:125-153).
    */
  def start(spark: SparkSession, cfg: StreamConfig,
      availableNow: Boolean = false): StreamingQuery = {
    Ddl.ensureTable(spark, cfg.messagesDir, messagesSchema)
    Ddl.ensureTable(spark, cfg.tokensDir, tokenSchema)
    // F2 durability: a collection whose stream saw an invalidate stays
    // terminated across restarts (processBatch's entry check publishes
    // nothing; runAll's poll stops the query) — the marker survives where
    // the in-memory flag does not.
    if (hasInvalidatedMarker(spark, cfg)) invalidated.put(cfg.name, true)
    else invalidated.remove(cfg.name)
    // Re-seed the ledger cache from disk at (re)start: another process may
    // have committed since, and tests recreate dirs at the same path.
    ledgerCache.remove(cfg.tokensDir)
    val src0 =
      if (cfg.sourceFormat == "changestream") {
        val r = spark.readStream
          .format(classOf[graft.sources.ChangeStreamSource].getName)
          // F1 in the READER on the streaming path: Spark never runs
          // filter pushdown on streaming DSv2 scans, so the op set rides
          // in as a source option (see ChangeStreamSource) — the reader
          // skips non-publishable rows before materializing them.
          .option("ops",
            (Model.PublishableOps :+ Model.InvalidateOp).mkString(","))
        cfg.maxRowsPerTrigger.foreach(n =>
          r.option("maxRowsPerTrigger", n.toString))
        r.load(cfg.inputDir)
      } else
        spark.readStream
          .schema(Model.changeEventSchema)
          .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
          .parquet(cfg.inputDir)
    // F1 at the SOURCE on the streaming path too (round 12): DSv2
    // pushdown engages at STREAM planning, not per foreachBatch batch —
    // without a filter in the streaming DAG the reader materializes
    // every op kind each trigger and filterPublishable re-drops them
    // spark-side per batch. Publishable ∪ invalidate is exactly the set
    // processBatch consumes (F2 needs the invalidate rows for the cut;
    // drop/rename were always skipped downstream).
    val src = src0.filter(col("operationType")
      .isin((Model.PublishableOps :+ Model.InvalidateOp): _*))
    val w =
      if (cfg.sinkFormat == "dsv2") {
        // K1/K2 through the DSv2 StreamingWrite (graft.sinks.MessageSink):
        // the projection (D2 image mask included) moves INTO the stream
        // dataflow — invalidate rows ride along flagged by `op`, and the
        // F2 cut + token commit happen in the sink's epoch commit. The
        // per-file token ordering the foreachBatch path got from
        // sortWithinPartitions happens in the sink's DataWriter instead
        // (Spark's analyzer rejects any Sort on a streaming plan).
        val effective =
          if (cfg.preAndPostImages) src
          else src.withColumn("fullDocumentBeforeChange",
            lit(null).cast("string"))
        CdcPipeline.toSinkRows(cfg.resolvedStreamName)(effective)
          .writeStream
          .queryName(cfg.name)
          .option("checkpointLocation", cfg.checkpointDir)
          .format(classOf[graft.sinks.MessageSink].getName)
          .option("path", cfg.messagesDir)
          .option("tokensDir", cfg.tokensDir)
          .option("name", cfg.name)
          .option("capped", cfg.tokensCapped.toString)
          .option("maxTokRows", cfg.tokensMaxRows.toString)
      } else
        src.writeStream
          .queryName(cfg.name)
          .option("checkpointLocation", cfg.checkpointDir)
          .foreachBatch(processBatch(cfg) _)
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** C1 — fan out one query per collection and block until all finish or
    * one sees an invalidate (then stop that one, like `resume=false`).
    * First hard failure propagates (errgroup semantics,
    * pkg/connector/connector.go:128-174).
    */
  def runAll(spark: SparkSession, cfgs: Seq[StreamConfig],
      availableNow: Boolean = false, pollMs: Long = 25L): Unit = {
    val queries = cfgs.map(c => c.name -> start(spark, c, availableNow)).toMap
    try {
      while (queries.values.exists(_.isActive)) {
        queries.foreach { case (name, q) =>
          if (q.isActive && wasInvalidated(name)) q.stop() // F2 → C4
          // errgroup semantics (connector.go:128-174): the first hard
          // failure cancels every sibling query.
          if (q.exception.nonEmpty) queries.values.foreach { s =>
            if (s.isActive) s.stop()
          }
        }
        Thread.sleep(pollMs)
      }
      queries.values.foreach(_.awaitTermination()) // surface errors (C3)
    } finally stopAll(spark) // C4
  }

  /** C4 — graceful shutdown of every active query. */
  def stopAll(spark: SparkSession): Unit =
    spark.streams.active.foreach { q =>
      try q.stop() catch { case _: Throwable => () }
    }
}
