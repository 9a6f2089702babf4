package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming semantic DECONTAMINATION for the training-ingest path: the
  * eval holdout's LSH buckets live in a persisted parquet index, and every
  * arriving corpus micro-batch is bucketed with the same hyperplanes,
  * probed against the index for candidate eval neighbors, exact-cosine
  * re-ranked, and its contaminated vectors published with their best eval
  * match — the streaming twin of `decontam_semantic`
  * (CurationQueries.scala), mirroring StreamingNearDedup's arrival-sliced
  * band-index pattern. A real pipeline ingests corpus shards (and new
  * eval sets) incrementally; batch decontamination would rescan the whole
  * corpus per eval update.
  *
  * Commit discipline (same as StreamingNearDedup / StreamingCdc): the
  * contaminated-rows append is at-least-once; the ledger append is the
  * commit marker. A crash between the two replays the batch — replayed
  * rows land with the same (batch_id, vec_id, eval_id) key and
  * `contamView` restores exactly-once.
  *
  * Parity contract: the eval-side bucket cap (`capEval`) bounds the
  * per-vector probe fan-out (the 100 TB guard). The batch query caps on
  * COMBINED bucket occupancy, which a stream cannot know mid-flight.
  * Because eval occupancy ≤ combined occupancy, any bucket the stream
  * drops was dropped by the batch too — the streamed candidate set is
  * always a SUPERSET of the batch query's. Two regimes follow: when no
  * bucket exceeds the caps, the results are bit-equal
  * (StreamingDecontamSpec pins that); when the batch's combined cap
  * binds, the stream finds MORE contamination (strictly better recall —
  * the cap is a performance guard, not semantics), and the invariant is
  * dominance: every batch-contaminated vector streams out with an
  * at-least-equal best cosine (StreamingReport asserts it at sf0.1,
  * where the combined cap binds).
  *
  * Eval updates: `indexEval` is append-able (a new eval shard = one more
  * call); batches probe the index as-of their trigger. Vectors cleared
  * BEFORE an eval shard arrived are not re-checked — that is the
  * documented semantics (a real pipeline re-enqueues the corpus slice it
  * wants re-screened), not a correctness gap in the per-batch contract.
  */
object StreamingDecontam {

  /** Corpus-stream input schema (the embeddings table's shape). */
  val inputSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = true),
      nullable = true)))

  val ledgerSchema: StructType = StructType(Seq(
    StructField("batch_id", LongType, nullable = false),
    StructField("n_contaminated", LongType, nullable = false)))

  /** Test seam (contract of StreamingNearDedup.faultpoint): invoked
    * between the contaminated append (at-least-once) and the ledger
    * append (commit marker). No-op in production.
    */
  @volatile private[graft]
  var faultpoint: Long => Unit = _ => ()

  /** Build or extend the persisted eval bucket index: one row per
    * (table, bucket, eval vector), normalized vector attached so the
    * probe's exact re-rank never rescans the eval source.
    */
  def indexEval(spark: SparkSession, evalDf: DataFrame, indexDir: String,
      tables: Int, planes: Int): Unit =
    evalDf
      .select(col("vec_id").as("eval_id"),
        expr("vec_normalize(embedding)").as("en"),
        posexplode(expr(s"lsh_buckets(embedding, $tables, $planes)"))
          .as(Seq("table_id", "bucket")))
      .write.mode("append").parquet(indexDir)

  /** Exactly-once view over the at-least-once contaminated table. */
  def contamView(spark: SparkSession, contamDir: String): DataFrame =
    spark.read.parquet(contamDir)
      .groupBy(col("batch_id"), col("vec_id"), col("eval_id"))
      .agg(max(col("cos")).as("cos"))

  private def processBatch(contamDir: String, ledgerDir: String,
      indexDir: String, tables: Int, planes: Int, capEval: Int,
      cosMin: Double)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // replay guard: the ledger append is the commit marker
    val ledger = spark.read.parquet(ledgerDir)
    if (!ledger.filter(col("batch_id") === batchId).isEmpty) return

    val idx = spark.read.parquet(indexDir)
    // hot-eval-bucket guard: a bucket holding more than capEval eval
    // vectors is dropped from the probe (its pairs recoverable via the
    // other tables) — bounds fan-out per arriving vector at any scale
    val okBuckets = idx.groupBy(col("table_id"), col("bucket"))
      .agg(count(lit(1)).as("ne"))
      .filter(col("ne") <= capEval)
      .select(col("table_id"), col("bucket"))
    val evalIdx = idx.join(okBuckets, Seq("table_id", "bucket"))

    val b = batch
      .select(col("vec_id"), expr("vec_normalize(embedding)").as("cn"),
        posexplode(expr(s"lsh_buckets(embedding, $tables, $planes)"))
          .as(Seq("table_id", "bucket")))
    // candidates ship (ids + the two normalized vectors they already
    // carry); one keyed exchange on the compact (table_id, bucket)
    val cand = b.join(evalIdx, Seq("table_id", "bucket"))
      .select(col("vec_id"), col("cn"), col("eval_id"), col("en"))
      .dropDuplicates("vec_id", "eval_id")
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("eval_id"))
    val contaminated = cand
      .select(col("vec_id"), col("eval_id"),
        round(expr("vec_dot(cn, en)"), 6).as("cos"))
      .filter(col("cos") >= cosMin)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("vec_id"), col("eval_id"), col("cos"))
      .withColumn("batch_id", lit(batchId))

    contaminated.write.mode("append").parquet(contamDir)
    faultpoint(batchId)
    val n = spark.read.parquet(contamDir)
      .filter(col("batch_id") === batchId).count()
    spark.createDataFrame(
        java.util.List.of[org.apache.spark.sql.Row](
          org.apache.spark.sql.Row(batchId, n)), ledgerSchema)
      .coalesce(1).write.mode("append").parquet(ledgerDir)
  }

  def start(spark: SparkSession, inputDir: String, contamDir: String,
      ledgerDir: String, indexDir: String, checkpointDir: String,
      tables: Int, planes: Int, capEval: Int = 200, cosMin: Double = 0.35,
      maxFilesPerTrigger: Int = 1,
      availableNow: Boolean = false): StreamingQuery = {
    Ddl.ensureTable(spark, ledgerDir, ledgerSchema)
    val contamSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("eval_id", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = true),
      StructField("batch_id", LongType, nullable = false)))
    Ddl.ensureTable(spark, contamDir, contamSchema)
    val w = spark.readStream
      .schema(inputSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(processBatch(contamDir, ledgerDir, indexDir, tables,
        planes, capEval, cosMin) _)
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Run to completion over the currently-available input (AvailableNow). */
  def runOnce(spark: SparkSession, inputDir: String, contamDir: String,
      ledgerDir: String, indexDir: String, checkpointDir: String,
      tables: Int, planes: Int, capEval: Int = 200,
      cosMin: Double = 0.35, maxFilesPerTrigger: Int = 1): Unit =
    start(spark, inputDir, contamDir, ledgerDir, indexDir, checkpointDir,
      tables, planes, capEval, cosMin, maxFilesPerTrigger,
      availableNow = true).awaitTermination()
}
