package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every query in SparkEntry.queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Failures are reported
  * loudly (per-query "error" entry + rc=2), never silently timed — a broken
  * query must not masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // the deployment path: functions arrive via the extension, not
      // per-query registration
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup outside the timed section: session/codegen/parquet-footer costs
    // land here, not on the first measured query.
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }

    var failed = List.empty[String]
    // Two timed runs per query, best-of (this box is multi-tenant noisy;
    // min-of-2 measures the engine, not a neighbor's compile job).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val outcome =
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable => Some(e.toString.take(200)) }
        ((System.nanoTime() - t0) / 1e9, outcome)
      }
      val err = runs.flatMap(_._2).headOption
      err.foreach { e =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: $e")
      }
      (name, runs.map(_._1).min, err.isEmpty)
    }
    val qs = results
      .map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, true) => v }.sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")

    // Streaming-slice throughput (reference floor: >=10 ev/s sustained,
    // harness.go:284): envelope-ize the events table, run the full
    // source -> filter -> route -> publish -> commit pipeline through the
    // DSv2 change-stream source, report events/sec. Setup (envelope write)
    // is excluded from the timed window.
    val streamingJson =
      try {
        import org.apache.spark.sql.functions._
        val root = java.nio.file.Files.createTempDirectory("graft-bench").toString
        val n = spark.read.parquet(s"$sfDir/events.parquet")
          .select(
            struct(lpad(col("event_id").cast("string"), 12, "0").as("_data"))
              .as("_id"),
            // event types -> publishable op types ('error' -> 'drop':
            // silently skipped, stream continues)
            expr("""CASE event_type WHEN 'click' THEN 'insert'
                    WHEN 'purchase' THEN 'update'
                    WHEN 'signup' THEN 'replace'
                    WHEN 'view' THEN 'delete'
                    ELSE 'drop' END""").as("operationType"),
            timestamp_micros(expr("ts div 1000")).as("clusterTime"),
            timestamp_micros(expr("ts div 1000")).as("wallTime"),
            struct(lit("bench").as("db"), lit("events").as("coll")).as("ns"),
            col("props").as("documentKey"),
            col("props").as("fullDocument"),
            lit(null).cast("string").as("fullDocumentBeforeChange"),
            lit(null).cast("string").as("updateDescription"))
          .write.mode("overwrite").parquet(s"$root/in")
        val cnt = spark.read.parquet(s"$root/in").count()
        val cfgS = graft.streaming.StreamingCdc.StreamConfig(
          "bench", s"$root/in", s"$root/messages", s"$root/tokens",
          s"$root/ckpt", sourceFormat = "changestream")
        val t0 = System.nanoTime()
        graft.streaming.StreamingCdc.runAll(spark, Seq(cfgS),
          availableNow = true)
        val sec = (System.nanoTime() - t0) / 1e9
        val published = spark.read.parquet(s"$root/messages").count()
        s"""{"events":$cnt,"published":$published,"sec":$sec,"events_per_sec":${cnt / sec}}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] streaming FAILED: $e")
          failed ::= "streaming_e2e"
          """{"error":true}"""
      }

    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"streaming":$streamingJson,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // The driver's stdout capture truncated round 5's per-query tail
    // (56/96 timings survived) — persist the full line to a file too so
    // every round's comparison is machine-readable regardless of capture.
    // APPEND (JSONL, one line per run): the dual-SF / dual-CPUS cadence
    // runs Bench several times per round, and truncate-on-write would
    // keep only the last run — the exact record-loss this file prevents.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile: $e") }
    spark.stop()
    if (failed.nonEmpty) sys.exit(2)
  }
}
