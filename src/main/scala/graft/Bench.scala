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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val outcome =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e.toString.take(200)) }
      val sec = (System.nanoTime() - t0) / 1e9
      outcome.foreach { err =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: $err")
      }
      (name, sec, outcome.isEmpty)
    }
    val qs = results
      .map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, true) => v }.sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(2)
  }
}
