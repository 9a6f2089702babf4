package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Planted-skew measurement for Skew.saltedJoin (round-11 "use or lose"):
  * replicate the sf events table and remap user_id so ONE user owns 10%
  * of all rows, then join against a broadcast-ineligible per-user dim
  * (wide payload, autoBroadcast disabled — the exact scenario
  * Skew.saltedJoin documents) three ways:
  *
  *   plain    — sort-merge join, AQE skew-split OFF: the hot user's rows
  *              land on one reducer; that task is the straggler.
  *   aqe      — sort-merge join, AQE skew-split ON with the skew
  *              thresholds scaled to this data size (production default
  *              fires at 256 MB partitions; the planted hot partition
  *              here is ~tens of MB, so the threshold is lowered by the
  *              same factor — the mechanism, not the constant, is under
  *              test).
  *   salted   — Skew.saltedJoin, AQE OFF: the manual fix for engines or
  *              plans where AQE cannot rewrite the join (non-SMJ/SHJ
  *              shapes, or a shuffle reused by another consumer).
  *
  * All three must agree bit-exactly on the probe aggregate (count + sum
  * of a joined column per event_type); wall times go to SCALING.md.
  * Usage: `sbt "runMain graft.SkewAudit [sfDir] [replicate]"`.
  */
object SkewAudit {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rep = if (args.length > 1) args(1).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the documented scenario: dim side broadcast-ineligible
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Plant the skew: rep× the events table; rows with event_id % 10 == 0
    // (exactly 10%) all remap to user 999_999 — one hot key.
    val events = graft.queries.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val fact = events
      .withColumn("r", explode(expr(s"sequence(0, ${rep - 1})")))
      .select(
        (col("event_id") * rep + col("r")).as("row_id"),
        when(col("event_id") % 10 === 0, lit(999999L))
          .otherwise(col("user_id")).as("user_id"),
        col("event_type"))
    val dim = fact.select(col("user_id")).distinct()
      .withColumn("segment", (col("user_id") % 7).cast("long"))
      // wide payload: what makes a real per-user dim broadcast-ineligible
      .withColumn("payload", expr("repeat(cast(user_id as string), 200)"))
    fact.persist(); dim.persist()
    val nFact = fact.count(); val nDim = dim.count()

    def probe(joined: DataFrame): Array[(String, Long, Long)] =
      joined.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("segment")).as("s"))
        .orderBy(col("event_type"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    def setAqe(on: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", on.toString)
      if (on) {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        // production default is 256MB / factor 5; the planted hot
        // partition here is ~10% of a few hundred MB of shuffle — scale
        // the byte threshold so the same mechanism fires
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        spark.conf.set(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      }
    }

    // warm both cached inputs once
    probe(fact.join(dim, "user_id")): Unit

    setAqe(false)
    val (plainRes, plainSec) = timed(probe(fact.join(dim, "user_id")))

    setAqe(true)
    val (aqeRes, aqeSec) = timed(probe(fact.join(dim, "user_id")))
    val aqePlan = fact.join(dim, "user_id").groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("segment")).as("s"))
    aqePlan.collect(): Unit
    val skewFired = aqePlan.queryExecution.executedPlan.toString
      .contains("isSkew=true")

    setAqe(false)
    val (saltRes, saltSec) =
      timed(probe(Skew.saltedJoin(fact, dim, "user_id", salts = 16)))

    require(plainRes.sameElements(aqeRes) && plainRes.sameElements(saltRes),
      s"probe mismatch:\nplain=${plainRes.mkString}\naqe=${aqeRes.mkString}" +
        s"\nsalted=${saltRes.mkString}")

    println(s"""{"fact_rows": $nFact, "dim_rows": $nDim, "replicate": $rep,
       | "hot_share": 0.10, "plain_smj_sec": ${f"$plainSec%.2f"},
       | "aqe_skewsplit_sec": ${f"$aqeSec%.2f"}, "aqe_skew_fired": $skewFired,
       | "salted_join_sec": ${f"$saltSec%.2f"},
       | "results_identical": true}""".stripMargin.linesIterator.mkString(""))
    spark.stop()
  }
}
