package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary profiling harness — not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime()
      val r = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - s) / 1e9}%8.2f s")
      r
    }

    // Rebuild mix_contrastive_pairs piecewise (mirrors DedupQueries).
    val toks = "split(text, ' ')"
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))

    val ex = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(expr(s"shingle_hashes($toks, 3)")).as("s"))
    val buckets = ex.groupBy(col("s"))
      .agg(expr("sort_array(collect_list(doc_id))").as("ds"))
      .filter(size(col("ds")) <= 64)
    val sizes = buckets.select(explode(col("ds")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val pairs = buckets.select(explode(expr("ordered_pairs(ds)")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    val ps = pairs.join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))

    val pos = t("pos localCheckpoint")(ps.localCheckpoint())
    t("pos count")(println("pos=" + pos.count()))

    val nRow = docs.agg(count(lit(1)).as("n"))
    val pool = docs.crossJoin(broadcast(nRow))
      .filter(conv(substring(md5(concat(lit("cp:"), col("doc_id").cast("string"))),
        1, 4), 16, 10).cast("bigint") * col("n") < lit(65536L) * lit(16384L))
      .select(col("doc_id"),
        conv(substring(md5(concat(lit("cb:"), col("doc_id").cast("string"))),
          1, 2), 16, 10).cast("bigint").as("bucket"))
    t("pool count")(println("pool=" + pool.count()))

    val anchors = pos.select(col("doc_a").as("a"))
      .union(pos.select(col("doc_b").as("a"))).distinct()
    t("anchors count")(println("anchors=" + anchors.count()))

    val probes = anchors
      .select(col("a"), explode(array(lit(1L), lit(2L))).as("j"))
      .withColumn("bucket",
        conv(substring(md5(concat(lit("nb:"), col("a").cast("string"),
          lit(":"), col("j").cast("string"))), 1, 2), 16, 10).cast("bigint"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a"), col("j")).orderBy(col("h"), col("doc_id"))
    val negJoined = probes.join(pool, "bucket")
      .filter(col("doc_id") =!= col("a"))
      .withColumn("h", md5(concat(lit("np:"), col("a").cast("string"),
        lit(":"), col("j").cast("string"), lit(":"),
        col("doc_id").cast("string"))))
    t("neg join count")(println("negJoined=" + negJoined.count()))

    val neg = negJoined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(least(col("a"), col("doc_id")).as("doc_a"),
        greatest(col("a"), col("doc_id")).as("doc_b"))
      .distinct()
      .join(pos, Seq("doc_a", "doc_b"), "left_anti")
      .withColumn("label", lit(0L))
    t("neg full count")(println("neg=" + neg.count()))

    val full = pos.withColumn("label", lit(1L)).union(neg)
      .orderBy(col("doc_a"), col("doc_b"))
    t("full count")(println("full=" + full.count()))

    spark.stop()
  }
}
