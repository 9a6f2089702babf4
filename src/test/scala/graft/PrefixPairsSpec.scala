package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** Pins dedup_prefix_pairs: prefix filtering must be LOSSLESS — its output
  * equals the brute-force all-pairs Jaccard (no df-cap, no candidate
  * loss) — while indexing strictly fewer postings than the full inverted
  * index. (The driver gate re-proves losslessness against DuckDB at
  * sf0.01; this pins it in-suite at sf0.001.)
  */
class PrefixPairsSpec extends SparkSuite {

  private val t = 0.5 // JaccardMin — keep in sync with DedupQueries

  test("prefix-filtered pairs equal the brute-force all-pairs result") {
    val got = DedupQueries.queries("dedup_prefix_pairs")(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // brute force: full inverted index, every co-occurring pair scored
    val ex = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"),
        explode(expr("shingle_hashes(split(text, ' '), 3)")).as("s"))
    val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val brute = ex.toDF("doc_a", "s")
      .join(ex.toDF("doc_b", "s"), "s")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= t)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == brute)
    assert(got.nonEmpty, "vacuous: no near-dup pairs in the fixture corpus")
  }

  test("the prefix index is materially smaller than the full index " +
      "(the point of the algorithm)") {
    val ex = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"),
        explode(expr("shingle_hashes(split(text, ' '), 3)")).as("s"))
    val full = ex.count()
    // replay the query's prefix selection
    import org.apache.spark.sql.expressions.Window
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val prefix = ex.join(dfreq, "s")
      .withColumn("rk",
        row_number().over(byDoc.orderBy(col("df"), col("s"))))
      .withColumn("nsh", count(lit(1)).over(byDoc))
      .filter(col("rk") <= col("nsh") - ceil(lit(t) * col("nsh")) + 1)
      .count()
    assert(prefix < full * 0.6,
      s"prefix index $prefix not materially smaller than full $full")
  }

  test("over-threshold candidate mass refuses LOUDLY up front instead of " +
      "dying by disk exhaustion mid-job") {
    // tiny overrides: activate the check at any corpus size and set the
    // pair budget below what sf0.001 generates
    sys.props("graft.prefixPairsCheckMin") = "1"
    sys.props("graft.prefixPairsMax") = "10"
    try {
      val e = intercept[IllegalStateException] {
        DedupQueries.queries("dedup_prefix_pairs")(spark, sf("sf0.001"))
          .collect()
      }
      assert(e.getMessage.contains("refused"), e.getMessage)
      assert(e.getMessage.contains("dedup_minhash_pairs"), e.getMessage)
    } finally {
      sys.props.remove("graft.prefixPairsCheckMin")
      sys.props.remove("graft.prefixPairsMax")
    }
    // and with the default knobs the gate-SF run is untouched
    assert(DedupQueries.queries("dedup_prefix_pairs")(spark, sf("sf0.001"))
      .count() > 0)
  }
}
