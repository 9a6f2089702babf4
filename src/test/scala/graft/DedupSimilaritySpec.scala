package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, SimilarityQueries}

/** Recall/quality pins for the approximate (rows-only-checked) operators:
  * the LSH candidate generators must find what the exact methods find.
  */
class DedupSimilaritySpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("MinHash banding recall: finds every exact-Jaccard ≥ 0.7 pair") {
    val exact = DedupQueries.queries("dedup_ngram_jaccard")(spark, dir)
      .filter(col("jaccard") >= 0.7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = DedupQueries.queries("dedup_minhash_pairs")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain near-dup pairs")
    val recall = exact.intersect(cand).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall; missed ${exact.diff(cand)}")
  }

  test("SimHash banding finds the high-similarity pairs too") {
    val exact = DedupQueries.queries("dedup_ngram_jaccard")(spark, dir)
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = DedupQueries.queries("dedup_simhash_pairs")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(cand).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall; missed ${exact.diff(cand)}")
  }

  private def knnPairs(name: String) =
    SimilarityQueries.queries(name)(spark, dir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH ANN recall@5 vs brute force") {
    val brute = knnPairs("sim_knn_brute")
    val ann = knnPairs("sim_knn_lsh")
    val recall = brute.intersect(ann).size.toDouble / brute.size
    // 4 tables × 6 planes on 64-dim data — partial recall is expected;
    // the bound pins that bucketing actually retrieves near neighbors.
    assert(recall >= 0.2, s"recall@5 $recall")
  }

  test("IVF ANN recall@5 vs brute force (nprobe=3 of 10 cells)") {
    val brute = knnPairs("sim_knn_brute")
    val ivf = knnPairs("sim_knn_ivf")
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    // label cells are weak quantizers for random embeddings, but probing
    // 3/10 cells must still beat random scan pruning (≈0.3 expected)
    assert(recall >= 0.25, s"recall@5 $recall")
  }

  test("embedding-cosine near-dup: bucketed candidates find the top " +
      "exact pairs") {
    import spark.implicits._
    // exact pairs ≥ 0.45 via brute force (test-side only — quadratic)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val a = emb.toDF("va", "ea"); val b = emb.toDF("vb", "eb")
    val cosExpr =
      """aggregate(zip_with(ea, eb, (x, y) -> cast(x as double) * cast(y as double)),
                   cast(0 as double), (acc, v) -> acc + v)
         / (sqrt(aggregate(ea, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double)))
            * sqrt(aggregate(eb, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))))"""
    val exact = a.crossJoin(b).filter(col("va") < col("vb"))
      .withColumn("cos", expr(cosExpr)).filter(col("cos") >= 0.45)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    val cand = DedupQueries.queries("dedup_embedding_near")(spark, dir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(cand.subsetOf(exact)) // precision 1.0: every pair re-checked
    // The threshold pairs here sit at cos≈0.45-0.51 (~60° apart — no true
    // near-dups in this corpus): 6 tables × 6 planes gives expected recall
    // ≈ 1-(1-(1-θ/π)^6)^6 ≈ 0.4; the pin guards against degenerate
    // bucketing, not a precise rate. True near-dups (cos>0.9) collide with
    // per-table prob (1-θ/π)^6 ≈ 0.82.
    val recall = exact.intersect(cand).size.toDouble / exact.size
    assert(recall >= 0.15, s"recall $recall of ${exact.size}")
  }

  test("winnowing candidates recover the high-Jaccard pairs") {
    val exact = DedupQueries.queries("dedup_ngram_jaccard")(spark, dir)
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = DedupQueries.queries("dedup_winnow_pairs")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(cand).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall; missed ${exact.diff(cand)}")
  }

  test("exact dedup groups partition the corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val groups = DedupQueries.queries("dedup_exact_groups")(spark, dir)
    assert(groups.agg(sum("n_dups")).head.getLong(0) == docs.count())
  }
}
