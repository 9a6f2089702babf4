package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** Semantic pins for mix_contrastive_pairs (the oracle gate re-proves the
  * full dataflow bit-exact; this pins the contract properties a training
  * consumer relies on).
  */
class ContrastivePairsSpec extends SparkSuite {

  private lazy val rows =
    DedupQueries.queries("mix_contrastive_pairs")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private lazy val pos =
    DedupQueries.queries("dedup_ngram_jaccard")(spark, sf("sf0.001"))
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("positives are exactly the near-dup pair set; negatives never " +
      "collide with a positive") {
    val gotPos = rows.collect { case (a, b, 1L) => (a, b) }.toSet
    val gotNeg = rows.collect { case (a, b, 0L) => (a, b) }.toSet
    assert(gotPos == pos)
    assert(gotNeg.intersect(pos).isEmpty)
    assert(gotNeg.nonEmpty, "vacuous: no negatives sampled")
  }

  test("every anchor of a positive pair receives at least one negative " +
      "(the triplet shape is completable)") {
    val anchors = pos.flatMap(p => Seq(p._1, p._2))
    val negDocs = rows.collect { case (a, b, 0L) => Seq(a, b) }.flatten.toSet
    val covered = anchors.count(negDocs.contains)
    // every (anchor, j) probe picks from a ~64-doc bucket; an anchor can
    // only miss if both its probe buckets are empty in the pool — with
    // the pool ≫ 256 docs that is rare, and zero coverage would mean the
    // sampler is broken
    assert(covered >= anchors.size * 9 / 10,
      s"only $covered of ${anchors.size} anchors got a negative")
  }

  test("pairs are normalized (doc_a < doc_b), unique, and self-free") {
    rows.foreach { case (a, b, _) => assert(a < b, s"unnormalized ($a,$b)") }
    assert(rows.map(r => (r._1, r._2)).distinct.size == rows.size)
  }
}
