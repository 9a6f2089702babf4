package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** Pins for the farthest-point coreset (driver-loop operator, not
  * oracle-expressible): exact self-consistency against a local replay of
  * the greedy traversal, separation monotonicity, and a coverage sanity
  * bound versus the trivial first-k baseline.
  */
class CoresetSpec extends SparkSuite {

  private def cosDist(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("farthest-point selection replays exactly: each pick is the argmax " +
      "of min-distance with smallest-id tie-break; separation is " +
      "non-increasing; greedy covers better than first-k") {
    val dir = "/root/testdata/sf0.001"
    val out = SimilarityQueries.queries("sim_diverse_coreset")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.length == 16)
    assert(out.head._3.isEmpty) // seed has no predecessor

    // Local replay over the collected corpus (500 × 64 at sf0.001).
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val byId = corpus.toMap
    def minDist(id: Long, sel: Seq[Long]): Double =
      sel.map(s => cosDist(byId(id), byId(s))).min

    assert(out.head._2 == corpus.head._1, "seed must be the smallest id")
    // The operator's argmax key: 6dp half-up quantized separation — the
    // cross-engine rounding that lets the oracle replay the traversal.
    def quant(d: Double): Long = math.floor(d * 1e6 + 0.5).toLong
    val sel = scala.collection.mutable.ArrayBuffer(out.head._2)
    for ((rank, id, dist) <- out.drop(1)) {
      val best = corpus.iterator.filterNot(c => sel.contains(c._1))
        .map { case (cid, _) => (cid, quant(minDist(cid, sel.toSeq))) }
        .reduce((a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a)
      assert(id == best._1, s"rank $rank picked $id, replay says $best")
      assert(dist.get == best._2 / 1e6,
        s"rank $rank sep_dist ${dist.get} vs replayed ${best._2 / 1e6}")
      sel += id
    }

    // Separation sequence is non-increasing (greedy picks farthest first).
    val seps = out.drop(1).map(_._3.get)
    assert(seps.zip(seps.drop(1)).forall { case (a, b) => b <= a }, seps)

    // Coverage: greedy's radius (max min-dist to the selected set) beats
    // the trivial first-16-ids baseline on this corpus.
    val ids = corpus.map(_._1)
    def radius(s: Seq[Long]): Double =
      ids.filterNot(s.contains).map(minDist(_, s)).max
    val greedy = radius(sel.toSeq)
    val firstK = radius(ids.take(16).toSeq)
    assert(greedy <= firstK, s"greedy radius $greedy vs first-k $firstK")

    // Determinism: a second run returns the identical frame.
    val again = SimilarityQueries.queries("sim_diverse_coreset")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.sameElements(again))
  }
}
