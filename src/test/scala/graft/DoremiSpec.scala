package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** Semantic pin for mix_doremi_weights (the oracle gate proves
  * engine↔DuckDB parity; this proves the SCHEDULE): the emitted weights
  * must replay an independent plain-Scala implementation of the exact
  * integer multiplicative-weights loop, be monotone in the per-source
  * excess loss, stay a (floor-lossy) ppm distribution, and collapse to
  * the uniform mixture when every source has identical data.
  */
class DoremiSpec extends SparkSuite {

  /** Independent replica of the engine's MW schedule: multiplier
    * 1 + min(λ_millinats, 1000) per mille, 6 steps, ppm renormalization
    * by floor division — plain Seq arithmetic, no Spark.
    */
  private def mwReplica(lams: Seq[Long]): Seq[Long] = {
    val m = lams.map(l => 1000L + math.min(l / 1000L, 1000L))
    var a = Seq.fill(lams.size)(1000000L / lams.size)
    for (_ <- 1 to 6) {
      val raw = a.zip(m).map { case (x, mm) => x * mm }
      val s = raw.sum
      a = raw.map(r => r * 1000000L / s)
    }
    a
  }

  test("identical sources get exactly the uniform mixture") {
    val tmp = Files.createTempDirectory("graft-doremi").toString
    val texts = Seq("a b a b a b", "c d c d", "e f g h e f")
    val docs = for ((src, si) <- Seq("s0", "s1", "s2").zipWithIndex;
                    (t, ti) <- texts.zipWithIndex)
      yield ((si * 10 + ti).toLong, t, src)
    import spark.implicits._
    docs.toDF("doc_id", "text", "source")
      .write.parquet(s"$tmp/documents.parquet")

    val got = TextQueries.queries("mix_doremi_weights")(spark, tmp)
      .collect()
    val ws = got.map(_.getAs[Long]("weight_ppm")).toSeq
    val lams = got.map(_.getAs[Long]("lambda_micro")).toSeq
    assert(lams.distinct.size == 1, s"identical sources, λ = $lams")
    assert(ws.distinct.size == 1, s"weights must be uniform, got $ws")
    assert(ws == mwReplica(lams), "engine weights != MW replica")
  }

  test("real-corpus weights replay the exact MW schedule, are monotone " +
      "in excess, and form a ppm distribution") {
    val rows = TextQueries.queries("mix_doremi_weights")(spark, sf("sf0.001"))
      .orderBy(col("source")).collect()
    assert(rows.length >= 2)
    val lams = rows.map(_.getAs[Long]("lambda_micro")).toSeq
    val ws = rows.map(_.getAs[Long]("weight_ppm")).toSeq
    assert(ws == mwReplica(lams),
      s"engine weights $ws != replica ${mwReplica(lams)} for λ $lams")
    for (Seq((l1, w1), (l2, w2)) <-
        lams.zip(ws).sortBy(_._1).sliding(2) if l1 < l2)
      assert(w1 <= w2, s"λ $l1 < $l2 but weight $w1 > $w2")
    val tot = ws.sum
    assert(tot <= 1000000L && tot > 1000000L - ws.size - 6,
      s"ppm total $tot out of floor-loss bounds")
    // alloc is the overflow-safe decomposition of tot_tokens·w / 1e6
    val totTok = rows.map(_.getAs[Long]("n_tokens")).sum
    rows.foreach { r =>
      val w = r.getAs[Long]("weight_ppm")
      val expect = (totTok / 1000000L) * w + ((totTok % 1000000L) * w) / 1000000L
      assert(r.getAs[Long]("alloc_tokens") == expect)
    }
  }
}
