package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.queries.RankMixQueries

/** Semantic pin for mix_source_kl (the oracle gate proves engine↔DuckDB
  * parity; this proves the DIVERGENCE math): a single-source corpus has
  * KL exactly 0, two disjoint-vocabulary sources of equal mass land on
  * exactly ln 2 in micro-nats, and on real data Gibbs' inequality holds
  * up to the documented quantization slack.
  */
class KlSpec extends SparkSuite {

  test("single source: KL(source ‖ corpus) is exactly 0 micro-nats") {
    val tmp = Files.createTempDirectory("graft-kl0").toString
    import spark.implicits._
    Seq((1L, "a b c a", "s0"), (2L, "b c d", "s0"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$tmp/documents.parquet")
    val r = RankMixQueries.queries("mix_source_kl")(spark, tmp).collect()
    assert(r.length == 1 && r(0).getAs[Long]("kl_micro") == 0L)
  }

  test("two disjoint equal-mass sources: KL = ln 2 on the micro lattice") {
    val tmp = Files.createTempDirectory("graft-kl2").toString
    import spark.implicits._
    Seq((1L, "x x x x", "sa"), (2L, "y y y y", "sb"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$tmp/documents.parquet")
    val r = RankMixQueries.queries("mix_source_kl")(spark, tmp)
      .orderBy(col("source")).collect()
    val expect = math.floor(math.log(2.0) * 1e6 + 0.5).toLong // 693147
    assert(r.map(_.getAs[Long]("kl_micro")).toSeq == Seq(expect, expect))
    assert(r.forall(_.getAs[Long]("n_tokens") == 4L))
    assert(r.forall(_.getAs[Long]("n_vocab") == 1L))
  }

  test("real corpus: Gibbs bound holds up to quantization slack, and " +
      "kl_nats is the single division of kl_micro") {
    val rows = RankMixQueries
      .queries("mix_source_kl")(spark, sf("sf0.001")).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val kl = r.getAs[Long]("kl_micro")
      val nv = r.getAs[Long]("n_vocab")
      assert(kl > -nv, s"KL $kl below Gibbs-with-slack bound -$nv")
      assert(r.getAs[Double]("kl_nats") == kl.toDouble / 1000000.0)
    }
  }
}
