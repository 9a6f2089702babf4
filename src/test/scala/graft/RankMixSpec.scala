package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.queries.RankMixQueries

/** RankMixQueries invariants the oracle can't see: determinism across
  * runs, sampling-contract bounds, ranking sanity, and the no-shuffle
  * plan shape of the per-row mixing predicate.
  */
class RankMixSpec extends SparkSuite {

  private val dir = sf("sf0.001")
  private def run(name: String) = RankMixQueries.queries(name)(spark, dir)

  test("tfidf: per-doc ranks are 1..k, scores non-increasing within a doc") {
    val rows = run("text_tfidf_topk")
      .select("doc_id", "rk", "tfidf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"doc $doc ranks not dense: ${sorted.toSeq}")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      }, s"doc $doc tfidf not non-increasing")
    }
  }

  test("vocab sketch: FNV-register HLL per-source cardinality within 5% " +
      "of exact, registers internally consistent, deterministic") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.TextQueries.queries("text_vocab_sketch")(
      spark, dir).collect()
    val approx = rows.map(r =>
      r.getString(0) -> r.getAs[Double]("n_vocab_est")).toMap
    val exact = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"))
      .agg(countDistinct(col("token")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (src, n) =>
      val a = approx(src)
      assert(math.abs(a - n) / n <= 0.05,
        s"source $src: approx $a vs exact $n exceeds 5% error")
    }
    // register-sum invariants: every used register subtracts from the
    // empty-register mass, never below the all-rank-50 floor
    rows.foreach { r =>
      val used = r.getAs[Long]("n_reg_used")
      val s = r.getAs[Long]("reg_sum")
      assert(used >= 1 && used <= 4096)
      assert(s < 4096L * (1L << 50), s"reg_sum $s not below empty mass")
      assert(s >= (4096 - used) * (1L << 50) + used,
        s"reg_sum $s below minimum for $used used registers")
    }
    val again = graft.queries.TextQueries.queries("text_vocab_sketch")(
      spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("n_vocab_est")).toMap
    assert(again == approx, "sketch must be deterministic across runs")
  }

  test("bm25: every returned doc contains a query term; scores positive, sorted") {
    val out = run("text_bm25").collect()
    assert(out.nonEmpty)
    val scores = out.map(_.getDouble(2))
    assert(scores.forall(_ > 0))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    val ids = out.map(_.getLong(0)).toSet
    val withTerm = spark.read.parquet(s"$dir/documents.parquet")
      .filter("array_contains(split(text,' '),'spark') or " +
        "array_contains(split(text,' '),'vector')")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(withTerm), s"docs without query terms scored: ${ids -- withTerm}")
  }

  test("stratified sample: exactly min(10, stratum size) docs per lang, stable across runs") {
    val a = run("sample_stratified").collect().map(_.toSeq)
    val b = run("sample_stratified").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "sample not deterministic across runs")
    val perLang = a.groupBy(_.head).map { case (l, rs) => (l, rs.length) }
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    perLang.foreach { case (lang, n) =>
      assert(n == math.min(10L, counts(lang.asInstanceOf[String])),
        s"lang $lang sampled $n of ${counts(lang.asInstanceOf[String])}")
    }
  }

  test("weighted mix: kept set matches the report's per-source counts; heavy rate < light rate") {
    val kept = run("mix_weighted_sample").collect()
      .groupBy(_.getString(1)).map { case (s, rs) => (s, rs.length.toLong) }
    val report = run("mix_source_rates").collect()
      .map(r => (r.getString(0), (r.getLong(2), r.getDouble(3)))).toMap
    kept.foreach { case (src, n) =>
      assert(report(src)._1 == n, s"$src: report ${report(src)._1} != kept $n")
    }
    val (heavy, light) = report.partition { case (s, _) =>
      Set("src0", "src1", "src2", "src3")(s)
    }
    val heavyRate = heavy.values.map(_._2).sum / heavy.size
    val lightRate = light.values.map(_._2).sum / light.size
    assert(heavyRate < lightRate,
      s"heavy sources not downsampled harder: $heavyRate vs $lightRate")
  }

  test("mix_vocab_by_source: approx_count_distinct (the 100 TB form) " +
      "lands within 5% of the exact vocabulary count") {
    import org.apache.spark.sql.functions._
    val exact = RankMixQueries.queries("mix_vocab_by_source")(spark, dir)
      .collect().map(r =>
        r.getAs[String]("source") -> r.getAs[Long]("n_vocab")).toMap
    val approx = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"))
      .agg(approx_count_distinct(col("token")).as("est"))
      .collect().map(r =>
        r.getAs[String]("source") -> r.getAs[Long]("est")).toMap
    exact.foreach { case (src, n) =>
      val err = math.abs(approx(src) - n).toDouble / n
      assert(err <= 0.05, s"$src: approx ${approx(src)} vs exact $n")
    }
  }

  test("mix_token_budget: weights sum to 1 and allocations to the budget " +
      "(within rounding), sqrt-damping orders below raw share") {
    val rows = RankMixQueries.queries("mix_token_budget")(spark, dir)
      .collect()
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    val alloc = rows.map(_.getAs[Double]("alloc_tokens")).sum
    assert(math.abs(alloc - 1000000.0) < 1.0, s"allocs sum to $alloc")
    // sqrt damping: the largest source's weight share is strictly below
    // its raw token share
    val total = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val big = rows.maxBy(_.getAs[Long]("n_tokens"))
    assert(big.getAs[Double]("weight") <
      big.getAs[Long]("n_tokens") / total)
  }

  test("weighted mix plan: per-row predicate, no shuffle before the output sort") {
    val df = RankMixQueries.queries("mix_weighted_sample")(spark, dir)
    val shuffles = physicalNodes(df).collect { case e: ShuffleExchangeExec => e }
    // the only exchange is the range partitioning for the final orderBy
    assert(shuffles.length <= 1, s"unexpected shuffles: $shuffles")
  }

  test("mix_epoch_schedule: equal budget shares, 4-epoch cap, exact " +
      "integer sampling arithmetic") {
    val rows = RankMixQueries.queries("mix_epoch_schedule")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    val budget = rows.map(_.getAs[Long]("n_tokens")).sum
    val nSources = rows.length
    rows.foreach { r =>
      val nt = r.getAs[Long]("n_tokens")
      val target = r.getAs[Long]("target_tokens")
      val em = r.getAs[Long]("epochs_milli")
      val sampled = r.getAs[Long]("sampled_tokens")
      assert(target == budget / nSources)
      assert(em == math.min(4000L, target * 1000 / nt))
      assert(sampled == nt * em / 1000)
      // sampling never exceeds the equal share, and the cap binds only
      // when the share would demand > 4 epochs of the source
      assert(sampled <= target)
      if (em == 4000L) assert(4 * nt <= target)
      else assert(sampled >= target - nt / 1000 - 1,
        s"uncapped source should nearly exhaust its share: $r")
    }
    // at least one direction of the schedule exists on real data:
    // some source repeats (em > 1000) or is subsampled (em < 1000)
    assert(rows.exists(_.getAs[Long]("epochs_milli") != 1000L))
  }
}
