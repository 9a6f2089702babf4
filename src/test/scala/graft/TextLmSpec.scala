package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** Hand-computed pin for text_lm_score (the oracle gate checks engine↔DuckDB
  * parity; this fixes the SEMANTICS against closed-form values, so both
  * engines agreeing on the wrong formula cannot slip through).
  */
class TextLmSpec extends SparkSuite {

  test("unigram + add-one bigram log-probs match closed-form values on a " +
      "tiny corpus, and the common-token doc outscores the rare-token doc") {
    // Corpus: doc 1 = "x x x x", doc 2 = "x y".
    // Unigrams: x×5, y×1 → n=6 tokens, vocab v=2.
    // Bigrams:  (x,x)×3 from doc 1, (x,y)×1 from doc 2.
    val dir = java.nio.file.Files.createTempDirectory("lmscore").toString
    import spark.implicits._
    Seq((1L, "x x x x", "en", "src0"), (2L, "x y", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")

    val out = TextQueries.queries("text_lm_score")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // doc 1: 4 tokens, each p = 5/6; bigrams (x,x): p = (3+1)/(5+2).
    assert(out(1L)._1 == 4L)
    assert(out(1L)._2 == r6(math.log(5.0 / 6)), s"uni doc1 ${out(1L)._2}")
    assert(out(1L)._3 == r6(math.log(4.0 / 7)), s"bi doc1 ${out(1L)._3}")
    // doc 2: avg of ln(5/6), ln(1/6); one bigram (x,y): (1+1)/(5+2).
    assert(out(2L)._1 == 2L)
    assert(out(2L)._2 == r6((math.log(5.0 / 6) + math.log(1.0 / 6)) / 2))
    assert(out(2L)._3 == r6(math.log(2.0 / 7)))
    // The quality-filter direction: common-token text scores higher.
    assert(out(1L)._2 > out(2L)._2 && out(1L)._3 > out(2L)._3)

    // CCNet-style bucketing ranks by that same score within language:
    // the fluent doc lands in an earlier tercile than the rare-token doc.
    val buckets = TextQueries.queries("curation_lm_buckets")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(buckets(1L) == "head", s"buckets: $buckets")
    assert(buckets(2L) == "middle", s"buckets: $buckets")
  }

  test("curation_rho_selection: keeps exactly the top floor(n/3) per " +
      "language by excess score, and excess is bi - uni") {
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val scores = TextQueries.queries("text_lm_score")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    val got = TextQueries.queries("curation_rho_selection")(spark, dir)
      .collect()
    got.foreach { r =>
      val (uni, bi) = scores(r.getLong(0))
      assert(r.getDouble(2) == uni)
      assert(bi.contains(r.getDouble(3)))
      assert(r.getDouble(4) == bi.get - uni, "excess must be bi - uni")
    }
    // per-language: exactly floor(n_lang/3) selected, and every selected
    // doc's excess >= every unselected doc's (non-null) excess
    val byLang = scores.toSeq.groupBy { case (id, _) => docs(id) }
    val gotByLang = got.groupBy(_.getString(1))
    byLang.foreach { case (lang, ds) =>
      val sel = gotByLang.getOrElse(lang, Array.empty)
      assert(sel.length == ds.length / 3,
        s"$lang: ${sel.length} selected of ${ds.length}")
      if (sel.nonEmpty) {
        val selIds = sel.map(_.getLong(0)).toSet
        val minSel = sel.map(_.getDouble(4)).min
        val maxUnsel = ds.collect {
          case (id, (u, Some(b))) if !selIds.contains(id) => b - u
        }
        if (maxUnsel.nonEmpty)
          assert(minSel >= maxUnsel.max,
            s"$lang: selected floor $minSel < unselected $maxUnsel.max")
      }
    }
  }
}
