package graft

import org.apache.spark.sql.functions._
import graft.queries.{ClassifierQueries, TextQueries}

/** Semantic pins for the in-engine Naive Bayes classifier and the
  * context-window chunker (the oracle gate re-proves both dataflows
  * bit-exact against DuckDB; this pins the contract properties a
  * training consumer relies on).
  */
class ClassifierSpec extends SparkSuite {

  private lazy val scored =
    ClassifierQueries.queries("text_nb_classifier")(spark, sf("sf0.001"))
      .collect()

  private lazy val docs = spark.read
    .parquet(sf("sf0.001") + "/documents.parquet")
    .select(col("doc_id").cast("long"), col("lang"), col("text"))
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("every held-out doc is scored exactly once, and only held-out docs") {
    val expected = docs.collect { case (id, _, _) if id % 5 == 0 => id }.toSet
    val got = scored.map(_.getLong(0))
    assert(got.length == got.distinct.length, "a doc scored twice")
    assert(got.toSet == expected)
  }

  test("predictions come from the trained label set and actuals are " +
      "faithful") {
    val trainLangs =
      docs.collect { case (id, l, _) if id % 5 != 0 => l }.toSet
    val actualById =
      docs.collect { case (id, l, _) if id % 5 == 0 => id -> l }.toMap
    scored.foreach { r =>
      assert(trainLangs.contains(r.getString(2)),
        s"predicted unseen label ${r.getString(2)}")
      assert(r.getString(1) == actualById(r.getLong(0)))
    }
  }

  test("argmax margins are far above the micro-nat quantization floor " +
      "(cross-engine float noise cannot flip a prediction)") {
    // Recompute the per-(doc, lang) scores via the same pipeline but keep
    // all langs, then check the top-2 gap. Scores are integer micro-nats;
    // ln() differing by 1 ulp between engines moves a quantized weight by
    // at most 1, so any doc-level gap > n_tokens is unflippable. The
    // synthetic corpus has no tie-prone structure; require a healthy gap.
    val byDoc = ClassifierQueries
      .allScores(spark, sf("sf0.001"))
      .collect()
      .groupBy(_.getLong(0))
    val tokenCount = docs.map { case (id, _, t) =>
      id -> t.split(' ').length
    }.toMap
    var checked = 0
    byDoc.foreach { case (id, rows) =>
      val top = rows.map(_.getLong(3)).sortBy(-_).take(2)
      if (top.length == 2 && top(0) != top(1)) {
        assert(top(0) - top(1) > tokenCount(id),
          s"doc $id margin ${top(0) - top(1)} within quantization noise")
        checked += 1
      }
    }
    assert(checked > scored.length / 2, "vacuous: all docs tied")
  }

  test("confusion matrix totals equal the held-out count") {
    val conf =
      ClassifierQueries.queries("text_nb_confusion")(spark, sf("sf0.001"))
        .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(conf == scored.length)
  }

  test("chunks tile each document: full coverage, stride-24 starts, " +
      "8-token overlap between full windows, short tails dropped") {
    val chunks =
      TextQueries.queries("text_train_chunks")(spark, sf("sf0.001"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4)))
    val n = docs.map { case (id, _, t) => id -> t.split(' ').length }.toMap
    val textById = docs.map { case (id, _, t) => id -> t }.toMap
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      // starts are exactly 1, 25, 49, ... (stride 24)
      sorted.zipWithIndex.foreach { case ((_, k, start, len, text), i) =>
        assert(k == i && start == 24L * i + 1)
        assert(len == math.min(32L, n(id) - 24L * i))
        assert(text == textById(id).split(' ')
          .slice(start.toInt - 1, (start + len - 1).toInt).mkString(" "))
      }
      // the last kept chunk reaches the end of the document (dropping a
      // short tail never loses tokens — the previous window covers it)
      val last = sorted.last
      assert(last._3 + last._4 - 1 == n(id),
        s"doc $id tokens beyond ${last._3 + last._4 - 1} of ${n(id)} lost")
    }
    assert(chunks.nonEmpty)
  }

  test("vocab-sized weight broadcast is loudly fenced (round-15 VERDICT " +
      "#5): over-bound vocabularies refuse with the shuffled-join hint") {
    ClassifierQueries.requireVocabBroadcastable(1L)
    ClassifierQueries.requireVocabBroadcastable(
      ClassifierQueries.VocabBroadcastMaxRows)
    val e = intercept[IllegalArgumentException] {
      ClassifierQueries.requireVocabBroadcastable(
        ClassifierQueries.VocabBroadcastMaxRows + 1)
    }
    assert(e.getMessage.contains("broadcast fence"), e.getMessage)
    assert(e.getMessage.contains("shuffled token join"), e.getMessage)
  }
}
