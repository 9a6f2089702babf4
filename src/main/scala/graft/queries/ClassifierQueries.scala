package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** In-engine trained classifier: multinomial Naive Bayes over word unigrams,
  * trained AND scored entirely as relational dataflow — the "fasttext-style
  * quality/langid filter" step of a training-data pipeline, re-expressed so
  * the model fit is a pair of aggregations and inference is a broadcast join
  * (the shape used at corpus scale, where the model is small and the corpus
  * is 100 TB).
  *
  * Train/test split is `doc_id % 5` (deterministic, SQL-replayable). The fit
  * is count aggregation: per-(lang, token) counts, per-lang totals, vocab
  * size, class priors. Scoring is log-linear: each token weight
  * ln((c+1)/(tot+V)) is quantized to integer MICRO-NATS per the oracle-safety
  * rule in [[Tables]] — the per-doc score is then a SUM of BIGINTs (exact,
  * order-free across engines and partition counts), never a float reduction.
  * Argmax is a doc_id-partitioned row_number with a lexicographic tie-break.
  *
  * Scale shape: the model (vocab × n_langs weights) is corpus-size-INDEPENDENT
  * — it is broadcast, so the 100 TB side never shuffles for inference; the
  * only wide exchanges are the two training groupBys, which partial-aggregate
  * map-side. If vocab outgrew the broadcast threshold the scoring join
  * degrades gracefully to a shuffled hash join on token — still one exchange
  * of (doc_id, token) pairs, no cartesian anywhere (the lang fan-out is a
  * broadcast of a 5-row frame).
  *
  * On the synthetic corpus the `lang` label is not derivable from the text
  * (all langs share one vocabulary), so the learned model converges to the
  * class priors — accuracy is ~the majority-class rate BY CONSTRUCTION of the
  * testdata; what the gate pins is the train/score dataflow itself, bit-exact
  * against DuckDB running the same fit.
  */
object ClassifierQueries {

  private val toks = "split(text, ' ')"

  /** All (doc_id, lang_actual, lang, score) rows before the argmax — the
    * margin-audit surface ClassifierSpec checks tie-safety on.
    */
  private[graft] def allScores(s: SparkSession, dir: String): DataFrame =
    scoreFrame(s, dir)

  /** Per-test-doc NB predictions: (doc_id, lang_actual, lang_pred, score). */
  private def nbScored(s: SparkSession, dir: String): DataFrame = {
    val scored = scoreFrame(s, dir)
    val rk = row_number().over(
      Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("lang").asc))
    scored.withColumn("rk", rk).filter(col("rk") === 1)
      .select(col("doc_id"), col("lang_actual"),
        col("lang").as("lang_pred"), col("score"))
  }

  private def scoreFrame(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), expr(toks).as("tokens"))
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val test = docs.filter(col("doc_id") % 5 === 0)

    val grams = train.select(col("lang"), explode(col("tokens")).as("token"))
    val counts = grams.groupBy("lang", "token").agg(count(lit(1)).as("c"))
    val totals = grams.groupBy("lang").agg(count(lit(1)).as("tot"))
    val vocab = grams.agg(countDistinct(col("token")).as("v"))
    val nTrain = train.agg(count(lit(1)).as("n_train"))
    val priors = train.groupBy("lang").agg(count(lit(1)).as("n_lang"))

    def microNats(x: Column): Column =
      round(log(x) * lit(1e6), 0).cast("long")

    // Laplace-smoothed token weights, quantized once per (lang, token).
    val weights = counts
      .join(totals, Seq("lang"))
      .crossJoin(broadcast(vocab))
      .select(col("lang"), col("token"),
        microNats((col("c") + lit(1)).cast("double") / (col("tot") + col("v")))
          .as("wm"))
    // Per-lang OOV default + prior — a 5-row frame, broadcast.
    val langInfo = totals
      .crossJoin(broadcast(vocab))
      .join(priors, Seq("lang"))
      .crossJoin(broadcast(nTrain))
      .select(col("lang"),
        microNats(lit(1.0) / (col("tot") + col("v"))).as("dm"),
        microNats(col("n_lang").cast("double") / col("n_train")).as("pm"))

    val testToks = test.select(
      col("doc_id"), col("lang").as("lang_actual"),
      explode(col("tokens")).as("token"))
    testToks
      .crossJoin(broadcast(langInfo))
      .join(broadcast(weights), Seq("lang", "token"), "left")
      .groupBy(col("doc_id"), col("lang_actual"), col("lang"), col("pm"))
      .agg(sum(coalesce(col("wm"), col("dm"))).as("tok_score"))
      .select(col("doc_id"), col("lang_actual"), col("lang"),
        (col("pm") + col("tok_score")).cast("long").as("score"))
  }

  // Shared oracle CTE chain — the fit and scoring replayed in DuckDB. SUMs
  // of BIGINT are HUGEINT there, so every derived value is CAST AS BIGINT
  // before it reaches the comparer (Tables oracle-safety rules).
  private val nbCtes =
    """WITH docs AS (
         SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS tokens
         FROM documents),
       train AS (SELECT * FROM docs WHERE doc_id % 5 <> 0),
       test  AS (SELECT * FROM docs WHERE doc_id % 5 = 0),
       grams AS (SELECT lang, UNNEST(tokens) AS token FROM train),
       counts AS (SELECT lang, token, COUNT(*) AS c FROM grams GROUP BY 1, 2),
       totals AS (SELECT lang, COUNT(*) AS tot FROM grams GROUP BY 1),
       vocab AS (SELECT COUNT(DISTINCT token) AS v FROM grams),
       ntr AS (SELECT COUNT(*) AS n_train FROM train),
       priors AS (SELECT lang, COUNT(*) AS n_lang FROM train GROUP BY 1),
       weights AS (
         SELECT lang, token,
                CAST(ROUND(LN((c + 1)::DOUBLE / (tot + v)) * 1e6) AS BIGINT)
                  AS wm
         FROM counts JOIN totals USING (lang) CROSS JOIN vocab),
       langinfo AS (
         SELECT lang,
                CAST(ROUND(LN(1.0 / (tot + v)) * 1e6) AS BIGINT) AS dm,
                CAST(ROUND(LN(n_lang::DOUBLE / n_train) * 1e6) AS BIGINT)
                  AS pm
         FROM totals CROSS JOIN vocab JOIN priors USING (lang) CROSS JOIN ntr),
       tt AS (
         SELECT doc_id, lang AS lang_actual, UNNEST(tokens) AS token
         FROM test),
       sc AS (
         SELECT t.doc_id, t.lang_actual, li.lang, li.pm,
                SUM(COALESCE(w.wm, li.dm)) AS tok_score
         FROM tt t
         CROSS JOIN langinfo li
         LEFT JOIN weights w ON w.lang = li.lang AND w.token = t.token
         GROUP BY 1, 2, 3, 4),
       fin AS (
         SELECT doc_id, lang_actual, lang,
                CAST(pm + tok_score AS BIGINT) AS score,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY pm + tok_score DESC, lang ASC) AS rk
         FROM sc)"""

  val queries: Map[String, Q] = Map(
    "text_nb_classifier" -> ((s, dir) =>
      nbScored(s, dir).orderBy(col("doc_id"))),
    "text_nb_confusion" -> ((s, dir) =>
      nbScored(s, dir)
        .groupBy(col("lang_actual"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang_actual"), col("lang_pred"))))

  val oracle: Map[String, String] = Map(
    "text_nb_classifier" ->
      s"""$nbCtes
         SELECT doc_id, lang_actual, lang AS lang_pred, score
         FROM fin WHERE rk = 1 ORDER BY doc_id""",
    "text_nb_confusion" ->
      s"""$nbCtes
         SELECT lang_actual, lang AS lang_pred, COUNT(*) AS n_docs
         FROM fin WHERE rk = 1
         GROUP BY 1, 2 ORDER BY lang_actual, lang_pred""")
}
