package graft.queries

import org.apache.spark.sql.functions._
import Tables._

/** Similarity-search operators over the `embeddings` table (vec_id BIGINT,
  * embedding ARRAY<FLOAT> 64-dim, label INT) — SURVEY.md §7 step 6.
  *
  * Scale design (100 TB):
  *  - Brute-force cosine is the CORRECTNESS baseline: a broadcast of the
  *    (small) query set against the full corpus — one scan, no shuffle of
  *    the corpus, per-query top-k via window row_number over the
  *    query-partitioned candidates. At 100 TB the corpus side stays
  *    partition-parallel; only k rows per query survive to the exchange.
  *  - The SCALE path is LSH (random-hyperplane) bucketing: signatures are
  *    computed per-row with higher-order functions inside whole-stage
  *    codegen (no explode, no shuffle), candidates join on compact bucket
  *    keys, and exact re-ranking touches only candidate pairs.
  *  - IVF-style routing: per-label centroids (coarse quantizer) assign each
  *    query to its nearest partition; at scale this prunes the corpus scan
  *    to matching partitions.
  *
  * All dot products are computed in DOUBLE with deterministic left-to-right
  * accumulation (`aggregate` over `zip_with`), and exposed values are
  * rounded to 6 decimals so both engines agree bit-exactly after rounding.
  */
object SimilarityQueries {

  /** cos(a, b) as SQL text: double-precision sequential fold. */
  private def cosExpr(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)),
                  cast(0 as double), (acc, v) -> acc + v)
        / (sqrt(aggregate($a, cast(0 as double),
             (acc, x) -> acc + cast(x as double) * cast(x as double)))
           * sqrt(aggregate($b, cast(0 as double),
             (acc, x) -> acc + cast(x as double) * cast(x as double))))"""

  private val NQueries = 10 // vec_id < 10 are the query vectors
  private val TopK = 5

  val queries: Map[String, Q] = Map(
    // Exact brute-force cosine top-k — the correctness baseline. Query set
    // is broadcast; corpus is scanned once, top-k per query via window.
    "sim_knn_brute" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val c = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
      val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
        .withColumn("cos", round(expr(cosExpr("qe", "ne")), 6))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nid"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("rank"), col("nid"), col("cos"))
        .orderBy(col("qid"), col("rank"))
    }),

    // IVF coarse quantizer: per-label centroid, one row per (label, dim).
    // Single scan + posexplode + partial agg on (label, dim) — 640 groups.
    "sim_centroids" -> ((s, dir) =>
      load(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("p", "x")))
        .groupBy(col("label").cast("long").as("label"),
          (col("p") + 1).cast("long").as("d"))
        .agg(round(avg(col("x").cast("double")), 6).as("centroid"))
        .orderBy(col("label"), col("d"))),

    // Random-hyperplane LSH signatures: 16 integer-weight hyperplanes with
    // multiplicative-mix weights w(j,d) = ((j·2654435761 + d·2246822519)
    // % 251) % 7 - 3 (decorrelated across planes; a plain (aj+bd) % 7 is
    // degenerate — every plane a cyclic shift of one pattern).
    // bucket = Σ sign-bit_j · 2^j, computed per-row with nested HOFs —
    // stays in codegen, zero shuffle.
    "sim_lsh_buckets" -> ((s, dir) =>
      load(s, dir, "embeddings")
        .select(col("vec_id"), expr(
          """aggregate(sequence(0, 15), cast(0 as bigint), (acc, j) ->
               acc + IF(aggregate(transform(embedding, (x, i) ->
                          cast(x as double)
                            * cast((j * 2654435761 + (i + 1) * 2246822519) % 251 % 7 - 3
                                   as double)),
                        cast(0 as double), (a, v) -> a + v) > 0,
                 shiftleft(cast(1 as bigint), j), cast(0 as bigint)))""")
          .as("bucket"))
        .orderBy(col("vec_id"))),

    // ANN, IVF variant: label-centroids act as the coarse quantizer
    // (k-means cells in a real deployment); every corpus vector is
    // assigned to its nearest centroid, queries probe the nprobe=3
    // nearest cells and exact-rank only those candidates. At 100 TB the
    // corpus is PARTITIONED BY cell, so a probe reads 3/10 of the data —
    // the scan pruning is the point of IVF. Rows-only (approximate);
    // recall pinned by SimilaritySpec.
    "sim_knn_ivf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = load(s, dir, "embeddings")
      // coarse quantizer: per-label mean vector (exact, tiny: 10 rows)
      val cents = emb
        .select(col("label"), posexplode(col("embedding")).as(Seq("p", "x")))
        .groupBy(col("label"), col("p"))
        .agg(avg(col("x").cast("double")).as("c"))
        .groupBy(col("label"))
        .agg(expr("transform(sort_array(collect_list(struct(p, c))), e -> e.c)")
          .as("ce"))
        .select(col("label").as("cell"), col("ce"))
      // assign corpus vectors to their nearest cell (broadcast centroids)
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos_c").desc, col("cell"))
      val assigned = emb.select(col("vec_id"), col("embedding"))
        .join(broadcast(cents))
        .withColumn("cos_c", expr(cosExpr("embedding", "ce")))
        .withColumn("rk", row_number().over(wAssign))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("embedding"), col("cell"))
      // queries probe their nprobe nearest cells
      val wProbe = Window.partitionBy(col("qid"))
        .orderBy(col("cos_c").desc, col("cell"))
      val probes = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        .join(broadcast(cents))
        .withColumn("cos_c", expr(cosExpr("qe", "ce")))
        .withColumn("rk", row_number().over(wProbe))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("qe"), col("cell"))
      // exact re-rank inside the probed cells only
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nid"))
      assigned.toDF("nid", "ne", "cell")
        .join(broadcast(probes), Seq("cell"))
        .filter(col("qid") =!= col("nid"))
        .withColumn("cos", round(expr(cosExpr("qe", "ne")), 6))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("rank"), col("nid"), col("cos"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ANN: LSH-bucketed candidate retrieval + exact cosine re-rank. 4 hash
    // tables of 6 planes each (64 buckets/table — enough selectivity to
    // prune, enough bucket occupancy to retrieve); candidates share a table
    // bucket. Approximate by construction ⇒ rows-only check; recall vs
    // sim_knn_brute is pinned by a ScalaTest.
    "sim_knn_lsh" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = load(s, dir, "embeddings")
      val sigs = emb.select(col("vec_id"), col("embedding"),
        posexplode(expr(
          """transform(sequence(0, 3), t ->
               aggregate(sequence(0, 5), cast(0 as bigint), (acc, j) ->
                 acc + IF(aggregate(transform(embedding, (x, i) ->
                            cast(x as double)
                              * cast(((t * 6 + j) * 2654435761
                                      + (i + 1) * 2246822519) % 251 % 7 - 3
                                     as double)),
                          cast(0 as double), (a, v) -> a + v) > 0,
                   shiftleft(cast(1 as bigint), j), cast(0 as bigint))))"""))
          .as(Seq("table_id", "bucket")))
      val q = sigs.filter(col("vec_id") < NQueries)
        .toDF("qid", "qe", "table_id", "bucket")
      val c = sigs.toDF("nid", "ne", "table_id", "bucket")
      val cands = c.join(broadcast(q), Seq("table_id", "bucket"))
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("qe"), col("nid"), col("ne")).distinct()
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nid"))
      cands.withColumn("cos", round(expr(cosExpr("qe", "ne")), 6))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("rank"), col("nid"), col("cos"))
        .orderBy(col("qid"), col("rank"))
    })
  )

  // DuckDB-side cosine with the same double math; DuckDB 1.0 lacks indexed
  // list lambdas, so dims are unnested with generate_subscripts and summed —
  // 6-decimal rounding absorbs any accumulation-order difference.
  val oracle: Map[String, String] = Map(
    "sim_knn_brute" ->
      s"""WITH d AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings),
          n AS (
            SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM d GROUP BY vec_id),
          dots AS (
            SELECT q.vec_id AS qid, c.vec_id AS nid, SUM(q.x * c.x) AS dot
            FROM d q JOIN d c ON q.dim = c.dim
            WHERE q.vec_id < $NQueries AND q.vec_id <> c.vec_id
            GROUP BY 1, 2),
          scored AS (
            SELECT qid, nid,
                   ROUND(dot / (nq.nrm * nc.nrm), 6) AS cos
            FROM dots
            JOIN n nq ON nq.vec_id = qid
            JOIN n nc ON nc.vec_id = nid),
          ranked AS (
            SELECT qid, nid, cos,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY cos DESC, nid) AS rank
            FROM scored)
          SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos
          FROM ranked WHERE rank <= $TopK ORDER BY qid, rank""",
    "sim_centroids" ->
      """WITH dd AS (
           SELECT label, generate_subscripts(embedding, 1) AS d,
                  CAST(unnest(embedding) AS DOUBLE) AS x
           FROM embeddings)
         SELECT CAST(label AS BIGINT) AS label, CAST(d AS BIGINT) AS d,
                ROUND(AVG(x), 6) AS centroid
         FROM dd GROUP BY 1, 2 ORDER BY label, d""",
    "sim_lsh_buckets" ->
      """WITH d AS (
           SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                  CAST(unnest(embedding) AS DOUBLE) AS x
           FROM embeddings),
         planes AS (SELECT unnest(range(0, 16)) AS j),
         proj AS (
           SELECT vec_id, j,
                  SUM(x * CAST((j * 2654435761 + dim * 2246822519) % 251 % 7 - 3
                               AS DOUBLE)) AS s
           FROM d CROSS JOIN planes GROUP BY 1, 2)
         SELECT vec_id,
                CAST(SUM(CASE WHEN s > 0 THEN 1 << j ELSE 0 END) AS BIGINT)
                  AS bucket
         FROM proj GROUP BY vec_id ORDER BY vec_id"""
    // sim_knn_lsh: approximate-by-construction — rows-only check; recall
    // pinned by ScalaTest SimilaritySpec.
  )
}
