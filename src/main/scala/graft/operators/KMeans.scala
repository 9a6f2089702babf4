package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed spherical k-means (Lloyd iterations, cosine similarity) —
  * trains the coarse quantizer the IVF route needs when labels aren't
  * given. Public algorithm (Lloyd 1982 / MacQueen 1967).
  *
  * Scale shape per iteration:
  *  - ASSIGN: centroids are a model artifact (k × dim doubles — a few KB),
  *    so they ride into the executors as a typed literal and each row
  *    argmax-folds over them inside whole-stage codegen. Zero joins, zero
  *    shuffle, one corpus scan (the same no-Exchange shape PlanSpec pins
  *    for the IVF assignment; a cross join + window here would shuffle a
  *    k×-expanded corpus).
  *  - UPDATE: per-(cell, dim) partial averages — map-side combine, then an
  *    exchange of at most k × dim groups (tiny regardless of corpus size),
  *    re-assembled to k centroid arrays on the driver.
  *
  * So an iteration's cost is one scan + one k×dim-group aggregation; the
  * driver holds only the model. Empty cells keep their previous centroid.
  * Deterministic init: the k vectors with the smallest ids (TakeOrdered).
  * Float-reduction order in the averages is engine/partitioning-specific —
  * results are pinned by property (cluster recovery, objective
  * improvement), not bit-compare.
  */
object KMeans {

  /** (cell id, centroid, L2 norm) — same shape SimilarityQueries uses for
    * its IVF literal, so a trained model drops into ivfAssign/ivfProbes.
    */
  type Model = Array[(Long, Seq[Double], Double)]

  /** Per-row nearest-centroid assignment as a codegen'd argmax fold over
    * the centroid literal; adds long column `out`. Ties keep the
    * lowest-cell centroid (strict `>` over the cell-ascending model).
    */
  def assign(df: DataFrame, vecCol: String, model: Model,
      out: String = "cell"): DataFrame = {
    require(model.nonEmpty, "model has no centroids")
    require(!df.columns.contains(out), s"output column '$out' already exists")
    val cents = typedlit(model.toSeq)
    def cos(c: Column): Column =
      call_function("vec_cos", col(vecCol), c.getField("_2"))
    df.withColumn(out, aggregate(cents,
      struct(lit(-1L).as("cell"), lit(Double.NegativeInfinity).as("best")),
      (acc, c) => when(cos(c) > acc.getField("best"),
        struct(c.getField("_1").as("cell"), cos(c).as("best")))
        .otherwise(acc),
      acc => acc.getField("cell")))
  }

  /** Train k centroids with `iters` Lloyd iterations over `vecCol`
    * (array of float or double); `idCol` orders the deterministic seeds.
    */
  def fit(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): Model = {
    require(k > 0, "k must be positive")
    require(iters >= 0, "iters must be non-negative")
    val base = emb.select(col(idCol).as("__id"), col(vecCol))

    def toDoubles(v: Seq[Any]): Seq[Double] = v.map {
      case f: Float => f.toDouble
      case d: Double => d
      case x => throw new IllegalArgumentException(
        s"$vecCol must be an array of float/double, got element $x")
    }
    def withNorm(cell: Long, ce: Seq[Double]): (Long, Seq[Double], Double) =
      (cell, ce, math.sqrt(ce.map(x => x * x).sum))

    var model: Model = base.orderBy(col("__id")).limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => withNorm(i.toLong, toDoubles(r.getSeq[Any](1))) }
    require(model.length == k,
      s"need at least $k rows to seed $k centroids, got ${model.length}")

    (1 to iters).foreach { _ =>
      val updated = assign(base, vecCol, model)
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("p", "x")))
        .groupBy(col("cell"), col("p"))
        .agg(avg(col("x").cast("double")).as("c"))
        .groupBy(col("cell"))
        .agg(expr("transform(sort_array(collect_list(struct(p, c))), e -> e.c)")
          .as("ce"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      model = model.map { case (cell, old, _) =>
        withNorm(cell, updated.getOrElse(cell, old))
      }
    }
    model
  }
}
