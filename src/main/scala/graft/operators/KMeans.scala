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
  * Deterministic init: k-means++-style D²-weighted greedy (md5-derived
  * race, no RNG) over a bounded id-ordered pool, starting from the
  * smallest id — see fitMany.
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
    * See [[fitMany]] for the training-cost shape.
    *
    * SAMPLING CUTOVER: above `maxTrainRows` (default 100k) the model
    * trains on a deterministic md5-prefix sample of the input, not the
    * full corpus — on corpora over the cap, centroids are a
    * sample-derived artifact (KMeansSpec pins the sampled path). Pass
    * `maxTrainRows = Long.MaxValue` to force full-input training.
    */
  def fit(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, maxTrainRows: Long = 100000L): Model =
    fitMany(emb, idCol, Seq(col(vecCol)), k, iters, maxTrainRows).head

  /** Train one k-centroid codebook PER sub-vector expression, all in the
    * same Lloyd passes — the product-quantization shape (Jégou et al.
    * 2011), where S sub-quantizers would otherwise each scan the corpus
    * `iters` times.
    *
    * Training-cost shape (this is the part that must survive 100 TB):
    *  - The input is capped at `maxTrainRows`: centroids are a model
    *    artifact, learned from a bounded sample, never from every row.
    *    The cap uses the repo's deterministic md5-prefix predicate (no
    *    RNG, no shuffle, reproducible across runs/partitionings): keep
    *    rows whose 32-bit md5(id) prefix falls under cap/n. Below the
    *    cap the corpus trains unsampled, so small-SF results (and the
    *    recall/property pins) are unchanged.
    *  - The (sampled) training frame is persisted for the duration of the
    *    fit, so the corpus parquet is scanned at most twice (row count +
    *    cache build); every Lloyd pass reads the in-memory sample.
    *  - Each iteration assigns ALL S sub-vectors in one pass (S argmax
    *    folds inside the same whole-stage codegen), then exchanges at most
    *    S × k × dim per-(sub, cell, dim) partial averages — tiny
    *    regardless of corpus size.
    */
  def fitMany(emb: DataFrame, idCol: String, subVecs: Seq[Column], k: Int,
      iters: Int, maxTrainRows: Long = 100000L): Seq[Model] = {
    require(subVecs.nonEmpty, "need at least one sub-vector expression")
    require(k > 0, "k must be positive")
    require(iters >= 0, "iters must be non-negative")
    require(maxTrainRows >= k, "maxTrainRows must be at least k")
    val S = subVecs.length
    val full = emb.select(col(idCol).as("__id") +:
      subVecs.zipWithIndex.map { case (c, i) => c.as(s"__v$i") }: _*)
    val n = full.count()
    val sampled = if (n <= maxTrainRows) full else {
      val thresh = (BigDecimal(maxTrainRows) * BigDecimal(1L << 32) /
        BigDecimal(n)).toLong
      full.filter(conv(substring(md5(col("__id").cast("string")), 1, 8),
        16, 10).cast("long") < thresh)
    }
    val base = sampled.persist()

    def toDoubles(v: Seq[Any]): Seq[Double] = v.map {
      case f: Float => f.toDouble
      case d: Double => d
      case x => throw new IllegalArgumentException(
        s"sub-vectors must be arrays of float/double, got element $x")
    }
    def withNorm(cell: Long, ce: Seq[Double]): (Long, Seq[Double], Double) =
      (cell, ce, math.sqrt(ce.map(x => x * x).sum))

    try {
      // Deterministic k-means++-style seeding (Arthur & Vassilvitskii
      // 2007) over a BOUNDED driver-side pool: the first k ids of a
      // sample can all fall in one true cluster (Lloyd then strands a
      // duplicate centroid on an empty cell), so weight each candidate by
      // its squared cosine distance to the nearest chosen seed. The
      // "random" draw is an md5-derived exponential race (Efraimidis &
      // Spirakis 2006): score = D² / -ln(u_md5(id)), pick the max —
      // reproducible across runs, partitionings and engines. Pure
      // farthest-point would seed outliers (measurably worse PQ/ADC
      // quantization); D²-weighting separates clusters without that bias.
      // The pool is a model-sized artifact (≤ max(32k, 1024) rows), one
      // collect, zero extra Spark jobs.
      val poolCap = math.max(k * 32, 1024)
      val pool = base.orderBy(col("__id")).limit(poolCap).collect()
      require(pool.length >= k,
        s"need at least $k rows to seed $k centroids, got ${pool.length}")
      val race = pool.map { r =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(r.get(0).toString.getBytes("UTF-8"))
          .take(7).map(b => f"${b & 0xff}%02x").mkString
        val u = (java.lang.Long.parseLong(hex, 16) >>> 4).toDouble / (1L << 52)
        -math.log(math.max(u, 1e-300)) // Exp(1) variate, always > 0
      }
      def seedsFor(s: Int): Model = {
        val vecs = pool.map(r => toDoubles(r.getSeq[Any](s + 1)).toArray)
        val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
        def cos(a: Int, b: Int): Double = {
          val nn = norms(a) * norms(b)
          if (nn == 0d) 0d
          else {
            var d = 0d; var i = 0
            while (i < vecs(a).length) { d += vecs(a)(i) * vecs(b)(i); i += 1 }
            d / nn
          }
        }
        // Incremental k-means++: cache each candidate's min distance to
        // the chosen set and refresh it against only the NEWEST seed —
        // O(k · pool · dim), not O(k² · pool · dim) (a k=1024 codebook
        // would otherwise burn minutes of single-threaded driver CPU
        // before the first Lloyd pass).
        val chosen = scala.collection.mutable.ArrayBuffer(0)
        val taken = new Array[Boolean](vecs.length)
        taken(0) = true
        val minD = Array.tabulate(vecs.length)(i => 1d - cos(i, 0))
        while (chosen.length < k) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < vecs.length) {
            if (!taken(i)) {
              val score = minD(i) * minD(i) / race(i)
              if (score > bestScore) { bestScore = score; best = i }
            }
            i += 1
          }
          chosen += best
          taken(best) = true
          var j = 0
          while (j < vecs.length) {
            if (!taken(j)) {
              val d = 1d - cos(j, best)
              if (d < minD(j)) minD(j) = d
            }
            j += 1
          }
        }
        chosen.zipWithIndex
          .map { case (p, i) => withNorm(i.toLong, vecs(p).toSeq) }.toArray
      }
      var models: Array[Model] = Array.tabulate(S)(seedsFor)

      (1 to iters).foreach { _ =>
        val assigned = models.zipWithIndex.foldLeft(base: DataFrame) {
          case (df, (m, s)) => assign(df, s"__v$s", m, out = s"__c$s")
        }
        val subRows = array((0 until S).map(s => struct(
          lit(s).as("s"), col(s"__c$s").as("cell"),
          col(s"__v$s").cast("array<double>").as("v"))): _*)
        val updated = assigned.select(explode(subRows).as("e"))
          .select(col("e.s").as("s"), col("e.cell").as("cell"),
            posexplode(col("e.v")).as(Seq("p", "x")))
          .groupBy(col("s"), col("cell"), col("p"))
          .agg(avg(col("x")).as("c"))
          .groupBy(col("s"), col("cell"))
          .agg(expr("transform(sort_array(collect_list(struct(p, c))), e -> e.c)")
            .as("ce"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
        models = models.zipWithIndex.map { case (m, s) =>
          m.map { case (cell, old, _) =>
            withNorm(cell, updated.getOrElse((s, cell), old))
          }
        }
      }
      models.toSeq
    } finally base.unpersist(blocking = false)
  }
}
