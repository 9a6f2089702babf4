package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed spherical k-means (Lloyd iterations, cosine similarity) —
  * trains the coarse quantizer the IVF route needs when labels aren't
  * given. Public algorithm (Lloyd 1982 / MacQueen 1967).
  *
  * EXACT-REPLAY ARITHMETIC (round-9 promotion — the coreset playbook of
  * COVERAGE.md applied to the whole trainer): every input coordinate is
  * quantized once to half-up 6dp integer micro-units
  * (`floor(x·1e6 + 0.5)` as long), and from there
  *  - dot products and squared norms are EXACT integer sums — order-free,
  *    so partial aggregation, partition count and engine never matter;
  *  - the only floating-point steps are one mirrored IEEE sequence per
  *    score (`double(dot) / (sqrt(double(Σa²)) · sqrt(double(Σb²)))`,
  *    then half-up 6dp quantization) and one per centroid update
  *    (`floor(double(Σxq)/double(cnt) + 0.5)`) — identical inputs ⇒
  *    bit-identical doubles on any IEEE-754 engine;
  *  - argmaxes tie-break on smallest cell / smallest id.
  * The result: seeding, every Lloyd pass and the final assignment replay
  * bit-exactly in DuckDB SQL (SimilarityQueries.kmeansOracleCtes), which
  * moved sim_kmeans_cells / sim_knn_ivf_trained / sim_pq_codes from
  * rows-only to full oracle rows.
  *
  * Scale shape per iteration (unchanged by the quantization):
  *  - ASSIGN: centroids are a model artifact (k × dim longs — a few KB),
  *    so they ride into the executors as a typed literal and each row
  *    argmax-folds over them (native vec_dotq inside the fold). Zero
  *    joins, zero shuffle, one corpus scan.
  *  - UPDATE: per-(cell, dim) exact integer partial sums — map-side
  *    combine, then an exchange of at most k × dim groups (tiny
  *    regardless of corpus size), re-assembled on the driver.
  *
  * Empty cells keep their previous centroid. Deterministic init:
  * k-means++-style D²-weighted greedy (md5-derived integer race, no RNG)
  * over a bounded id-ordered pool, starting from the smallest id — see
  * fitMany.
  */
object KMeans {

  /** (cell id, centroid in integer micro-units, Σ cq² exact) — the shape
    * SimilarityQueries uses for its IVF literal, so a trained model drops
    * into ivfAssign/ivfProbes.
    */
  type Model = Array[(Long, Seq[Long], Long)]

  /** Half-up 6dp micro-unit quantization of a float/double vector. */
  def quantize(c: Column): Column = call_function("vec_quantize6", c)

  /** Quantized cosine score (6dp half-up integer) between a micro-unit
    * vector column (with its exact squared norm) and a centroid struct
    * from the model literal. Zero-norm inputs score 0 on both engines.
    */
  def scoreQ(xq: Column, sxx: Column, cq: Column, scc: Column): Column =
    when(sxx === 0L || scc === 0L, lit(0L))
      .otherwise(floor(
        call_function("vec_dotq", xq, cq).cast("double") /
          (sqrt(sxx.cast("double")) * sqrt(scc.cast("double"))) *
          lit(1e6) + lit(0.5)))

  /** Driver-side twin of [[scoreQ]] — the same op sequence on longs, used
    * by the seeding loop so pool scores match the distributed ones.
    */
  def scoreQLong(a: Array[Long], sa: Long, b: Array[Long], sb: Long): Long =
    if (sa == 0L || sb == 0L) 0L
    else {
      var d = 0L
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { d += a(i) * b(i); i += 1 }
      math.floor(d.toDouble /
        (math.sqrt(sa.toDouble) * math.sqrt(sb.toDouble)) * 1e6 + 0.5).toLong
    }

  /** Per-row nearest-centroid assignment as an argmax fold over the
    * centroid literal; adds long column `out`. Ties keep the lowest-cell
    * centroid (strict `>` over the cell-ascending model). `vecCol` is the
    * RAW float/double vector — quantization happens inside, so callers
    * never hold two representations.
    */
  def assign(df: DataFrame, vecCol: String, model: Model,
      out: String = "cell"): DataFrame = {
    require(model.nonEmpty, "model has no centroids")
    require(!df.columns.contains(out), s"output column '$out' already exists")
    val tmpQ = s"__${out}_xq"
    val tmpS = s"__${out}_sxx"
    assignQ(
      df.withColumn(tmpQ, quantize(col(vecCol)))
        .withColumn(tmpS, call_function("vec_dotq", col(tmpQ), col(tmpQ))),
      tmpQ, tmpS, model, out)
      .drop(tmpQ, tmpS)
  }

  /** Assignment over an ALREADY-quantized vector column + its exact
    * squared norm (the internal hot path — Lloyd passes quantize once).
    */
  def assignQ(df: DataFrame, xqCol: String, sxxCol: String, model: Model,
      out: String): DataFrame = {
    val cents = typedlit(model.toSeq)
    def sq(c: Column): Column =
      scoreQ(col(xqCol), col(sxxCol), c.getField("_2"), c.getField("_3"))
    df.withColumn(out, aggregate(cents,
      struct(lit(-1L).as("cell"), lit(Long.MinValue).as("best")),
      (acc, c) => when(sq(c) > acc.getField("best"),
        struct(c.getField("_1").as("cell"), sq(c).as("best")))
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

  /** md5-derived integer race for the D²-weighted seeding draw: the first
    * 5 hex chars of md5(id) as a long, plus 1 (∈ [1, 2²⁰]) — replayed in
    * DuckDB as `CAST(('0x' || substr(md5(id), 1, 5)) AS BIGINT) + 1`.
    */
  def seedRace(id: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8"))
      .take(3).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 5), 16) + 1L
  }

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
    *    oracle replays, which run unsampled) are unchanged.
    *  - The (sampled) training frame is persisted for the duration of the
    *    fit, so the corpus parquet is scanned at most twice (row count +
    *    cache build); every Lloyd pass reads the in-memory sample.
    *  - Each iteration assigns ALL S sub-vectors in one pass (S argmax
    *    folds over integer micro-units), then exchanges at most
    *    S × k × dim per-(sub, cell, dim) exact integer partial sums —
    *    tiny regardless of corpus size.
    *
    * Seeding (Arthur & Vassilvitskii 2007, determinized): over a bounded
    * id-ordered pool (≤ max(32k, 1024) rows, one collect), the first seed
    * is the smallest id; each next seed maximizes
    * `double(dq²) / double(race)` where dq = min quantized cosine
    * distance (micro-units) to the chosen set and race is the md5 integer
    * ([[seedRace]]) — a D²-weighted draw that separates clusters without
    * farthest-point's outlier bias, with every comparison either exact
    * integer or one shared IEEE division, so the whole traversal replays
    * in SQL. Incremental minD refresh keeps it O(k · pool · dim).
    */
  def fitMany(emb: DataFrame, idCol: String, subVecs: Seq[Column], k: Int,
      iters: Int, maxTrainRows: Long = 100000L): Seq[Model] = {
    require(subVecs.nonEmpty, "need at least one sub-vector expression")
    require(k > 0, "k must be positive")
    require(iters >= 0, "iters must be non-negative")
    require(maxTrainRows >= k, "maxTrainRows must be at least k")
    val S = subVecs.length
    val full = emb.select(col(idCol).as("__id") +:
      subVecs.zipWithIndex.map { case (c, i) => quantize(c).as(s"__v$i") }: _*)
    val n = full.count()
    val sampled = if (n <= maxTrainRows) full else {
      val thresh = (BigDecimal(maxTrainRows) * BigDecimal(1L << 32) /
        BigDecimal(n)).toLong
      full.filter(conv(substring(md5(col("__id").cast("string")), 1, 8),
        16, 10).cast("long") < thresh)
    }
    val base = sampled.persist()

    try {
      val poolCap = math.max(k * 32, 1024)
      // orderBy + limit + collect is TakeOrdered: rows arrive id-ascending
      val pool = base.orderBy(col("__id")).limit(poolCap).collect()
      require(pool.length >= k,
        s"need at least $k rows to seed $k centroids, got ${pool.length}")
      val race: Array[Long] = pool.map(r => seedRace(r.get(0).toString))

      def seedsFor(s: Int): Model = {
        val vecs: Array[Array[Long]] =
          pool.map(_.getSeq[Long](s + 1).toArray)
        val sxx: Array[Long] = vecs.map(v => {
          var t = 0L; var i = 0
          while (i < v.length) { t += v(i) * v(i); i += 1 }
          t
        })
        def dq(a: Int, b: Int): Long =
          1000000L - scoreQLong(vecs(a), sxx(a), vecs(b), sxx(b))
        val chosen = scala.collection.mutable.ArrayBuffer(0)
        val taken = new Array[Boolean](vecs.length)
        taken(0) = true
        val minDq = Array.tabulate(vecs.length)(i => dq(i, 0))
        while (chosen.length < k) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < vecs.length) {
            if (!taken(i)) {
              val score = (minDq(i) * minDq(i)).toDouble / race(i).toDouble
              if (score > bestScore) { bestScore = score; best = i }
            }
            i += 1
          }
          chosen += best
          taken(best) = true
          var j = 0
          while (j < vecs.length) {
            if (!taken(j)) {
              val d = dq(j, best)
              if (d < minDq(j)) minDq(j) = d
            }
            j += 1
          }
        }
        chosen.zipWithIndex
          .map { case (p, cell) => (cell.toLong, vecs(p).toSeq, sxx(p)) }
          .toArray
      }
      var models: Array[Model] = Array.tabulate(S)(seedsFor)

      (1 to iters).foreach { _ =>
        val assigned = models.zipWithIndex.foldLeft {
          (0 until S).foldLeft(base: DataFrame) { (df, s) =>
            df.withColumn(s"__s$s",
              call_function("vec_dotq", col(s"__v$s"), col(s"__v$s")))
          }
        } { case (df, (m, s)) =>
          assignQ(df, s"__v$s", s"__s$s", m, s"__c$s")
        }
        val subRows = array((0 until S).map(s => struct(
          lit(s).as("s"), col(s"__c$s").as("cell"),
          col(s"__v$s").as("v"))): _*)
        val updated = assigned.select(explode(subRows).as("e"))
          .select(col("e.s").as("s"), col("e.cell").as("cell"),
            posexplode(col("e.v")).as(Seq("p", "x")))
          .groupBy(col("s"), col("cell"), col("p"))
          .agg(sum(col("x")).as("xs"), count(lit(1)).as("cnt"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getLong(1)))
          .map { case (key, rows) =>
            key -> rows.sortBy(_.getInt(2)).map { r =>
              math.floor(r.getLong(3).toDouble / r.getLong(4).toDouble
                + 0.5).toLong
            }.toSeq
          }
        models = models.zipWithIndex.map { case (m, s) =>
          m.map { case (cell, old, oldScc) =>
            updated.get((s, cell)) match {
              case Some(cq) =>
                var t = 0L; var i = 0
                while (i < cq.length) { t += cq(i) * cq(i); i += 1 }
                (cell, cq, t)
              case None => (cell, old, oldScc)
            }
          }
        }
      }
      models.toSeq
    } finally base.unpersist(blocking = false)
  }
}
