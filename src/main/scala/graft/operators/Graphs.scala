package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components — the pairs → clusters step of a dedup
  * pipeline. Near-dup candidate generation (DedupQueries) emits PAIRS; to
  * actually deduplicate a corpus you need the transitive closure: if A≈B
  * and B≈C, then {A,B,C} is one duplicate cluster with one survivor. The
  * reference has no analog (its pipeline is per-event); this is part of the
  * training-data extension family.
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
  * Beyond", SoCC 2014; public algorithm). Each round is two key-partitioned
  * aggregations over the edge list; converges in O(log² n) rounds to a star
  * graph where every node points at its component's minimum id. Versus the
  * naive min-label propagation (O(diameter) rounds — a 1M-doc duplicate
  * chain needs 1M rounds), this is the form that survives 100 TB.
  *
  * Scale notes:
  *  - No per-node neighbor lists are ever collected (`collect_list` on a
  *    high-degree node — e.g. one boilerplate doc duplicated 10M times —
  *    would materialize a 10M-element array in one task). The per-node min
  *    is a window aggregate: one Exchange on the node id + an in-partition
  *    sort, the same bound as any keyed aggregation.
  *  - Each iteration ends in `distinct()` (bounds the edge set: large-star
  *    can only shrink-or-keep |E| after dedup) and `localCheckpoint` (cuts
  *    the O(iterations)-deep lineage — without it the final plan re-derives
  *    every round; on a multi-node cluster use `spark.sparkContext
  *    .setCheckpointDir` + reliable `checkpoint()` instead).
  *  - Convergence is detected from an order-independent edge-set signature
  *    (count + bit_xor of xxhash64) — one tiny action per round, no
  *    edge-set except/join.
  */
object ConnectedComponents {

  /** Connected components of the undirected graph given as an edge list.
    *
    * @param edges  one row per edge; self-loops and duplicate/reversed
    *               edges are fine (normalized away)
    * @param src    long-typed (or castable) source-node column name
    * @param dst    long-typed (or castable) destination-node column name
    * @param maxIter safety bound on rounds; the algorithm needs
    *                O(log² n) — 30 covers any realistic corpus
    * @param driverBound adaptive cutover: a DEDUPED edge set at or below
    *               this size is solved by driver-side union-find in one
    *               collect (an AQE-style runtime choice — the edge count
    *               is already on hand from the first convergence
    *               signature, so the check is free). Near-dup pair sets
    *               are usually tiny relative to the corpus; paying
    *               O(log² n) distributed rounds of per-round jobs for a
    *               few thousand edges is pure overhead. Above the bound,
    *               the large-star/small-star alternation runs unchanged —
    *               the driver never sees an edge list it can't hold
    *               (~1M edges ≈ tens of MB).
    * @return (node, component) — one row per distinct node appearing in
    *         `edges`, component = the minimum node id of its component.
    *         Nodes absent from `edges` (singletons) are the caller's to
    *         re-attach.
    */
  def run(edges: DataFrame, src: String, dst: String, maxIter: Int = 30,
      driverBound: Long = 1L << 20): DataFrame = {
    // Materialize the normalized input once: round 1 references `e` three
    // times (both large-star directions + the signature) — without this,
    // an expensive upstream (e.g. the Jaccard pair pipeline) re-executes
    // per reference. Round 15: temp-parquet materialize instead of
    // localCheckpoint — localCheckpoint compiles its one evaluation via
    // df.rdd WITHOUT AQE (the round-14 measurement), so the expensive
    // upstream lost its runtime broadcast-join conversions exactly where
    // it is evaluated. The in-loop round checkpoints below stay local:
    // their inputs are already-materialized edge RDDs with no joins to
    // re-plan, so the no-AQE path gives up nothing there and they avoid
    // a per-round parquet round-trip.
    var e = graft.queries.DedupQueries.materialize(edges.sparkSession,
      edges
        .select(col(src).cast("long").as("src"),
          col(dst).cast("long").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct())

    var sig = signature(e)
    if (sig._1 <= driverBound) return unionFind(e)
    var it = 0
    var converged = sig._1 == 0L // empty graph is already converged
    while (!converged && it < maxIter) {
      // Lazy checkpoint: the signature action right below materializes it,
      // so each round is ONE job (an eager checkpoint would run a second).
      val next = smallStar(largeStar(e)).distinct().localCheckpoint(false)
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      e = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — " +
          "raise maxIter (needs O(log² n) rounds)")

    // Converged star: every edge is (node → component-min). Roots appear
    // only on the dst side — union them in as their own component.
    e.select(col("src").as("node"), col("dst").as("component"))
      .union(e.select(col("dst").as("node"), col("dst").as("component")))
      .distinct()
  }

  /** Small-graph fast path: classic union-find with path compression,
    * roots kept at the component MINIMUM so the result is identical to
    * the converged star graph of the distributed path. Input is the
    * already-normalized, already-bounded edge set.
    */
  private def unionFind(e: DataFrame): DataFrame = {
    val sp = e.sparkSession
    import sp.implicits._
    val pairs = e.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = parent.getOrElseUpdate(x, x)
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // attach the larger root under the smaller
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keys.toSeq.sorted
      .map(n => (n, find(n))).toDF("node", "component")
  }

  /** Large-star: connect every neighbor larger than `u` to the minimum of
    * `u`'s neighborhood (including `u`). Operates on the symmetric closure.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val w = Window.partitionBy("src")
    nbrs
      .withColumn("m", least(col("src"), min(col("dst")).over(w)))
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
  }

  /** Small-star: orient each edge (larger → smaller), then connect every
    * smaller neighbor — and `u` itself — to the minimum smaller neighbor.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(
      greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
    val w = Window.partitionBy("u")
    // Single pass: emit both (v→m) and (u→m) via explode — a union of two
    // selects over the window output would run the window (and its sort)
    // twice, once per branch.
    oriented.withColumn("m", min(col("v")).over(w))
      .select(explode(array(
        struct(col("v").as("src"), col("m").as("dst")),
        struct(col("u").as("src"), col("m").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** Order-independent edge-set signature: (row count, XOR of per-edge
    * 64-bit hashes). XOR instead of SUM — ANSI mode would throw on long
    * overflow, and XOR is order- and partitioning-independent.
    */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L)).as("x"))
      .head()
    (r.getLong(0), r.getLong(1))
  }
}
