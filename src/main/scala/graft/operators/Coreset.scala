package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diverse-subset selection over an embedding corpus: greedy farthest-point
  * traversal (Gonzalez 1985's 2-approximation for k-center — public
  * algorithm), the standard coreset/diversity picker a training-data
  * pipeline uses to choose a small representative subset (the complement of
  * SemDeDup's "drop the redundant": keep the spread).
  *
  * Scale design (100 TB): k passes over the corpus, each a per-row fold
  * against the selected-so-far literal (zero joins, zero shuffles — the same
  * typedlit-fold shape as SimilarityQueries.ivfAssign) followed by a
  * per-partition top-1 + driver merge (TakeOrdered, never a global sort).
  * Driver state is the k selected vectors — a model artifact (k × dim
  * doubles, ≤8 KB at k=16/dim=64), one of the bounded bookkeeping collects
  * documented in SCALING.md, not a data-sized collect.
  */
object Coreset {

  /** Greedy farthest-point selection of `k` rows. Returns (rank, vec_id,
    * sep_dist): rank is selection order (1-based), sep_dist the cosine
    * distance (1 − cos) from the picked row to its nearest
    * previously-selected row — the non-increasing separation sequence;
    * null for the seed, 6dp-quantized. Seed = smallest id; every argmax
    * ranks candidates by the 6dp-QUANTIZED separation (half-up,
    * floor(d·1e6 + 0.5) — the repo's cross-engine rounding) with ties
    * broken on smallest id, so the result is fully deterministic AND
    * robust to float summation-order differences between engines: a
    * full-precision argmax could flip picks on ~1e-15 near-ties, which
    * is what kept this operator rows-only before the oracle replay.
    */
  def farthestPoint(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val spark = emb.sparkSession
    val corpus = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"))

    val seed = corpus.orderBy(col("id")).limit(1).collect()
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Option[Double])] // (rank, id, sep_dist)
    val vecs = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    seed.foreach { r =>
      picked += ((1L, r.getLong(0), None))
      vecs += r.getSeq[Float](1).map(_.toDouble)
    }

    var step = 2
    while (step <= k && picked.size == step - 1) {
      val sel = typedlit(vecs.toSeq)
      val ids = picked.map(_._2).toSeq
      val next = corpus
        .filter(!col("id").isInCollection(ids))
        .withColumn("d", array_min(transform(sel,
          c => lit(1.0) - call_function("vec_cos", col("v"), c))))
        .withColumn("dq",
          floor(col("d") * lit(1e6) + lit(0.5)).cast("long"))
        .orderBy(col("dq").desc, col("id"))
        .limit(1)
        .collect()
      next.foreach { r =>
        picked += ((step.toLong, r.getLong(0),
          Some(r.getLong(3) / 1e6)))
        vecs += r.getSeq[Float](1).map(_.toDouble)
        step += 1
      }
      if (next.isEmpty) step = k + 1 // corpus exhausted
    }

    import spark.implicits._
    picked.toSeq.toDF("rank", "vec_id", "sep_dist")
      .orderBy(col("rank"))
  }
}
