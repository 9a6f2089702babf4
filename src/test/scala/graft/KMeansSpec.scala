package graft

import scala.util.Random

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._
import graft.operators.KMeans

/** KMeans: recovers well-separated clusters, improves the spherical
  * objective on real embeddings, and keeps the assignment stage free of
  * exchanges and joins (the model-as-literal contract).
  */
class KMeansSpec extends SparkSuite {
  import spark.implicits._

  /** Three well-separated direction clusters in 8-dim, interleaved by
    * i % 3. Only id 0 is a guaranteed seed (the D²-weighted init picks
    * the rest) — on this geometry the weighting selects the other two
    * clusters with overwhelming odds, and the recovery test pins it.
    */
  private def clustered = {
    val rnd = new Random(11)
    val dirs = Seq(
      Array(1.0, 0, 0, 0, 1, 0, 0, 0),
      Array(0.0, 1, 0, 0, 0, 1, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0, 1, 0))
    (0 until 90).map { i =>
      val d = dirs(i % 3)
      (i.toLong, d.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("fit + assign recover well-separated clusters exactly") {
    val model = KMeans.fit(clustered, "vec_id", "embedding", k = 3, iters = 3)
    val got = KMeans.assign(clustered, "embedding", model)
      .select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // every member of ground-truth cluster (i % 3) lands in the same cell,
    // and distinct ground-truth clusters land in distinct cells
    val byTruth = got.groupBy(_._1 % 3).map { case (t, xs) =>
      t -> xs.map(_._2).distinct
    }
    assert(byTruth.values.forall(_.size == 1), s"split cluster: $byTruth")
    assert(byTruth.values.flatten.toSet.size == 3, s"merged clusters: $byTruth")
  }

  /** Mean best quantized cosine (micro-units) of every row to its nearest
    * centroid — the spherical objective on the engine's exact lattice.
    */
  private def meanCos(emb: org.apache.spark.sql.DataFrame,
      model: KMeans.Model): Double = {
    val cents = typedlit(model.toSeq)
    emb.select(KMeans.quantize(col("embedding")).as("xq"))
      .withColumn("sxx", call_function("vec_dotq", col("xq"), col("xq")))
      .select(aggregate(cents, lit(Long.MinValue),
        (acc, c) => greatest(acc, KMeans.scoreQ(col("xq"), col("sxx"),
          c.getField("_2"), c.getField("_3"))))
        .cast("double").as("best"))
      .agg(avg($"best")).head().getDouble(0)
  }

  test("iterations do not worsen the spherical objective on real embeddings") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val init = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 0)
    val trained = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    // 100 micro-units of slack: quantized centroids can nick Lloyd's
    // exact-arithmetic monotonicity by ~the lattice step
    assert(meanCos(emb, trained) >= meanCos(emb, init) - 100,
      "training worsened the objective")
  }

  test("assignment plan: no Exchange, no join (model rides as a literal)") {
    val model = KMeans.fit(clustered, "vec_id", "embedding", k = 3, iters = 1)
    val nodes = physicalNodes(KMeans.assign(clustered, "embedding", model))
    assert(nodes.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      "assignment must not shuffle")
    assert(nodes.collect { case j: BaseJoinExec => j }.isEmpty,
      "assignment must not join")
  }

  test("trainer input is sample-bounded: capped fit still fits the corpus") {
    // 90 rows, cap 30 → the md5-prefix sample engages (expected ~30 rows).
    // Seeds now come from the sample (not necessarily one per ground-truth
    // cluster), so pin the property that matters: the bounded-sample model,
    // assigned over the FULL corpus, keeps a high spherical objective —
    // a merged/degenerate model scores ~0.67 on this geometry, a fitted
    // one ~0.99.
    val model = KMeans.fit(clustered, "vec_id", "embedding", k = 3,
      iters = 3, maxTrainRows = 30L)
    assert(model.length == 3)
    val meanBest = meanCos(clustered, model)
    assert(meanBest > 900000, // 0.9 in micro-units
      s"sample-trained model fits the full corpus poorly: $meanBest")
  }

  test("fitMany trains all sub-codebooks in shared passes, same shapes") {
    val slices = Seq(expr("slice(embedding, 1, 4)"),
      expr("slice(embedding, 5, 4)"))
    val models = KMeans.fitMany(clustered, "vec_id", slices, k = 3, iters = 2)
    assert(models.length == 2)
    assert(models.forall(m => m.length == 3 && m.forall(_._2.length == 4)))
    // sub-model 0 must equal a standalone fit on the same slice: fitMany
    // is a fusion of independent fits, not a different algorithm
    val solo = KMeans.fit(
      clustered.select($"vec_id", expr("slice(embedding, 1, 4)").as("sv")),
      "vec_id", "sv", k = 3, iters = 2)
    // exact integer model: fusion must be bit-identical to the solo fit
    models.head.zip(solo).foreach { case ((c1, v1, n1), (c2, v2, n2)) =>
      assert(c1 == c2)
      assert(v1 == v2)
      assert(n1 == n2)
    }
  }

  test("guards: k too large, empty model, existing output column") {
    val d = Seq((1L, Seq(1.0f, 0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      KMeans.fit(d, "vec_id", "embedding", k = 5, iters = 1)
    }
    intercept[IllegalArgumentException] {
      KMeans.assign(d, "embedding", Array.empty)
    }
    val m = KMeans.fit(d, "vec_id", "embedding", k = 1, iters = 0)
    intercept[IllegalArgumentException] {
      KMeans.assign(d.withColumn("cell", lit(1L)), "embedding", m)
    }
  }
}
