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

  /** Three well-separated direction clusters in 8-dim; ids 0..2 are one
    * seed per cluster so the deterministic init starts unambiguous.
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

  test("iterations do not worsen the spherical objective on real embeddings") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    def meanCos(model: KMeans.Model): Double = {
      val cents = typedlit(model.toSeq)
      KMeans.assign(emb, "embedding", model)
        .select(aggregate(cents, lit(Double.NegativeInfinity),
          (acc, c) => greatest(acc,
            call_function("vec_cos", col("embedding"), c.getField("_2"))))
          .as("best"))
        .agg(avg($"best")).head().getDouble(0)
    }
    val init = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 0)
    val trained = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    assert(meanCos(trained) >= meanCos(init) - 1e-9,
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
