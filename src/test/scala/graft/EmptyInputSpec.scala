package graft

import java.nio.file.Files

/** Graceful degradation on EMPTY inputs — at 100 TB, empty partitions,
  * empty dates and freshly-created tables are routine, and an operator
  * that throws on zero rows takes the whole pipeline run down with it.
  *
  * Every registered query must either complete on zero-row tables (empty
  * or empty-aggregate output both fine) or be on the documented
  * requires-data list (quantizer training needs k seed vectors — those
  * fail LOUDLY with the precondition message, never with an opaque
  * executor error).
  */
class EmptyInputSpec extends SparkSuite {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft-empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(sf("sf0.001") + s"/$t.parquet")
        .limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** Trainers need >= k seed rows; their documented contract on an empty
    * corpus is the loud IllegalArgumentException from the seeding
    * precondition (never a partial model or an opaque executor error).
    */
  private val requiresData = Set(
    "sim_kmeans_cells", "sim_knn_ivf_trained", "sim_pq_codes")

  test("every registered query handles zero-row tables: empty output or " +
      "the documented loud trainer precondition") {
    val opaque = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, emptyDir).count()
        assert(!requiresData.contains(name),
          s"$name is on the requires-data list but completed ($n rows)")
      } catch {
        case e: IllegalArgumentException if requiresData.contains(name) =>
          assert(e.getMessage.contains("seed"),
            s"$name failed without the seeding message: ${e.getMessage}")
        case e: Throwable =>
          opaque += s"$name: ${e.toString.take(120)}"
      }
    }
    assert(opaque.isEmpty,
      s"queries with opaque empty-input failures:\n${opaque.mkString("\n")}")
  }
}
