package graft

import org.apache.spark.sql.types._

/** Drift guard for the driver-generated testdata: when a regeneration
  * changes a table's shape (round 7→8: `events.ts` flipped from
  * TIMESTAMP(NANOS)-as-long to TIMESTAMP(MICROS)), this spec fails with
  * a message that NAMES the drift, instead of leaving dozens of queries
  * to die on cryptic analysis errors. Types are asserted as accepted
  * SETS where the engine deliberately tolerates more than one
  * generation (see EventsCdc.normalizeTs).
  */
class TestdataSchemaSpec extends SparkSuite {

  // column -> acceptable Spark types as read (before any normalization)
  private val timeLike: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)
  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "events" -> Map(
      "event_id" -> Set(LongType), "ts" -> timeLike,
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Map(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false)),
      "label" -> Set(IntegerType)),
    "lineitem" -> Map(
      "l_orderkey" -> Set(LongType), "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType), "l_discount" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_shipdate" -> timeLike),
    "orders" -> Map(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_totalprice" -> Set(DoubleType), "o_orderdate" -> timeLike),
    "customer" -> Map(
      "c_custkey" -> Set(LongType), "c_mktsegment" -> Set(StringType)))

  expected.foreach { case (table, cols) =>
    test(s"testdata schema: $table has the columns the engine assumes") {
      val schema = spark.read
        .parquet(sf("sf0.001") + s"/$table.parquet").schema
      val drift = cols.flatMap { case (name, ok) =>
        schema.fields.find(_.name == name) match {
          case None => Some(s"$name: MISSING (expected one of $ok)")
          case Some(f) if !ok.contains(f.dataType) =>
            Some(s"$name: ${f.dataType} (engine assumes one of $ok)")
          case _ => None
        }
      }
      assert(drift.isEmpty,
        s"\ntestdata regeneration drifted table '$table':\n  " +
          drift.mkString("\n  ") +
          "\n→ adapt the load boundary (see EventsCdc.normalizeTs for " +
          "the pattern) before trusting any downstream failure.")
    }
  }
}
