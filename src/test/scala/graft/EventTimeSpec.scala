package graft

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.operators.EventsCdc

/** Pins EventsCdc.normalizeTs: the driver's testdata has shipped
  * `events.ts` as TIMESTAMP(NANOS) (read as BIGINT nanos under the
  * legacy nanosAsLong flag) AND as TIMESTAMP(MICROS) (read as
  * TIMESTAMP_NTZ) across regenerations. Round 7's artifacts broke when a
  * regeneration flipped the type — every representation must normalize
  * to the same canonical TimestampType instant, so event-time queries
  * survive the next flip too.
  */
class EventTimeSpec extends SparkSuite {
  import spark.implicits._

  // 2024-03-01 12:34:56.789012 UTC, in micros since epoch
  private val micros = 1709296496789012L

  test("long nanos, TIMESTAMP_NTZ and TIMESTAMP all normalize to the " +
      "same canonical TimestampType instant") {
    val fromNanos = EventsCdc.normalizeTs(
      Seq((1L, micros * 1000L)).toDF("event_id", "ts"))
    val fromNtz = EventsCdc.normalizeTs(
      Seq((1L, LocalDateTime.parse("2024-03-01T12:34:56.789012")))
        .toDF("event_id", "ts"))
    val fromTs = EventsCdc.normalizeTs(
      Seq((1L, new Timestamp(micros / 1000)))
        .toDF("event_id", "ts"))

    for (df <- Seq(fromNanos, fromNtz, fromTs))
      assert(df.schema("ts").dataType == TimestampType, df.schema.treeString)

    val Seq(a, b) = Seq(fromNanos, fromNtz)
      .map(_.select(unix_micros($"ts")).as[Long].head())
    assert(a == micros && b == micros)
    // java.sql.Timestamp carries millis only — compare at millis
    assert(fromTs.select(unix_micros($"ts")).as[Long].head()
      == micros / 1000 * 1000)
  }

  test("a frame without ts (or with ts already canonical) passes " +
      "through structurally unchanged") {
    val noTs = Seq((1L, "x")).toDF("event_id", "props")
    assert(EventsCdc.normalizeTs(noTs).schema == noTs.schema)
    val canonical = Seq((1L, new Timestamp(0L))).toDF("event_id", "ts")
    assert(EventsCdc.normalizeTs(canonical) eq canonical)
  }

  test("toEnvelopes accepts both generations and emits identical " +
      "clusterTime micros") {
    val nanosGen = Seq((7L, micros * 1000L, "click", "{}"))
      .toDF("event_id", "ts", "event_type", "props")
    val microsGen = Seq((7L, LocalDateTime.parse("2024-03-01T12:34:56.789012"),
        "click", "{}"))
      .toDF("event_id", "ts", "event_type", "props")
    val Seq(x, y) = Seq(nanosGen, microsGen).map(df =>
      EventsCdc.toEnvelopes(df)
        .select(unix_micros($"clusterTime")).as[Long].head())
    assert(x == micros && y == micros)
  }
}
