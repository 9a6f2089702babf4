package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.model.{ChangeEvent, ChangeEventId, Ns}

/** Watermarked event-time aggregation over the DSv2 change-stream source —
  * the Structured-Streaming extension shape (SURVEY §2.8 notes the
  * reference carries event time but never consults it; the engine makes it
  * first-class: windowed publish-rate metrics with bounded state).
  */
class StreamingWindowSpec extends SparkSuite {
  import spark.implicits._

  private def ev(i: Int, minute: Int): ChangeEvent =
    ChangeEvent(ChangeEventId(f"$i%06d"), "insert", None,
      Some(Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")),
      Some(Ns("db", "c")), Some(s"""{"_id":$i}"""),
      Some(s"""{"_id":$i}"""), None, None)

  test("windowed publish-rate with watermark: per-5-minute counts, " +
      "append mode emits watermark-closed windows") {
    val root = Files.createTempDirectory("graft-win").toString
    val in = s"$root/in"
    // max event time 10:25 ⇒ final watermark 10:15 ⇒ the three 5-minute
    // windows from 10:00 are closed (the flushing no-data micro-batch
    // advances the watermark after the data batch)
    ((1 to 6).map(ev(_, 0)) ++ (7 to 10).map(ev(_, 5)) ++
      (11 to 12).map(ev(_, 11)) :+ ev(13, 25)).toDF()
      .coalesce(1).write.mode("append").parquet(in)

    val q = spark.readStream
      .format(classOf[graft.sources.ChangeStreamSource].getName)
      .load(in)
      .withWatermark("wallTime", "10 minutes")
      .groupBy(window(col("wallTime"), "5 minutes"), col("operationType"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "HH:mm").as("w"),
        col("operationType"), col("n"))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append")
      .start() // default micro-batch: the no-data batch fires after the
               // watermark advances and flushes the closed windows
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_counts").collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(rows.get("10:00").contains(6L), rows.toString)
    assert(rows.get("10:05").contains(4L), rows.toString)
    assert(rows.get("10:10").contains(2L), rows.toString)
    assert(!rows.contains("10:25"), rows.toString) // open window withheld
  }
}
