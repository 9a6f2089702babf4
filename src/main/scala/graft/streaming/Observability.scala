package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Observability parity (SURVEY.md §2.4 K3/K4):
  *
  *  - K4 metrics: a StreamingQueryListener maintaining the reference's
  *    prometheus families (internal/prometheus/prometheus.go:16-129) —
  *    processing-duration histogram per collection with the default
  *    prometheus buckets (5ms..10s), published/failed counters — plus a
  *    text exposition matching the /metrics shape
  *    (internal/server/server.go:36-38).
  *  - K3 health: per-component UP/DOWN roll-up with the reference's JSON
  *    contract {status, components:{name:{status}}} (health.go:31-45).
  *    Note the reference hard-codes the OVERALL status to UP even when a
  *    component is DOWN (health.go:23-26) — mirrored faithfully, quirk
  *    included, because the acceptance test pins it
  *    (observability_test.go:35-63).
  */
object Observability {

  /** prometheus.DefBuckets (prometheus.go:16-27 uses the defaults). */
  val DurationBuckets: Seq[Double] =
    Seq(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)

  final case class QueryStats(
      collection: String,
      batches: Long,
      eventsIn: Long, // source rows seen (pre-filter)
      failures: Long,
      durationBucketCounts: Seq[Long], // cumulative, one per bucket + +Inf
      durationSumSeconds: Double) {
    /** Post-filter publish count (nats_messages_published_total
      * semantics), maintained by the engine at the commit point.
      */
    def eventsPublished: Long =
      StreamingCdc.publishedTotal.getOrDefault(collection, 0L)
  }

  /** K4 — collects per-query progress into the metric registry. */
  final class MetricsListener extends StreamingQueryListener {
    private val stats = new ConcurrentHashMap[String, QueryStats]()

    override def onQueryStarted(e: QueryStartedEvent): Unit =
      stats.putIfAbsent(e.name,
        QueryStats(e.name, 0L, 0L, 0L,
          Seq.fill(DurationBuckets.length + 1)(0L), 0.0))

    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      val name = Option(p.name).getOrElse(p.id.toString)
      val sec = Option(p.durationMs.get("triggerExecution"))
        .map(_.toDouble / 1000.0).getOrElse(0.0)
      stats.compute(name, (_, prev0) => {
        val prev = Option(prev0).getOrElse(QueryStats(name, 0L, 0L, 0L,
          Seq.fill(DurationBuckets.length + 1)(0L), 0.0))
        val buckets = prev.durationBucketCounts.zipWithIndex.map {
          case (c, i) =>
            if (i == DurationBuckets.length || sec <= DurationBuckets(i)) c + 1
            else c
        }
        prev.copy(
          batches = prev.batches + 1,
          eventsIn = prev.eventsIn + p.numInputRows,
          durationBucketCounts = buckets,
          durationSumSeconds = prev.durationSumSeconds + sec)
      })
    }

    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      e.exception.foreach { _ =>
        stats.computeIfPresent(e.id.toString,
          (_, s) => s.copy(failures = s.failures + 1))
      }

    def snapshot: Map[String, QueryStats] = stats.asScala.toMap

    /** Prometheus text exposition, family names per prometheus.go. */
    def renderPrometheus(): String = {
      val sb = new StringBuilder
      sb ++= "# HELP connector_change_event_processing_duration_seconds " +
        "Duration of change event processing in seconds.\n"
      sb ++= "# TYPE connector_change_event_processing_duration_seconds histogram\n"
      for (s <- snapshot.values.toSeq.sortBy(_.collection)) {
        val le = DurationBuckets.map(_.toString) :+ "+Inf"
        s.durationBucketCounts.zip(le).foreach { case (c, b) =>
          sb ++= s"""connector_change_event_processing_duration_seconds_bucket{collection="${s.collection}",le="$b"} $c""" + "\n"
        }
        sb ++= s"""connector_change_event_processing_duration_seconds_sum{collection="${s.collection}"} ${s.durationSumSeconds}""" + "\n"
        sb ++= s"""connector_change_event_processing_duration_seconds_count{collection="${s.collection}"} ${s.batches}""" + "\n"
        sb ++= s"""nats_messages_published_total{collection="${s.collection}"} ${s.eventsPublished}""" + "\n"
        sb ++= s"""nats_messages_failed_total{collection="${s.collection}"} ${s.failures}""" + "\n"
      }
      sb.result()
    }
  }

  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.streams.addListener(l)
    l
  }

  /** A2 snapshot as a DataFrame — composable with the query surface. */
  def metricsFrame(spark: SparkSession, l: MetricsListener): DataFrame = {
    import spark.implicits._
    l.snapshot.values.toSeq
      .map(s => (s.collection, s.batches, s.eventsPublished, s.failures))
      .toDF("collection", "batches", "events_published", "failures")
  }

  // ---- K3 health ----

  final case class ComponentStatus(status: String)
  final case class HealthResponse(
      status: String, components: Map[String, ComponentStatus])

  /** K3 — component probes over the active streaming queries (the engine's
    * "monitors"): a query is UP while active and exception-free
    * (NamedMonitor contract, health.go:8-11).
    */
  def healthCheck(spark: SparkSession): HealthResponse = {
    val components = spark.streams.active.map { q =>
      val name = Option(q.name).getOrElse(q.id.toString)
      name -> ComponentStatus(
        if (q.exception.isEmpty && q.isActive) "UP" else "DOWN")
    }.toMap
    // Reference quirk: overall status is hard-coded UP (health.go:23-26).
    HealthResponse("UP", components)
  }

  /** The exact healthz JSON contract (health.go:31-45, http.go:8-12). */
  def healthJson(h: HealthResponse): String = {
    val comps = h.components.toSeq.sortBy(_._1).map { case (n, c) =>
      s""""$n":{"status":"${c.status}"}"""
    }.mkString(",")
    s"""{"status":"${h.status}","components":{$comps}}"""
  }
}
