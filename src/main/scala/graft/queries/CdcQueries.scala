package graft.queries

import org.apache.spark.sql.functions._
import Tables._

/** Batch-parity queries for the reference's CDC operator surface
  * (SURVEY.md §2), expressed over the driver's `events` table which stands
  * in for the live change stream (FIXTURES.md §6).
  *
  * Mapping: `event_type` plays `operationType`; the publishable set
  * {click,purchase,signup,view} mirrors {insert,update,replace,delete}
  * (internal/mongo/client.go:33-38) and `error` plays the
  * non-publishable/invalidate class; `event_id` is the monotone resume
  * token (`_id._data`); `user_id` is the watched-collection analog for
  * per-collection fan-out (pkg/connector/connector.go:128-174).
  *
  * Scale notes (100 TB): every query here is a single scan + partial-agg /
  * broadcast-join plan — no wide shuffle other than the final keyed
  * aggregation, filters and projections push into the parquet scan.
  */
object CdcQueries {

  private val Publishable = Seq("click", "purchase", "signup", "view")

  val queries: Map[String, Q] = Map(
    // F1 — publishable-op filter (internal/mongo/client.go:231-237)
    "cdc_filter_publishable" -> ((s, dir) =>
      load(s, dir, "events")
        .filter(col("event_type").isin(Publishable: _*))
        .select(col("event_id"), col("event_type"), col("user_id"))
        .orderBy(col("event_id"))),

    // P1-P4 + K1 shape — subject routing, msg-id, serialized payload
    // (internal/mongo/client.go:219-240, internal/nats/client.go:36-40)
    "cdc_route_messages" -> ((s, dir) =>
      load(s, dir, "events")
        .filter(col("event_type").isin(Publishable: _*))
        .select(
          concat(lit("EVENTS."), col("event_type")).as("subject"),
          col("event_id").cast("string").as("msg_id"),
          concat(
            lit("{\"event_id\":"), col("event_id").cast("string"),
            lit(",\"operationType\":\""), col("event_type"),
            lit("\",\"props\":"), col("props"), lit("}")).as("data"))
        .orderBy(col("msg_id"))),

    // S2/A1 — top-1 resume-token lookup (internal/mongo/client.go:187-199)
    "cdc_token_top1" -> ((s, dir) =>
      load(s, dir, "events").agg(
        max(col("event_id")).as("last_event_id"),
        expr("max_by(event_type, event_id)").as("last_event_type"))),

    // S2 per collection — one resume token per watched collection
    "cdc_tokens_per_collection" -> ((s, dir) =>
      load(s, dir, "events").groupBy(col("user_id")).agg(
        max(col("event_id")).as("last_event_id"),
        expr("max_by(event_type, event_id)").as("last_event_type"))
        .orderBy(col("user_id"))),

    // A2 — prometheus-style counters per subject
    // (internal/prometheus/prometheus.go:16-129)
    "cdc_metrics_counters" -> ((s, dir) =>
      load(s, dir, "events").groupBy(col("event_type")).agg(
        count(lit(1)).as("n_published"),
        moneySum(col("value")).as("sum_value"),
        exactAvg(col("value")).as("avg_value"))
        .select(
          concat(lit("EVENTS."), col("event_type")).as("subject"),
          col("n_published"), col("sum_value"), col("avg_value"))
        .orderBy(col("subject"))),

    // A2 — duration-histogram shape (prometheus.go:16-27): bucketed counts
    "cdc_metrics_histogram" -> ((s, dir) =>
      load(s, dir, "events").groupBy(
        col("event_type"),
        floor(col("value") / lit(50.0)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("bucket"))),

    // A3 — health roll-up (internal/server/health.go:13-29): a component is
    // UP iff it produced no error events
    "cdc_health_rollup" -> ((s, dir) =>
      load(s, dir, "events").groupBy(col("user_id").as("component")).agg(
        when(count(when(col("event_type") === "error", 1)) === 0, lit("UP"))
          .otherwise(lit("DOWN")).as("status"))
        .orderBy(col("component"))),

    // F2 — invalidate terminator (internal/mongo/client.go:232-236): how many
    // events each collection processes before its first invalidate. The
    // cutoff table is tiny → broadcast join, no shuffle of the big side.
    "cdc_invalidate_cutoff" -> ((s, dir) => {
      val ev = load(s, dir, "events")
      val inv = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id")).agg(min(col("event_id")).as("inv_id"))
      ev.join(broadcast(inv), Seq("user_id"))
        .filter(col("event_id") < col("inv_id"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_before"))
        .orderBy(col("user_id"))
    }),

    // K1 dedup — deterministic first-occurrence per dedup key
    // (JetStream Nats-Msg-Id semantics, README.md:124-127)
    "cdc_dedup_first" -> ((s, dir) =>
      load(s, dir, "events").groupBy(col("user_id"), col("event_type"))
        .agg(min(col("event_id")).as("first_event_id"))
        .orderBy(col("user_id"), col("event_type"))),

    // Ordering guarantee — per-collection total order (SURVEY.md §2.8):
    // sequence numbers assigned in token order within each collection
    "cdc_ordered_replay" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          row_number().over(w).cast("long").as("seq"))
        .orderBy(col("event_id"))
    }),

    // Composite: the full steady-state pipeline (§3.1 step 5) folded to
    // per-subject publish stats — filter → route → serialize → aggregate
    "cdc_pipeline_e2e" -> ((s, dir) =>
      load(s, dir, "events")
        .filter(col("event_type").isin(Publishable: _*))
        .select(
          concat(lit("EVENTS."), col("event_type")).as("subject"),
          col("event_id").cast("string").as("msg_id"))
        .groupBy(col("subject")).agg(
          count(lit(1)).as("n"),
          min(col("msg_id")).as("first_msg"),
          max(col("msg_id")).as("last_msg"))
        .orderBy(col("subject")))
  )

  val oracle: Map[String, String] = Map(
    "cdc_filter_publishable" ->
      """SELECT event_id, event_type, user_id FROM events
         WHERE event_type IN ('click','purchase','signup','view')
         ORDER BY event_id""",
    "cdc_route_messages" ->
      """SELECT 'EVENTS.' || event_type AS subject,
                CAST(event_id AS VARCHAR) AS msg_id,
                '{"event_id":' || CAST(event_id AS VARCHAR)
                  || ',"operationType":"' || event_type
                  || '","props":' || props || '}' AS data
         FROM events
         WHERE event_type IN ('click','purchase','signup','view')
         ORDER BY msg_id""",
    "cdc_token_top1" ->
      """SELECT MAX(event_id) AS last_event_id,
                ARG_MAX(event_type, event_id) AS last_event_type
         FROM events""",
    "cdc_tokens_per_collection" ->
      """SELECT user_id, MAX(event_id) AS last_event_id,
                ARG_MAX(event_type, event_id) AS last_event_type
         FROM events GROUP BY user_id ORDER BY user_id""",
    "cdc_metrics_counters" ->
      """SELECT 'EVENTS.' || event_type AS subject,
                COUNT(*) AS n_published,
                CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
         FROM events GROUP BY event_type ORDER BY subject""",
    "cdc_metrics_histogram" ->
      """SELECT event_type, CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
                COUNT(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY event_type, bucket""",
    "cdc_health_rollup" ->
      """SELECT user_id AS component,
                CASE WHEN COUNT(CASE WHEN event_type = 'error' THEN 1 END) = 0
                     THEN 'UP' ELSE 'DOWN' END AS status
         FROM events GROUP BY user_id ORDER BY component""",
    "cdc_invalidate_cutoff" ->
      """WITH inv AS (
           SELECT user_id, MIN(event_id) AS inv_id FROM events
           WHERE event_type = 'error' GROUP BY user_id)
         SELECT e.user_id, COUNT(*) AS n_before
         FROM events e JOIN inv ON e.user_id = inv.user_id
         WHERE e.event_id < inv.inv_id
         GROUP BY e.user_id ORDER BY e.user_id""",
    "cdc_dedup_first" ->
      """SELECT user_id, event_type, MIN(event_id) AS first_event_id
         FROM events GROUP BY user_id, event_type
         ORDER BY user_id, event_type""",
    "cdc_ordered_replay" ->
      """SELECT event_id, user_id,
                CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS seq
         FROM events ORDER BY event_id""",
    "cdc_pipeline_e2e" ->
      """SELECT 'EVENTS.' || event_type AS subject, COUNT(*) AS n,
                MIN(CAST(event_id AS VARCHAR)) AS first_msg,
                MAX(CAST(event_id AS VARCHAR)) AS last_msg
         FROM events
         WHERE event_type IN ('click','purchase','signup','view')
         GROUP BY event_type ORDER BY subject"""
  )
}
