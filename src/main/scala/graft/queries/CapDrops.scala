package graft.queries

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** "No silent caps" telemetry (round-14 VERDICT #8): capped candidate
  * generators drop over-full buckets BY DESIGN (the fan-out bound), but
  * the dropped mass must be visible, not silent — at adversarial
  * replication factors (sf10's 100-replica corpus) a cap can drop every
  * bucket and an empty result should say why. Queries attach the dropped
  * counts as an OBSERVED metric riding their existing aggregation pass
  * (`Dataset.observe` — zero extra jobs); this listener prints one line
  * per action for any metric named `graft_dropped_*`.
  *
  * Specs read the same numbers synchronously from
  * `df.queryExecution.observedMetrics` (no listener race).
  */
object CapDrops {

  private val registered = ConcurrentHashMap.newKeySet[SparkSession]()
  private val ids = new AtomicLong()

  /** Unique observation-name suffix: `observe` names must be unique per
    * Dataset, and the bench constructs the same query many times per
    * session.
    */
  def nextId(): Long = ids.incrementAndGet()

  /** Idempotently install the logging listener on this session. */
  def ensureListener(s: SparkSession): Unit =
    if (registered.add(s)) {
      s.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_dropped_")) {
              val dropped = row.getAs[Long]("dropped_buckets")
              if (dropped > 0)
                Console.err.println(
                  s"[graft] cap-drop $name: $dropped buckets " +
                    s"(${row.getAs[Long]("dropped_postings")} postings) " +
                    s"of ${row.getAs[Long]("total_buckets")} exceeded the " +
                    "bucket cap and generated no pairs")
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
}
