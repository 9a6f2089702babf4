package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** Temporal join operators Spark lacks as built-ins, shaped for the
  * 100 TB case.
  *
  * `AsOf.join` — "latest right row at-or-before each left row" — is the
  * standard enrichment primitive for event streams (attach the most recent
  * session marker / price tick / config version to every event). The naive
  * form is a θ-join (`l.key = r.key AND r.ts <= l.ts` + max per left row),
  * which Spark plans as a broadcast-nested-loop or a sort-merge join with a
  * post-join per-left-row reduction — per-key quadratic in the worst case.
  * This implementation is the single-shuffle union form: tag both sides,
  * union, one window over (key ORDER BY ts, side) carrying the last non-null
  * marker payload forward. Cost = one Exchange on the key + an in-partition
  * sort — identical shape to any windowed aggregation, no join at all, and
  * skew is bounded by the per-key row count (the same bound any per-key
  * window has).
  *
  * `RangeJoin.aggWithin` — "aggregate right rows in a bounded time window
  * before each left row" — is the banded-join form: both sides are bucketed
  * by `floor(ts / width)`, the right side duplicated into the two buckets
  * that can satisfy the range, equi-joined on (key, bucket), then exactly
  * filtered. Join fan-out is bounded at 2× the right side regardless of key
  * skew, vs the unbounded θ-join DuckDB/Spark would otherwise plan; both
  * sides shuffle once on (key, bucket).
  */
object AsOf {

  /** Column names the implementation claims for itself; caller frames must
    * not use them (enforced — silent overwrite would corrupt results).
    */
  private val Reserved = Set("asof", "__asof_p", "__side")

  /** True iff `dt` supports SQL ordering (no maps anywhere) — decides
    * whether the payload struct can serve as a deterministic tie-break.
    */
  private def orderable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => orderable(f.dataType))
    case a: ArrayType => orderable(a.elementType)
    case _ => true
  }

  /** For each `left` row, attach the latest `right` row with the same key
    * and `right.ts <= left.ts` as a struct column `asof` (null when no such
    * row exists). All non-key, non-ts right columns become the payload —
    * pre-rename them to avoid collisions with left columns.
    *
    * If `right` has several rows at the same (key, ts), the one with the
    * largest payload struct (lexicographic field order) wins — deterministic
    * whenever the payload type is orderable; for non-orderable payloads
    * (maps), pre-reduce `right` to one row per (key, ts) yourself (e.g.
    * `max_by`) — this method cannot break the tie and says so via require.
    *
    * `ts` must be the same numeric/timestamp-comparable type on both sides.
    * A right row at exactly left.ts is visible (at-or-before semantics,
    * matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`).
    */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val lReserved = left.columns.filter(Reserved)
    require(lReserved.isEmpty,
      s"left columns ${lReserved.mkString(", ")} collide with reserved names " +
        s"${Reserved.mkString("{", ", ", "}")} — rename them before AsOf.join")
    val rReserved = right.columns.filter(Reserved)
    require(rReserved.isEmpty,
      s"right columns ${rReserved.mkString(", ")} collide with reserved names " +
        s"${Reserved.mkString("{", ", ", "}")} — rename them before AsOf.join")
    val payloadCols = right.columns.filterNot(c => c == key || c == ts).toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    val payloadType = StructType(payloadCols.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    require(orderable(payloadType),
      "payload contains a map type, which Spark cannot order — pre-reduce " +
        s"right to one row per ($key, $ts) and drop or restructure the map column")

    val leftOnly = left.columns.filterNot(c => c == key || c == ts).toSeq
    // Markers sort before probes at equal ts (side 0 < 1) so an exact-ts
    // marker is visible to its probe.
    val probes = left
      .withColumn("__asof_p", lit(null).cast(payloadType))
      .withColumn("__side", lit(1))
    val markers = right.select(
      Seq(col(key), col(ts)) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(payloadCols.map(col): _*).as("__asof_p"),
          lit(0).as("__side")): _*)

    // Payload struct as the final sort key: equal-(ts, side) markers order
    // deterministically, and last() then picks the largest payload. Probes'
    // null payload is inert here — __side already separates them.
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"), col("__asof_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probes.unionByName(markers)
      .withColumn("asof", last(col("__asof_p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__asof_p", "__side")
  }
}

object RangeJoin {

  /** For each `left` row, aggregate the `right` rows with the same key and
    * `right.ts` in `[left.ts - widthMicros, left.ts)` — strictly before the
    * left row, reaching back `widthMicros`. `lts`/`rts` are integer
    * microsecond columns (exact arithmetic end to end) and must have
    * distinct names; `groupCols` are the left columns that identify a left
    * row (they key the per-window aggregation). Returns the left rows that
    * matched at least one right row, with `aggs` computed over each row's
    * window (inner semantics; re-join to `left` for zeros).
    *
    * Banded plan: right rows land in bucket `rts DIV width` and are *also*
    * sent to bucket+1 — exactly the two left buckets whose windows can
    * reach them — so the equi-join on (key, bucket) sees each candidate at
    * most twice before the exact range filter. Integer `DIV`, not float
    * division: a double quotient can round across a bucket boundary for
    * large epoch values.
    */
  def aggWithin(
      left: DataFrame, right: DataFrame, key: String,
      lts: String, rts: String, widthMicros: Long,
      groupCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(widthMicros > 0, "window width must be positive")
    require(lts != rts, "rename one ts column — identical names make the join condition ambiguous")
    require(aggs.nonEmpty, "aggWithin needs at least one aggregate column")
    require(!right.columns.contains(lts),
      s"right side must not contain the left ts column '$lts' — " +
        "the unqualified range predicate would be ambiguous; rename it")
    require(!left.columns.contains(rts),
      s"left side must not contain the right ts column '$rts' — " +
        "the unqualified range predicate would be ambiguous; rename it")
    val internal = Seq("__band", "__rb", "__rkey")
    val collide = (left.columns ++ right.columns).filter(internal.contains)
    require(collide.isEmpty,
      s"columns ${collide.distinct.mkString(", ")} collide with reserved names " +
        s"${internal.mkString("{", ", ", "}")} — rename them before aggWithin")
    val l = left.withColumn("__band", expr(s"$lts DIV $widthMicros"))
    val r = right
      .withColumn("__rb", expr(s"$rts DIV $widthMicros"))
      .withColumn("__band", explode(array(col("__rb"), col("__rb") + 1)))
      .drop("__rb")
      .withColumnRenamed(key, "__rkey")
    l.join(r,
        l(key) === r("__rkey") && l("__band") === r("__band") &&
          col(rts) >= col(lts) - widthMicros && col(rts) < col(lts))
      .groupBy(groupCols.map(l(_)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
