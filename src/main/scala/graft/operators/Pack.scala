package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global running totals and token-budget shard packing — the "cut the
  * corpus into fixed-token training shards" step of a data pipeline.
  *
  * The naive global cumsum (`SUM OVER (ORDER BY k)` with no PARTITION BY)
  * plans a single-partition window: every row funnels through ONE task —
  * the textbook 100 TB scale-killer. This is the distributed two-phase
  * prefix sum instead:
  *
  *   1. range-partition by the order key (so partition p holds a
  *      contiguous key range, all ranges in order);
  *   2. one tiny aggregation: per-partition value totals — numPartitions
  *      rows to the driver (bounded bookkeeping, like the IVF centroid
  *      literal);
  *   3. exclusive-prefix those totals on the driver and broadcast them
  *      back as per-partition offsets;
  *   4. an IN-partition window (partitionBy the partition id) adds the
  *      local running sum to the offset.
  *
  * Every stage is parallel; the only serial work is prefix-summing a
  * numPartitions-length array. Exact integer arithmetic end to end.
  */
object Pack {

  /** Adds `out` = running total of `value` over rows ordered by `order`
    * (ascending, inclusive of the current row). `order` must be globally
    * unique (it is the total order — ties would make the result
    * nondeterministic); `value` must be integer-typed (cast to long).
    *
    * The range-partitioned input is materialized once (localCheckpoint):
    * range boundaries come from sampling, so the offsets-pass and the
    * window-pass MUST see the identical partitioning — re-deriving it
    * could re-sample different boundaries and misalign every offset. On a
    * multi-node cluster, swap for `persist(DISK_ONLY)` + an action.
    */
  def runningTotal(df: DataFrame, order: String, value: String,
      out: String): DataFrame = {
    val internal = Seq("__pid", "__off")
    val collide = (df.columns :+ out).filter(internal.contains)
    require(collide.isEmpty,
      s"columns ${collide.distinct.mkString(", ")} collide with reserved " +
        s"names ${internal.mkString("{", ", ", "}")}")
    require(!df.columns.contains(out),
      s"output column '$out' already exists on the input")

    val spark = df.sparkSession
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val ranged = df
      .repartitionByRange(parts, col(order))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)

    val sums = ranged.groupBy(col("__pid"))
      .agg(sum(col(value).cast("long")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts)
      .scanLeft(0L)((acc, p) => acc + sums.getOrElse(p, 0L))
    val offDf = broadcast(
      spark.createDataFrame((0 until parts).map(p => (p, offsets(p))))
        .toDF("__pid", "__off"))

    val w = Window.partitionBy("__pid").orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(offDf, "__pid")
      .withColumn(out, sum(col(value).cast("long")).over(w) + col("__off"))
      .drop("__pid", "__off")
  }

  /** Assigns each row a shard id so that shards hold ~`budget` units of
    * `value` in `order` order: shard = (running total BEFORE this row)
    * DIV budget — a row that crosses a budget boundary belongs to the
    * shard it started in (block packing; shards can overflow by at most
    * one row's value, and no shard is ever left under-filled mid-stream).
    */
  def packShards(df: DataFrame, order: String, value: String, budget: Long,
      out: String = "shard_id"): DataFrame = {
    require(budget > 0, "shard budget must be positive")
    runningTotal(df, order, value, "__run")
      .withColumn(out,
        expr(s"(__run - CAST($value AS BIGINT)) DIV $budget"))
      .drop("__run")
  }
}
