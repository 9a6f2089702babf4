package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-checked query surface.
  *
  * Oracle-safety rules (the driver hash-compares our parquet output against
  * DuckDB running `oracleSql` on the same tables):
  *  - Never emit a double produced by engine-specific float reduction order.
  *    Money-like aggregates go through exact DECIMAL arithmetic, are rounded
  *    as decimals, and only then cast to double — bit-identical both sides.
  *  - Ratios/averages are `double(exact numerator) / exact denominator` —
  *    a single IEEE division with identical inputs is bit-identical.
  *  - Counts/row_numbers are cast to BIGINT on both sides (Spark `size`/
  *    `row_number` return INT, DuckDB returns BIGINT).
  *  - DuckDB SUM(BIGINT) returns HUGEINT — and that includes *windowed*
  *    SUMs (`SUM(x) OVER (...)`). Anything derived from one (a running
  *    total, a shard id from integer division) must be CAST AS BIGINT in
  *    the oracle or it reaches the comparer as float64 (round-5 lesson:
  *    text_pack_shards).
  *  - NEVER `ROUND` a double that can be an exact decimal half — ratios
  *    of small integers land on them (41/640 = .0640625 at 6dp), and
  *    Spark rounds doubles half-UP while DuckDB rounds half-to-EVEN.
  *    Use `floor(x*1e6 + 0.5)/1e6` (half-up in both engines) instead;
  *    irrational-ish chains (ln/sqrt/avg/stddev) can keep ROUND.
  *    (Caught by the sf0.1 10× gate run, round 5.)
  *  - NEVER re-aggregate (SUM/AVG) doubles already rounded to a decimal
  *    lattice: the mean of k/1e6 values sits ON rounding boundaries,
  *    and partial-agg summation order varies with partition count.
  *    Quantize to integer micro-units (`floor(x*1e6+0.5)::BIGINT`),
  *    aggregate LONGS (exact, order-free), divide once at the end.
  *    (Caught by the SPARK_GRAFT_CPUS=8 gate run, round 5.)
  *  - Every query ends in a deterministic ORDER BY present in both the
  *    DataFrame plan and the oracle SQL.
  */
object Tables {
  type Q = (SparkSession, String) => DataFrame

  /** Load a testdata table. The `events` table's `ts` column is
    * normalized to a canonical TIMESTAMP at this boundary (the driver's
    * testdata has shipped it as both TIMESTAMP(NANOS)-as-long and
    * TIMESTAMP(MICROS) across regenerations) — every query downstream
    * sees one type. See EventsCdc.normalizeTs.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.operators.EventsCdc.normalizeTs(
      spark.read.parquet(s"$dir/$name.parquet"))

  /** Spread a deficiently-split scan across the session's shuffle
    * parallelism BEFORE heavy row-local work (guide §2.5, "input skew:
    * one huge unsplittable file — repartition immediately after the
    * read"). The testdata tables ship as single-row-group parquet files
    * at every SF (sf10 documents: 500k rows / 58 MB / ONE row group) and
    * a parquet scan cannot split inside a row group, so every
    * explode/kernel/probe that precedes the first exchange otherwise
    * runs as ONE task regardless of core count — measured round 16:
    * decontam_overlap spent ~55 of its 60 s at sf10 in that serial scan
    * stage. Used only on paths whose per-row work dominates the moved
    * bytes (the id-keyed text/vector rows are tiny next to the explode
    * fan-out they feed). Keyed repartition: a unique id spreads evenly
    * and deterministically, skips round-robin's sort-before-repartition,
    * and — when the key prefixes the downstream grouping — the one
    * exchange also satisfies the aggregation (the q20/span_detect subset
    * pattern). Partition count comes from spark.sql.shuffle.partitions
    * (scale-configured, never a local constant).
    */
  def spread(df: DataFrame, key: Column): DataFrame = df.repartition(key)

  /** Exact money sum: SUM(CAST(x AS DECIMAL(18,2))) rounded to 2, as double. */
  def moneySum(c: Column): Column =
    round(sum(c.cast(DecimalType(18, 2))), 2).cast("double")

  /** Exact mean: double(SUM(DECIMAL)) / COUNT — single IEEE division. */
  def exactAvg(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double") / count(lit(1))

  /** Exact money value (non-aggregate): DECIMAL(18,2) → double. */
  def moneyCol(c: Column): Column =
    round(c.cast(DecimalType(18, 2)), 2).cast("double")
}
