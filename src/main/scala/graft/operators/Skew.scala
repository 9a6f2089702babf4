package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for keyed joins at scale.
  *
  * AQE's skew-join split handles most sort-merge skew automatically, but
  * it cannot help when the dim side is broadcast-ineligible AND one fact
  * key dominates a reducer: salting is the manual fix — spread each fact
  * key over `salts` sub-keys and replicate the dim row once per salt.
  * Result set is IDENTICAL to the plain inner join (pinned by SkewSpec);
  * the shuffle for the hot key fans out over `salts` reducers.
  */
object Skew {

  /** Inner equi-join `fact ⋈ dim` on `key`, salted `salts` ways.
    * The fact salt only needs to DISTRIBUTE rows of one key, not be
    * stable across runs — a hash of the whole row serves (identical
    * duplicate rows share a salt, which only matters if one exact row
    * dominates; raise `salts` or pre-aggregate in that case).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val f = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val d = dim.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    f.join(d, f(key) === d(key) && f("__salt") === d("__salt"))
      .drop(d(key)).drop("__salt")
  }
}
