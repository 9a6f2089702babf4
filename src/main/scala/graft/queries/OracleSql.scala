package graft.queries

import graft.functions.TextHashImpl

/** DuckDB replays of the engine's integer-hash primitives (FNV-1a 64,
  * splitmix64), shared by every oracle that promotes a hash-based query to a
  * bit-exact check. All arithmetic is HUGEINT mod 2^64 — the engine's Long
  * overflow semantics replayed exactly — and every constant is single-sourced
  * from [[graft.functions.TextHashImpl]] so the two sides cannot
  * desynchronize.
  *
  * Character codes equal UTF-8 bytes only for ASCII text; the documents
  * corpus is printable ASCII by construction (TESTDATA.md), which the gate
  * re-verifies implicitly: any non-ASCII doc would hash-mismatch.
  */
object OracleSql {

  /** 2^64 as a HUGEINT literal — the modulus of Long overflow. */
  val M64 = "18446744073709551616::HUGEINT"

  private def u(l: Long): String = java.lang.Long.toUnsignedString(l)

  /** FNV-1a 64 over a VARCHAR expression (TextHashImpl.poly64): fold the
    * characters through xor-then-multiply in HUGEINT, mod 2^64 each step.
    * The prime is 40 bits, so h*prime < 2^104 never overflows HUGEINT.
    * Yields the UNSIGNED residue; wrap with [[signedSql]] to compare
    * against the engine's BIGINT.
    */
  def fnvSql(e: String): String =
    s"""list_reduce(
        list_prepend(${u(TextHashImpl.Offset)}::HUGEINT,
          [unicode(substring($e, fnv_i, 1))::HUGEINT
           FOR fnv_i IN generate_series(1, length($e))]),
        (fnv_h, fnv_c) -> (xor(fnv_h, fnv_c)
           * ${TextHashImpl.Prime}::HUGEINT)
           % $M64)"""

  /** Unsigned 2^64 residue -> the engine's signed BIGINT representation. */
  def signedSql(uExpr: String): String =
    s"""CAST(CASE WHEN $uExpr >= 9223372036854775808::HUGEINT
        THEN $uExpr - $M64 ELSE $uExpr END AS BIGINT)"""

  /** a * b mod 2^64 without INT128 overflow (a < 2^64 times a 64-bit
    * constant can reach 2^128): split a at 2^32 —
    * a*b = a_lo*b + a_hi*b*2^32, and mod 2^64 the high term only needs
    * (a_hi*b) mod 2^32. Every intermediate is < 2^97, safely inside
    * HUGEINT. `%`/`*` associate left-to-right, so `x * b % 2^32 * 2^32`
    * is ((x*b) mod 2^32)*2^32.
    */
  private def mulModSql(a: String, b: Long): String =
    s"""((($a) % 4294967296::HUGEINT) * ${u(b)}::HUGEINT
        + (($a) // 4294967296::HUGEINT) * ${u(b)}::HUGEINT
          % 4294967296::HUGEINT * 4294967296::HUGEINT) % $M64"""

  /** splitmix64 (TextHashImpl.mix64) as a chained subquery — each step's
    * input is a column reference, so expression size stays linear and no
    * multiplication overflows (see [[mulModSql]]). Unsigned shift replay:
    * v >>> k == v // 2^k on the unsigned residue. Emits
    * `SELECT <keys>, <mix64(seedExpr)> AS <outCol> FROM <from>` — wrap in
    * a CTE at the call site.
    */
  def mix64ChainSql(keys: String, seedExpr: String, from: String,
      outCol: String): String = {
    val s1 = mulModSql("xor(mv1, mv1 // 1073741824::HUGEINT)",
      TextHashImpl.MixMul1) // >>> 30
    val s2 = mulModSql("xor(mv2, mv2 // 134217728::HUGEINT)",
      TextHashImpl.MixMul2) // >>> 27
    s"""SELECT $keys, xor(mv3, mv3 // 2147483648::HUGEINT) AS $outCol FROM (
        SELECT $keys, $s2 AS mv3 FROM (
        SELECT $keys, $s1 AS mv2 FROM (
        SELECT $keys, (($seedExpr) + ${u(TextHashImpl.MixGamma)}::HUGEINT)
                      % $M64 AS mv1
        FROM $from) mq1) mq2) mq3"""
  }
}
