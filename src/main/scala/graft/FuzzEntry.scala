package graft

import java.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Randomized differential-testing query generator (round-11 gate).
  *
  * The fixed 142-query oracle surface is green at three scale decades; the
  * remaining correctness exposure is exactly what a fixed set cannot see.
  * This generator is the engine's analog of the reference's property-style
  * fault-injection harness (`/root/reference/test/harness/harness.go:274-294`
  * probes behavior its fixed acceptance cases don't enumerate): a seeded
  * stream of random filter / projection / aggregate / join / window queries
  * over the existing testdata schemas, built through the SAME dual-rendering
  * discipline as the hand-written surface — every random expression is
  * materialized simultaneously as a Spark `Column` tree (the engine under
  * test) and as ANSI SQL (the DuckDB oracle), from one seeded decision
  * stream, so a seed fully reproduces both sides.
  *
  * Determinism rules (inherited from Tables.scala's oracle-safety notes):
  *  - integer arithmetic only in outputs (doubles enter via comparisons or
  *    `CAST(floor(x) AS BIGINT)` — DuckDB ROUNDS double→int, Spark
  *    truncates, so the cast is always taken on an exact integer value);
  *  - `CAST(SUM(..) AS BIGINT)` / `CAST(COUNT(..) AS BIGINT)` on the oracle
  *    side (DuckDB sums BIGINT into HUGEINT; COUNT/ROW_NUMBER widths vary);
  *  - every ORDER BY is total (unique key or the full group-key set) and
  *    spells NULLS FIRST (DuckDB defaults NULLS LAST on ASC, Spark FIRST);
  *  - window functions order by a unique tie-break inside each partition
  *    (except RANK, which is tie-deterministic by definition);
  *  - arithmetic depth and literal magnitudes are bounded so no BIGINT
  *    overflow is reachable at any testdata SF (Spark 4 runs ANSI mode).
  */
object FuzzEntry {

  /** Bump when the generation algorithm changes — a (version, seed) pair
    * identifies a query forever; FUZZ_r*.json records it.
    *
    * v2: scan/window shapes ORDER BY every output column, not just the
    * table's nominal key — the synthetic lineitem has ~20% duplicated
    * (l_orderkey, l_linenumber) pairs (only FULL rows are unique), so a
    * key-only sort was not total and the gate's positional compare saw
    * tied rows in engine-dependent order (v1 seeds 63/64/98/205). With
    * all output columns in the sort, rows tied on the whole sort key are
    * byte-identical in every compared column, which positional compare
    * accepts; window outputs stay deterministic as multisets because
    * ROW_NUMBER/LAG/running-SUM are position-functions of the (totally
    * sorted) value sequence, and fully-tied rows are interchangeable.
    *
    * v3 (round-12 VERDICT #5): a KERNEL shape family — the ~21 native
    * Catalyst expressions are exactly where a codegen bug would hide, and
    * none were reachable by the v2 scan/agg/join/window/union shapes.
    * Each kernel case applies a random native kernel (fnv64, simhash64 —
    * plain and over word_ngrams —, dhash64, a random minhash_ngrams
    * signature position, vec_quantize6/vec_dotq/lsh_buckets elements)
    * with random arguments to a guarded slice of documents/embeddings,
    * dual-rendered against the same HUGEINT replay fragments the fixed
    * oracle surface uses (OracleSql.fnvSql/mix64ChainSql/signedSql and
    * the quantize/plane-weight formulas).
    */
  val GeneratorVersion = 3

  /** One expression, rendered for both engines from the same decisions. */
  final case class Ex(c: Column, sql: String)

  /** Table metadata: identity/sort key, typed column pools, literal pools.
    * `unique` is the table's nominal key — used as the leading sort and
    * window tie-break; it is NOT assumed unique (lineitem's isn't; only
    * full rows are), which is why every shape orders by all output columns.
    */
  final case class TMeta(
      name: String,
      unique: Seq[String],
      ints: Seq[String],
      dbls: Map[String, (Double, Double)],
      strs: Map[String, Seq[String]],
      lenStrs: Seq[String],
      tss: Map[String, Seq[String]])

  val lineitem = TMeta("lineitem",
    unique = Seq("l_orderkey", "l_linenumber"),
    ints = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
    dbls = Map("l_quantity" -> (1.0, 50.0), "l_extendedprice" -> (900.0, 105000.0),
      "l_discount" -> (0.0, 0.11), "l_tax" -> (0.0, 0.09)),
    strs = Map("l_returnflag" -> Seq("A", "N", "R"),
      "l_linestatus" -> Seq("F", "O")),
    lenStrs = Seq.empty,
    tss = Map("l_shipdate" -> Seq("1996-03-15 00:00:00", "1997-06-30 00:00:00",
      "1999-01-01 00:00:00", "2000-10-01 00:00:00")))

  val orders = TMeta("orders",
    unique = Seq("o_orderkey"),
    ints = Seq("o_orderkey", "o_custkey"),
    dbls = Map("o_totalprice" -> (1000.0, 500000.0)),
    strs = Map("o_orderstatus" -> Seq("F", "O", "P"),
      "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")),
    lenStrs = Seq("o_orderpriority"),
    tss = Map("o_orderdate" -> Seq("1996-01-01 00:00:00", "1997-07-01 00:00:00",
      "1999-06-01 00:00:00", "2001-01-01 00:00:00")))

  val customer = TMeta("customer",
    unique = Seq("c_custkey"),
    ints = Seq("c_custkey", "c_nationkey"),
    dbls = Map("c_acctbal" -> (-995.0, 9998.0)),
    strs = Map("c_mktsegment" -> Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY")),
    lenStrs = Seq("c_name"),
    tss = Map.empty)

  val part = TMeta("part",
    unique = Seq("p_partkey"),
    ints = Seq("p_partkey", "p_size"),
    dbls = Map("p_retailprice" -> (900.0, 2100.0)),
    strs = Map("p_brand" -> Seq("Brand#1", "Brand#5", "Brand#13", "Brand#21",
      "Brand#25")),
    lenStrs = Seq("p_name", "p_type"),
    tss = Map.empty)

  val supplier = TMeta("supplier",
    unique = Seq("s_suppkey"),
    ints = Seq("s_suppkey", "s_nationkey"),
    dbls = Map("s_acctbal" -> (-995.0, 9998.0)),
    strs = Map.empty,
    lenStrs = Seq("s_name"),
    tss = Map.empty)

  val nation = TMeta("nation",
    unique = Seq("n_nationkey"),
    ints = Seq("n_nationkey", "n_regionkey"),
    dbls = Map.empty, strs = Map.empty, lenStrs = Seq("n_name"), tss = Map.empty)

  val region = TMeta("region",
    unique = Seq("r_regionkey"),
    ints = Seq("r_regionkey"),
    dbls = Map.empty, strs = Map.empty, lenStrs = Seq("r_name"), tss = Map.empty)

  val events = TMeta("events",
    unique = Seq("event_id"),
    ints = Seq("event_id", "user_id"),
    dbls = Map("value" -> (0.0, 491.0)),
    strs = Map("event_type" -> Seq("click", "view", "purchase", "signup",
      "error")),
    lenStrs = Seq.empty,
    tss = Map("ts" -> Seq("2024-01-05 00:00:00", "2024-01-12 12:00:00",
      "2024-01-20 00:00:00", "2024-01-27 06:00:00")))

  val documents = TMeta("documents",
    unique = Seq("doc_id"),
    ints = Seq("doc_id", "n_chars"),
    dbls = Map.empty,
    strs = Map("lang" -> Seq("de", "en", "es", "fr", "zh"),
      "source" -> Seq("src0", "src3", "src7", "src12", "src19")),
    lenStrs = Seq("text"),
    tss = Map.empty)

  /** Single-table scan candidates. */
  val scanTables: Seq[TMeta] =
    Seq(lineitem, orders, customer, part, supplier, events, documents)

  /** Inner-equi-join chains along the star schema's FK edges. */
  val joinEdges: Map[(String, String), (String, String)] = Map(
    ("lineitem", "orders") -> ("l_orderkey", "o_orderkey"),
    ("orders", "customer") -> ("o_custkey", "c_custkey"),
    ("lineitem", "part") -> ("l_partkey", "p_partkey"),
    ("lineitem", "supplier") -> ("l_suppkey", "s_suppkey"),
    ("customer", "nation") -> ("c_nationkey", "n_nationkey"),
    ("supplier", "nation") -> ("s_nationkey", "n_nationkey"),
    ("nation", "region") -> ("n_regionkey", "r_regionkey"))

  val joinChains: Seq[Seq[TMeta]] = Seq(
    Seq(lineitem, orders), Seq(orders, customer), Seq(lineitem, part),
    Seq(lineitem, supplier), Seq(customer, nation), Seq(supplier, nation),
    Seq(lineitem, orders, customer), Seq(customer, nation, region),
    Seq(lineitem, supplier, nation), Seq(orders, customer, nation))

  final case class FuzzCase(
      name: String,
      seed: Long,
      shape: String,
      build: (SparkSession, String) => DataFrame,
      sql: String)

  // ----------------------------------------------------------------------
  // expression generators — every branch renders BOTH sides in lockstep
  // ----------------------------------------------------------------------

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  /** Base integer expression (BIGINT both sides), from one random column. */
  private def intBase(r: Random, ts: Seq[TMeta]): Ex = {
    val t = pick(r, ts)
    val opts = Seq.newBuilder[() => Ex]
    if (t.ints.nonEmpty) opts += { () =>
      val c = pick(r, t.ints)
      Ex(col(c).cast("long"), s"CAST($c AS BIGINT)")
    }
    if (t.dbls.nonEmpty) opts += { () =>
      // floor first: the double→int CAST rounds in DuckDB but truncates in
      // Spark; on an exact integer-valued double both agree.
      val c = pick(r, t.dbls.keys.toSeq.sorted)
      Ex(floor(col(c)).cast("long"), s"CAST(floor($c) AS BIGINT)")
    }
    if (t.tss.nonEmpty) opts += { () =>
      val c = pick(r, t.tss.keys.toSeq.sorted)
      if (r.nextBoolean())
        Ex(year(col(c)).cast("long"), s"CAST(year($c) AS BIGINT)")
      else
        Ex(month(col(c)).cast("long"), s"CAST(month($c) AS BIGINT)")
    }
    val strCands = (t.strs.keys ++ t.lenStrs).toSeq.sorted
    if (strCands.nonEmpty) opts += { () =>
      val c = pick(r, strCands)
      Ex(length(col(c)).cast("long"), s"CAST(length($c) AS BIGINT)")
    }
    pick(r, opts.result())()
  }

  /** Integer expression with bounded arithmetic depth. */
  private def intExpr(r: Random, ts: Seq[TMeta], depth: Int): Ex =
    r.nextInt(10) match {
      case 0 | 1 if depth < 2 =>
        val a = intExpr(r, ts, depth + 1); val b = intExpr(r, ts, depth + 1)
        if (r.nextBoolean()) Ex(a.c + b.c, s"(${a.sql} + ${b.sql})")
        else Ex(a.c - b.c, s"(${a.sql} - ${b.sql})")
      case 2 if depth < 2 =>
        val a = intExpr(r, ts, depth + 1); val k = 2 + r.nextInt(8)
        Ex(a.c * lit(k.toLong), s"(${a.sql} * $k)")
      case 3 if depth < 2 =>
        // both engines take the dividend's sign for % — consistent even
        // when a subtraction above went negative
        val a = intExpr(r, ts, depth + 1); val m = 2 + r.nextInt(12)
        Ex(a.c % lit(m.toLong), s"(${a.sql} % $m)")
      case 4 if depth < 2 =>
        val p = pred(r, ts, depth + 1); val v = r.nextInt(100).toLong
        val a = intExpr(r, ts, depth + 1)
        Ex(when(p.c, lit(v)).otherwise(a.c),
          s"(CASE WHEN ${p.sql} THEN $v ELSE ${a.sql} END)")
      case _ => intBase(r, ts)
    }

  /** Boolean predicate over the chain's columns. */
  private def pred(r: Random, ts: Seq[TMeta], depth: Int): Ex = {
    def leaf(): Ex = {
      val t = pick(r, ts)
      val opts = Seq.newBuilder[() => Ex]
      opts += { () =>
        val e = intExpr(r, ts, 1)
        val (cmpC, cmpS): ((Column, Column) => Column, String) = r.nextInt(6) match {
          case 0 => ((a: Column, b: Column) => a < b, "<")
          case 1 => ((a: Column, b: Column) => a <= b, "<=")
          case 2 => ((a: Column, b: Column) => a > b, ">")
          case 3 => ((a: Column, b: Column) => a >= b, ">=")
          case 4 => ((a: Column, b: Column) => a === b, "=")
          case _ => ((a: Column, b: Column) => a =!= b, "<>")
        }
        val v = (r.nextInt(4) match {
          case 0 => r.nextInt(10)
          case 1 => r.nextInt(60)
          case 2 => r.nextInt(500)
          case _ => 1000 * (1 + r.nextInt(9))
        }).toLong
        Ex(cmpC(e.c, lit(v)), s"(${e.sql} $cmpS $v)")
      }
      opts += { () =>
        // mod-equality — sf-independent selectivity ~1/m
        val e = intBase(r, ts); val m = 5 + r.nextInt(9); val k = r.nextInt(m)
        Ex(e.c % lit(m.toLong) === lit(k.toLong), s"((${e.sql} % $m) = $k)")
      }
      if (t.strs.nonEmpty) opts += { () =>
        val c = pick(r, t.strs.keys.toSeq.sorted); val pool = t.strs(c)
        r.nextInt(3) match {
          case 0 =>
            val v = pick(r, pool)
            Ex(col(c) === lit(v), s"($c = '$v')")
          case 1 =>
            val n = 2 + r.nextInt(math.min(3, pool.size - 1))
            val vs = r.shuffle(pool.toList).take(n).sorted
            Ex(col(c).isin(vs: _*),
              s"($c IN (${vs.map(v => s"'$v'").mkString(", ")}))")
          case _ =>
            val v = pick(r, pool)
            val p = v.substring(0, math.max(1, math.min(v.length, 1 + r.nextInt(4))))
            Ex(col(c).like(s"$p%"), s"($c LIKE '$p%')")
        }
      }
      if (t.tss.nonEmpty) opts += { () =>
        val c = pick(r, t.tss.keys.toSeq.sorted); val v = pick(r, t.tss(c))
        val lt = r.nextBoolean()
        val tsLit = lit(v).cast("timestamp")
        if (lt) Ex(col(c) < tsLit, s"($c < TIMESTAMP '$v')")
        else Ex(col(c) >= tsLit, s"($c >= TIMESTAMP '$v')")
      }
      if (t.dbls.nonEmpty) opts += { () =>
        // comparison only — no double arithmetic ever reaches an output
        val c = pick(r, t.dbls.keys.toSeq.sorted); val (lo, hi) = t.dbls(c)
        val frac = (1 + r.nextInt(9)) / 10.0
        val v = BigDecimal(lo + frac * (hi - lo))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
        if (r.nextBoolean()) Ex(col(c) < lit(v.toDouble), s"($c < $v)")
        else Ex(col(c) >= lit(v.toDouble), s"($c >= $v)")
      }
      pick(r, opts.result())()
    }
    if (depth < 2 && r.nextInt(10) < 4) {
      val a = pred(r, ts, depth + 1); val b = pred(r, ts, depth + 1)
      r.nextInt(3) match {
        case 0 => Ex(a.c && b.c, s"(${a.sql} AND ${b.sql})")
        case 1 => Ex(a.c || b.c, s"(${a.sql} OR ${b.sql})")
        case _ => Ex(!a.c, s"(NOT ${a.sql})")
      }
    } else leaf()
  }

  /** Low-cardinality grouping key (bounded group count at any SF). */
  private def groupKey(r: Random, ts: Seq[TMeta]): Ex = {
    val t = pick(r, ts)
    val opts = Seq.newBuilder[() => Ex]
    if (t.strs.nonEmpty) opts += { () =>
      val c = pick(r, t.strs.keys.toSeq.sorted)
      Ex(col(c), c)
    }
    if (t.tss.nonEmpty) opts += { () =>
      val c = pick(r, t.tss.keys.toSeq.sorted)
      if (r.nextBoolean())
        Ex(year(col(c)).cast("long"), s"CAST(year($c) AS BIGINT)")
      else
        Ex(month(col(c)).cast("long"), s"CAST(month($c) AS BIGINT)")
    }
    opts += { () =>
      val e = intBase(r, ts); val m = 2 + r.nextInt(12)
      Ex(e.c % lit(m.toLong), s"(${e.sql} % $m)")
    }
    if (t.strs.nonEmpty) opts += { () =>
      val c = pick(r, t.strs.keys.toSeq.sorted)
      Ex(substring(col(c), 1, 1), s"substr($c, 1, 1)")
    }
    pick(r, opts.result())()
  }

  /** One aggregate (Spark Column + oracle SQL, result types aligned). */
  private def aggItem(r: Random, ts: Seq[TMeta]): Ex =
    r.nextInt(7) match {
      case 0 => Ex(count(lit(1)), "CAST(COUNT(*) AS BIGINT)")
      case 1 =>
        val e = intExpr(r, ts, 1)
        Ex(sum(e.c), s"CAST(SUM(${e.sql}) AS BIGINT)")
      case 2 =>
        val e = intExpr(r, ts, 1)
        if (r.nextBoolean()) Ex(min(e.c), s"MIN(${e.sql})")
        else Ex(max(e.c), s"MAX(${e.sql})")
      case 3 =>
        val e = intBase(r, ts)
        Ex(count_distinct(e.c), s"CAST(COUNT(DISTINCT ${e.sql}) AS BIGINT)")
      case 4 =>
        val strT = ts.filter(_.strs.nonEmpty)
        if (strT.isEmpty) Ex(count(lit(1)), "CAST(COUNT(*) AS BIGINT)")
        else {
          val t = pick(r, strT); val c = pick(r, t.strs.keys.toSeq.sorted)
          if (r.nextBoolean()) Ex(min(col(c)), s"MIN($c)")
          else Ex(max(col(c)), s"MAX($c)")
        }
      case 5 =>
        val tsT = ts.filter(_.tss.nonEmpty)
        if (tsT.isEmpty) Ex(count(lit(1)), "CAST(COUNT(*) AS BIGINT)")
        else {
          val t = pick(r, tsT); val c = pick(r, t.tss.keys.toSeq.sorted)
          if (r.nextBoolean()) Ex(min(col(c)), s"MIN($c)")
          else Ex(max(col(c)), s"MAX($c)")
        }
      case _ =>
        val p = pred(r, ts, 1)
        Ex(sum(when(p.c, lit(1L)).otherwise(lit(0L))),
          s"CAST(SUM(CASE WHEN ${p.sql} THEN 1 ELSE 0 END) AS BIGINT)")
    }

  // ----------------------------------------------------------------------
  // query shapes
  // ----------------------------------------------------------------------

  private def loadChain(s: SparkSession, dir: String,
      chain: Seq[TMeta]): DataFrame =
    chain.tail.foldLeft(graft.queries.Tables.load(s, dir, chain.head.name)) {
      (acc, t) =>
        val prev = chain(chain.indexOf(t) - 1)
        val (lc, rc) = joinEdges.getOrElse((prev.name, t.name),
          joinEdges((t.name, prev.name)).swap)
        acc.join(graft.queries.Tables.load(s, dir, t.name),
          col(lc) === col(rc))
    }

  private def fromSql(chain: Seq[TMeta]): String =
    chain.tail.foldLeft(chain.head.name) { (acc, t) =>
      val prev = chain(chain.indexOf(t) - 1)
      val (lc, rc) = joinEdges.getOrElse((prev.name, t.name),
        joinEdges((t.name, prev.name)).swap)
      s"$acc JOIN ${t.name} ON $lc = $rc"
    }

  /** Shape A — single-table filter + projection. A mandatory mod-pred
    * conjunct on the unique key bounds the output at any SF (≤ rows/7).
    */
  private def shapeScan(r: Random, seed: Long): FuzzCase = {
    val t = pick(r, scanTables)
    val ts = Seq(t)
    val m = 7 + r.nextInt(7); val k = r.nextInt(m)
    val guard = Ex(col(t.unique.head) % lit(m.toLong) === lit(k.toLong),
      s"((${t.unique.head} % $m) = $k)")
    val p = pred(r, ts, 1)
    val nx = 2 + r.nextInt(3)
    val xs = (0 until nx).map(i => s"x$i" -> intExpr(r, ts, 0))
    val keyCols = t.unique
    val outCols = keyCols ++ xs.map(_._1)
    val selSql = (keyCols.map(c => c) ++
      xs.map { case (n, e) => s"${e.sql} AS $n" }).mkString(", ")
    val ordSql = outCols.map(c => s"$c NULLS FIRST").mkString(", ")
    val sql =
      s"""SELECT $selSql
         |FROM ${t.name}
         |WHERE ${guard.sql} AND ${p.sql}
         |ORDER BY $ordSql""".stripMargin
    val build = (s: SparkSession, dir: String) => {
      val df = graft.queries.Tables.load(s, dir, t.name)
      df.filter(guard.c && p.c)
        .select(keyCols.map(col) ++
          xs.map { case (n, e) => e.c.as(n) }: _*)
        .orderBy(outCols.map(c => col(c).asc_nulls_first): _*)
    }
    FuzzCase(f"fz_$seed%04d_scan", seed, "scan", build, sql)
  }

  /** Shape B — single-table (optionally filtered, optionally global)
    * aggregation; a0 is always COUNT(*) so HAVING can reference it.
    */
  private def shapeAgg(r: Random, seed: Long): FuzzCase = {
    val t = pick(r, scanTables)
    val ts = Seq(t)
    val hasFilter = r.nextBoolean()
    val p = if (hasFilter) Some(pred(r, ts, 1)) else None
    val nk = r.nextInt(3) // 0 = global aggregate
    val keys = (0 until nk).map(i => s"k$i" -> groupKey(r, ts))
    val na = 1 + r.nextInt(3)
    val aggs = ("a0" -> Ex(count(lit(1)), "CAST(COUNT(*) AS BIGINT)")) +:
      (1 to na).map(i => s"a$i" -> aggItem(r, ts))
    val having = if (nk > 0 && r.nextInt(3) == 0) Some(1 + r.nextInt(4)) else None
    val selSql = (keys.map { case (n, e) => s"${e.sql} AS $n" } ++
      aggs.map { case (n, e) => s"${e.sql} AS $n" }).mkString(", ")
    val sql =
      s"""SELECT $selSql
         |FROM ${t.name}
         |${p.map(x => s"WHERE ${x.sql}").getOrElse("")}
         |${if (nk > 0) "GROUP BY " + keys.map(_._2.sql).mkString(", ") else ""}
         |${having.map(h => s"HAVING COUNT(*) > $h").getOrElse("")}
         |${if (nk > 0) "ORDER BY " + keys.map(k => s"${k._1} NULLS FIRST").mkString(", ") else ""}"""
        .stripMargin.linesIterator.filter(_.nonEmpty).mkString("\n")
    val build = (s: SparkSession, dir: String) => {
      var df = graft.queries.Tables.load(s, dir, t.name)
      p.foreach(x => df = df.filter(x.c))
      var out =
        if (nk > 0)
          df.groupBy(keys.map { case (n, e) => e.c.as(n) }: _*)
            .agg(aggs.head._2.c.as(aggs.head._1),
              aggs.tail.map { case (n, e) => e.c.as(n) }: _*)
        else
          df.agg(aggs.head._2.c.as(aggs.head._1),
            aggs.tail.map { case (n, e) => e.c.as(n) }: _*)
      having.foreach(h => out = out.filter(col("a0") > h))
      if (nk > 0)
        out = out.orderBy(keys.map(k => col(k._1).asc_nulls_first): _*)
      out
    }
    FuzzCase(f"fz_$seed%04d_agg", seed, "agg", build, sql)
  }

  /** Shape C — 2-3-table inner-join chain + aggregation over mixed keys. */
  private def shapeJoin(r: Random, seed: Long): FuzzCase = {
    val chain = pick(r, joinChains)
    val ts = chain
    val hasFilter = r.nextBoolean()
    val p = if (hasFilter) Some(pred(r, ts, 1)) else None
    val nk = 1 + r.nextInt(2)
    val keys = (0 until nk).map(i => s"k$i" -> groupKey(r, ts))
    val na = 1 + r.nextInt(3)
    val aggs = ("a0" -> Ex(count(lit(1)), "CAST(COUNT(*) AS BIGINT)")) +:
      (1 to na).map(i => s"a$i" -> aggItem(r, ts))
    val selSql = (keys.map { case (n, e) => s"${e.sql} AS $n" } ++
      aggs.map { case (n, e) => s"${e.sql} AS $n" }).mkString(", ")
    val sql =
      s"""SELECT $selSql
         |FROM ${fromSql(chain)}
         |${p.map(x => s"WHERE ${x.sql}").getOrElse("")}
         |GROUP BY ${keys.map(_._2.sql).mkString(", ")}
         |ORDER BY ${keys.map(k => s"${k._1} NULLS FIRST").mkString(", ")}"""
        .stripMargin.linesIterator.filter(_.nonEmpty).mkString("\n")
    val build = (s: SparkSession, dir: String) => {
      var df = loadChain(s, dir, chain)
      p.foreach(x => df = df.filter(x.c))
      df.groupBy(keys.map { case (n, e) => e.c.as(n) }: _*)
        .agg(aggs.head._2.c.as(aggs.head._1),
          aggs.tail.map { case (n, e) => e.c.as(n) }: _*)
        .orderBy(keys.map(k => col(k._1).asc_nulls_first): _*)
    }
    FuzzCase(f"fz_$seed%04d_join", seed, "join", build, sql)
  }

  /** Shape D — windowed top-N per partition: ROW_NUMBER over a totally
    * ordered window (unique-key tie-break) plus one more window function;
    * a mandatory mod-pred prefilter bounds the scan, rn ≤ K bounds output.
    */
  private def shapeWindow(r: Random, seed: Long): FuzzCase = {
    val t = pick(r, scanTables)
    val ts = Seq(t)
    val m = 3 + r.nextInt(5); val k = r.nextInt(m)
    val guard = Ex(col(t.unique.head) % lit(m.toLong) === lit(k.toLong),
      s"((${t.unique.head} % $m) = $k)")
    val pk = groupKey(r, ts)
    val ord = intExpr(r, ts, 1)
    val topN = 2 + r.nextInt(4)
    val keyCols = t.unique
    val tieSql = keyCols.map(c => s"$c NULLS FIRST").mkString(", ")
    val overSql = s"PARTITION BY ${pk.sql} ORDER BY ${ord.sql} NULLS FIRST, $tieSql"
    val wSpark = Window.partitionBy(pk.c)
      .orderBy(ord.c.asc_nulls_first +: keyCols.map(c => col(c).asc_nulls_first): _*)
    // extra window function: RANK is tie-deterministic so it may order by
    // the raw expression alone; LAG and running-SUM need the tie-break
    val extra: (String, Ex) = r.nextInt(3) match {
      case 0 =>
        val w2 = Window.partitionBy(pk.c).orderBy(ord.c.asc_nulls_first)
        ("x1", Ex(rank().over(w2).cast("long"),
          s"CAST(RANK() OVER (PARTITION BY ${pk.sql} ORDER BY ${ord.sql} NULLS FIRST) AS BIGINT)"))
      case 1 =>
        ("x1", Ex(coalesce(lag(ord.c, 1).over(wSpark), lit(-1L)),
          s"COALESCE(LAG(${ord.sql}, 1) OVER ($overSql), -1)"))
      case _ =>
        val wRows = wSpark.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ("x1", Ex(sum(ord.c).over(wRows),
          s"CAST(SUM(${ord.sql}) OVER ($overSql ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"))
    }
    val selKeys = keyCols.map(c => c).mkString(", ")
    val outCols = keyCols ++ Seq("k0", "x0", "rn", extra._1)
    val ordOutSql = outCols.map(c => s"$c NULLS FIRST").mkString(", ")
    val sql =
      s"""WITH w AS (
         |  SELECT $selKeys, ${pk.sql} AS k0, ${ord.sql} AS x0,
         |         CAST(ROW_NUMBER() OVER ($overSql) AS BIGINT) AS rn,
         |         ${extra._2.sql} AS ${extra._1}
         |  FROM ${t.name}
         |  WHERE ${guard.sql})
         |SELECT * FROM w WHERE rn <= $topN
         |ORDER BY $ordOutSql""".stripMargin
    val build = (s: SparkSession, dir: String) => {
      graft.queries.Tables.load(s, dir, t.name)
        .filter(guard.c)
        .select(keyCols.map(col) ++ Seq(pk.c.as("k0"), ord.c.as("x0"),
          row_number().over(wSpark).cast("long").as("rn"),
          extra._2.c.as(extra._1)): _*)
        .filter(col("rn") <= topN)
        .orderBy(outCols.map(c => col(c).asc_nulls_first): _*)
    }
    FuzzCase(f"fz_$seed%04d_window", seed, "window", build, sql)
  }

  /** Shape E — UNION ALL of two filtered branches, then aggregate. */
  private def shapeUnion(r: Random, seed: Long): FuzzCase = {
    val t = pick(r, scanTables)
    val ts = Seq(t)
    val p1 = pred(r, ts, 1); val p2 = pred(r, ts, 1)
    val x = intExpr(r, ts, 1); val k0 = groupKey(r, ts)
    val sql =
      s"""WITH u AS (
         |  SELECT ${k0.sql} AS k0, ${x.sql} AS x0 FROM ${t.name} WHERE ${p1.sql}
         |  UNION ALL
         |  SELECT ${k0.sql} AS k0, ${x.sql} AS x0 FROM ${t.name} WHERE ${p2.sql})
         |SELECT k0, CAST(COUNT(*) AS BIGINT) AS a0,
         |       CAST(SUM(x0) AS BIGINT) AS a1,
         |       MIN(x0) AS a2, MAX(x0) AS a3
         |FROM u GROUP BY k0
         |ORDER BY k0 NULLS FIRST""".stripMargin
    val build = (s: SparkSession, dir: String) => {
      val df = graft.queries.Tables.load(s, dir, t.name)
      val b1 = df.filter(p1.c).select(k0.c.as("k0"), x.c.as("x0"))
      val b2 = df.filter(p2.c).select(k0.c.as("k0"), x.c.as("x0"))
      b1.unionAll(b2).groupBy(col("k0"))
        .agg(count(lit(1)).as("a0"), sum(col("x0")).as("a1"),
          min(col("x0")).as("a2"), max(col("x0")).as("a3"))
        .orderBy(col("k0").asc_nulls_first)
    }
    FuzzCase(f"fz_$seed%04d_union", seed, "union", build, sql)
  }

  /** Shape F (v3) — native-kernel differential: one random custom kernel
    * with random arguments over a mod-guarded slice of documents (string /
    * token kernels) or embeddings (vector kernels), its DuckDB side built
    * from the same replay fragments the fixed oracle surface uses. All
    * outputs are BIGINT both sides; keys are unique (doc_id / vec_id) but
    * the sort still spells every output column per the v2 discipline.
    */
  private def shapeKernel(r: Random, seed: Long): FuzzCase = {
    import graft.queries.OracleSql.{fnvSql, mix64ChainSql, signedSql}
    val prime = graft.functions.TextHashImpl.Prime

    def docCase(kind: String, outs: Seq[(String, String, String)],
        ctes: String, fromSql: String): FuzzCase = {
      // outs: (name, sparkExpr, duckSelectExpr on the post-CTE from)
      val m = 5 + r.nextInt(7); val k = r.nextInt(m)
      val guard = s"((doc_id % $m) = $k)"
      val ordSql = ("doc_id" +: outs.map(_._1))
        .map(c => s"$c NULLS FIRST").mkString(", ")
      val withSql = if (ctes.isEmpty) "" else
        s"WITH base AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts\n" +
          s"             FROM documents WHERE $guard),\n$ctes\n"
      val whereSql = if (ctes.isEmpty) s"WHERE $guard" else ""
      val sql =
        s"""${withSql}SELECT doc_id, ${outs.map { case (n, _, d) =>
             s"$d AS $n" }.mkString(", ")}
           |FROM $fromSql $whereSql
           |ORDER BY $ordSql""".stripMargin
      val build = (s: SparkSession, dir: String) =>
        graft.queries.Tables.load(s, dir, "documents")
          .filter(expr(guard))
          .select(col("doc_id") +: outs.map { case (n, sp, _) =>
            expr(sp).as(n) }: _*)
          .orderBy(("doc_id" +: outs.map(_._1))
            .map(c => col(c).asc_nulls_first): _*)
      FuzzCase(f"fz_$seed%04d_$kind", seed, kind, build, sql)
    }

    r.nextInt(5) match {
      case 0 => // fnv64 over two random string expressions
        def strExpr(): (String, String) = r.nextInt(7) match {
          case 0 => ("text", "text")
          case 1 =>
            val a = 1 + r.nextInt(40); val l = 1 + r.nextInt(12)
            (s"substring(text, $a, $l)", s"substring(text, $a, $l)")
          case 2 => ("concat(lang, ':', source)", "lang || ':' || source")
          case 3 => ("upper(source)", "upper(source)")
          case 4 => ("lower(lang)", "lower(lang)")
          case 5 => ("source", "source")
          case _ => ("lang", "lang")
        }
        val (s0, d0) = strExpr(); val (s1, d1) = strExpr()
        docCase("kfnv", Seq(
          ("h0", s"fnv64($s0)", signedSql(fnvSql(d0))),
          ("h1", s"fnv64($s1)", signedSql(fnvSql(d1)))),
          ctes = "", fromSql = "documents")

      case 1 => // simhash64 over tokens or word n-grams
        val n = 1 + r.nextInt(4) // 1 = plain tokens, 2..4 = word_ngrams
        val (sparkToks, itemCte, cntSpark, cntDuck) =
          if (n == 1)
            ("split(text, ' ')",
              "item AS (SELECT doc_id, unnest(ts) AS it FROM base)",
              "size(split(text, ' '))", "len(ts)")
          else {
            val gram = (0 until n).map(o => s"ts[i + $o]")
              .mkString(" || ' ' || ")
            (s"word_ngrams(split(text, ' '), $n)",
              s"""item AS (SELECT doc_id, $gram AS it
                  FROM base, LATERAL (SELECT unnest(range(1,
                    len(ts) - ${n - 2})) AS i) u)""",
              s"size(word_ngrams(split(text, ' '), $n))",
              s"CASE WHEN len(ts) >= $n THEN len(ts) - ${n - 1} ELSE 0 END")
          }
        val ctes =
          s"""$itemCte,
             |th AS (SELECT doc_id, ${fnvSql("it")} AS h FROM item),
             |bits AS (
             |  SELECT doc_id, b,
             |         SUM(CASE WHEN (h // CAST(2 ** b AS HUGEINT)) % 2 = 1
             |             THEN 1 ELSE -1 END) AS v
             |  FROM th, (SELECT unnest(generate_series(0, 63)) AS b) bs
             |  GROUP BY doc_id, b),
             |sim AS (
             |  SELECT doc_id, SUM(CASE WHEN v > 0 THEN CAST(2 ** b AS HUGEINT)
             |                     ELSE 0::HUGEINT END) AS sim_u
             |  FROM bits GROUP BY doc_id)""".stripMargin
        docCase("ksim", Seq(
          ("sh", s"simhash64($sparkToks)",
            signedSql("COALESCE(sim.sim_u, 0::HUGEINT)")),
          ("cnt", s"CAST($cntSpark AS BIGINT)",
            s"CAST($cntDuck AS BIGINT)")),
          ctes, "base LEFT JOIN sim USING (doc_id)")

      case 2 => // dhash64 over the token array (bigram-histogram bitmap)
        val ctes =
          """tk AS (SELECT doc_id,
            |              CAST(('0x' || substr(md5(ts[i] || ' ' || ts[i+1]),
            |                1, 4)) AS INT) % 72 AS g
            |       FROM base,
            |            LATERAL (SELECT unnest(generate_series(1,
            |              len(ts) - 1)) AS i) s
            |       WHERE len(ts) >= 2),
            |cnt AS (SELECT doc_id, g, COUNT(*) AS v FROM tk GROUP BY 1, 2),
            |cells AS (SELECT b0.doc_id, gs.g, COALESCE(c.v, 0) AS v
            |          FROM base b0
            |          CROSS JOIN (SELECT unnest(generate_series(0, 71)) AS g) gs
            |          LEFT JOIN cnt c ON c.doc_id = b0.doc_id AND c.g = gs.g),
            |bits AS (SELECT c1.doc_id, bs.b
            |         FROM (SELECT unnest(generate_series(0, 63)) AS b) bs
            |         JOIN cells c1 ON c1.g = bs.b + bs.b // 8
            |         JOIN cells c2 ON c2.doc_id = c1.doc_id
            |                      AND c2.g = bs.b + bs.b // 8 + 1
            |         WHERE c1.v < c2.v),
            |dh AS (SELECT b0.doc_id,
            |              COALESCE(SUM(CAST(2 ** bb.b AS HUGEINT)),
            |                0::HUGEINT) AS dh_u
            |       FROM base b0 LEFT JOIN bits bb ON bb.doc_id = b0.doc_id
            |       GROUP BY b0.doc_id)""".stripMargin
        docCase("kdhash", Seq(
          ("dh", "dhash64(split(text, ' '))", signedSql("dh.dh_u")),
          ("cnt", "CAST(size(split(text, ' ')) AS BIGINT)",
            "CAST(len(ts) AS BIGINT)")),
          ctes, "base JOIN dh USING (doc_id)")

      case 3 => // one random minhash_ngrams signature position
        val ng = 2 + r.nextInt(3)
        val k2 = Seq(8, 16, 32)(r.nextInt(3))
        val j = 1 + r.nextInt(k2)
        val gram = (0 until ng).map(o => s"ts[i + $o]")
          .mkString(" || ' ' || ")
        val ctes =
          s"""gram AS (SELECT doc_id, $gram AS g
             |         FROM base, LATERAL (SELECT unnest(range(1,
             |           len(ts) - ${ng - 2})) AS i) u),
             |gh AS (SELECT doc_id, ${fnvSql("g")} AS h FROM gram),
             |mx AS (${mix64ChainSql("doc_id",
                s"h + ${j - 1} * $prime::HUGEINT", "gh", "mixed")}),
             |smin AS (SELECT doc_id, MIN(${signedSql("mixed")}) AS mv
             |         FROM mx GROUP BY doc_id)""".stripMargin
        docCase("kminhash", Seq(
          ("mh", s"element_at(minhash_ngrams(split(text, ' '), $ng, $k2), $j)",
            "COALESCE(smin.mv, 9223372036854775807)")),
          ctes, "base LEFT JOIN smin USING (doc_id)")

      case _ => // vector kernels over embeddings
        val m = 5 + r.nextInt(7); val k = r.nextInt(m)
        val guard = s"((vec_id % $m) = $k)"
        def qeDuck(i: Int): String =
          s"CAST(FLOOR(CAST(q.embedding[$i] AS DOUBLE) * 1000000.0 + 0.5) " +
            "AS BIGINT)"
        val i0 = 1 + r.nextInt(64)
        val x0 = ("x0", s"element_at(vec_quantize6(embedding), $i0)",
          qeDuck(i0))
        val (x1, ctes, fromSql) = r.nextInt(3) match {
          case 0 =>
            val i1 = 1 + r.nextInt(64)
            (("x1", s"element_at(vec_quantize6(embedding), $i1)", qeDuck(i1)),
              "", "q")
          case 1 => // exact squared norm on the micro-unit lattice
            (("x1",
              "vec_dotq(vec_quantize6(embedding), vec_quantize6(embedding))",
              "sx.sxx"),
              """d AS (SELECT vec_id, CAST(FLOOR(CAST(x AS DOUBLE)
                |         * 1000000.0 + 0.5) AS BIGINT) AS xq
                |      FROM (SELECT vec_id, unnest(embedding) AS x FROM q) u),
                |sx AS (SELECT vec_id, CAST(SUM(xq * xq) AS BIGINT) AS sxx
                |       FROM d GROUP BY vec_id)""".stripMargin,
              "q JOIN sx USING (vec_id)")
          case _ => // one random lsh_buckets table
            val t = 2 + r.nextInt(3); val p = 4 + r.nextInt(5)
            val jt = 1 + r.nextInt(t)
            (("x1", s"element_at(lsh_buckets(embedding, $t, $p), $jt)",
              "b.bucket"),
              s"""dd AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                 |             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)
                 |               * 1000000.0 + 0.5) AS BIGINT) AS xq
                 |      FROM q),
                 |proj AS (SELECT vec_id, j2,
                 |                SUM(xq * (((${jt - 1} * $p + j2) * 2654435761
                 |                  + dim * 2246822519) % 251 % 7 - 3)) AS s
                 |         FROM dd, (SELECT unnest(range(0, $p)) AS j2) js
                 |         GROUP BY vec_id, j2),
                 |b AS (SELECT vec_id,
                 |             CAST(SUM(CASE WHEN s > 0 THEN (1 << j2)
                 |               ELSE 0 END) AS BIGINT) AS bucket
                 |      FROM proj GROUP BY vec_id)""".stripMargin,
              "q JOIN b USING (vec_id)")
        }
        val outs = Seq(x0, x1)
        val ordSql = ("vec_id" +: outs.map(_._1))
          .map(c => s"$c NULLS FIRST").mkString(", ")
        val ctesSql = if (ctes.isEmpty) "" else s",\n$ctes"
        val sql =
          s"""WITH q AS (SELECT vec_id, embedding FROM embeddings
             |           WHERE $guard)$ctesSql
             |SELECT vec_id, ${outs.map { case (n, _, d) =>
               s"$d AS $n" }.mkString(", ")}
             |FROM $fromSql
             |ORDER BY $ordSql""".stripMargin
        val build = (s: SparkSession, dir: String) =>
          graft.queries.Tables.load(s, dir, "embeddings")
            .filter(expr(guard))
            .select(col("vec_id") +: outs.map { case (n, sp, _) =>
              expr(sp).as(n) }: _*)
            .orderBy(("vec_id" +: outs.map(_._1))
              .map(c => col(c).asc_nulls_first): _*)
        FuzzCase(f"fz_$seed%04d_kvec", seed, "kvec", build, sql)
    }
  }

  /** Generate the case for one seed — shape weights: scan 2, agg 3,
    * join 3, window 2, union 1, kernel 3.
    */
  def gen(seed: Long): FuzzCase = {
    val r = new Random(seed * 0x9e3779b97f4a7c15L + GeneratorVersion)
    r.nextInt(14) match {
      case 0 | 1 => shapeScan(r, seed)
      case 2 | 3 | 4 => shapeAgg(r, seed)
      case 5 | 6 | 7 => shapeJoin(r, seed)
      case 8 | 9 => shapeWindow(r, seed)
      case 10 => shapeUnion(r, seed)
      case _ => shapeKernel(r, seed)
    }
  }

  def cases(seed0: Long, n: Int): Seq[FuzzCase] =
    (seed0 until seed0 + n).map(gen)

  /** java.util.Random has no Scala-style shuffle; small local one. */
  implicit private class RandomOps(val r: Random) {
    def shuffle[A](xs: List[A]): List[A] = {
      val a = xs.toBuffer
      var i = a.size - 1
      while (i > 0) {
        val j = r.nextInt(i + 1)
        val tmp = a(i); a(i) = a(j); a(j) = tmp
        i -= 1
      }
      a.toList
    }
  }
}
