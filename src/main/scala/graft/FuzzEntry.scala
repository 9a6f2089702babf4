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
    */
  val GeneratorVersion = 2

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

  /** Generate the case for one seed — shape weights: scan 2, agg 3,
    * join 3, window 2, union 1.
    */
  def gen(seed: Long): FuzzCase = {
    val r = new Random(seed * 0x9e3779b97f4a7c15L + GeneratorVersion)
    r.nextInt(11) match {
      case 0 | 1 => shapeScan(r, seed)
      case 2 | 3 | 4 => shapeAgg(r, seed)
      case 5 | 6 | 7 => shapeJoin(r, seed)
      case 8 | 9 => shapeWindow(r, seed)
      case _ => shapeUnion(r, seed)
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
