package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import graft.operators.{AsOf, RangeJoin}

/** AsOf.join and RangeJoin.aggWithin: semantics against a hand-computed
  * truth (boundary rows included/excluded as documented), and the scale
  * contract — as-of is one hash Exchange and NO join node; range join is a
  * banded equi-join, never a θ-join/cartesian plan.
  */
class TemporalSpec extends SparkSuite {
  import spark.implicits._

  private def probes = Seq(
    // (id, key, ts)
    (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 250L),
    (4L, "b", 50L), (5L, "b", 500L),
    (6L, "c", 10L) // key with no markers at all
  ).toDF("id", "k", "t")

  private def markers = Seq(
    // (key, ts, payload)
    ("a", 100L, 10.0), // exact-tie with probe 1 — must be visible to it
    ("a", 240L, 11.0),
    ("b", 60L, 20.0) // after probe 4, before probe 5
  ).toDF("k", "t", "v")

  test("AsOf.join: latest at-or-before marker per probe; exact ties " +
      "visible; no marker → null") {
    val got = AsOf.join(probes, markers, key = "k", ts = "t")
      .select($"id", $"asof.v".as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(
      1L -> Some(10.0), // marker at exactly t=100 counts
      2L -> Some(10.0), // 240 is after 200
      3L -> Some(11.0),
      4L -> None, // marker at 60 is after probe 4's t=50
      5L -> Some(20.0),
      6L -> None))
  }

  test("AsOf.join plan: one shuffle Exchange, zero join nodes") {
    val nodes = physicalNodes(AsOf.join(probes, markers, key = "k", ts = "t"))
    val shuffles = nodes.collect { case e: ShuffleExchangeLike => e }
    val joins = nodes.collect { case j: BaseJoinExec => j }
    assert(joins.isEmpty, s"as-of must not plan a join, got: $joins")
    assert(shuffles.size == 1,
      s"as-of needs exactly one shuffle, got ${shuffles.size}: $shuffles")
    assert(shuffles.head.toString.contains("hashpartitioning(k"),
      s"the single exchange must hash-partition on the key: ${shuffles.head}")
  }

  test("RangeJoin.aggWithin: [lts - w, lts) boundaries exact, band " +
      "crossings included, inner semantics") {
    // width 100: probe at t wants right rows in [t-100, t)
    val l = Seq((1L, "a", 250L), (2L, "a", 1000L), (3L, "b", 120L))
      .toDF("id", "k", "t")
    val r = Seq(
      ("a", 150L, 1.0), // == 250-100 → included (closed lower bound)
      ("a", 249L, 2.0), // included; band 2 vs probe band 2
      ("a", 250L, 4.0), // == lts → excluded (open upper bound)
      ("a", 910L, 8.0), // band 9, probe 2 in band 10 — crossing included
      ("b", 10L, 16.0), // 120-100=20 > 10 → excluded
      ("b", 30L, 32.0) // included for probe 3 (band 0 → band 1 crossing)
    ).toDF("k", "rt", "rv")
    val got = RangeJoin.aggWithin(l, r, key = "k", lts = "t", rts = "rt",
        widthMicros = 100L, groupCols = Seq("id"),
        aggs = Seq(sum($"rv").as("s"), count(lit(1)).as("n")))
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getLong(2))).toSet
    assert(got == Set((1L, 3.0, 2L), (2L, 8.0, 1L), (3L, 32.0, 1L)))
  }

  test("RangeJoin.aggWithin plan: banded equi-join — no cartesian/" +
      "nested-loop, join keys include the band") {
    val l = Seq((1L, "a", 250L)).toDF("id", "k", "t")
    val r = Seq(("a", 150L, 1.0)).toDF("k", "rt", "rv")
    val nodes = physicalNodes(RangeJoin.aggWithin(l, r, key = "k", lts = "t",
      rts = "rt", widthMicros = 100L, groupCols = Seq("id"),
      aggs = Seq(count(lit(1)).as("n"))))
    assert(nodes.collect { case c: CartesianProductExec => c }.isEmpty,
      "θ-join planned: cartesian product")
    assert(nodes.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "θ-join planned: broadcast nested loop")
    val joins = nodes.collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty, "expected an equi-join node")
    assert(joins.forall(_.toString.contains("__band")),
      s"band key missing from the join: $joins")
  }

  test("AsOf.join rejects reserved-name collisions on either side") {
    intercept[IllegalArgumentException] {
      AsOf.join(probes.withColumn("asof", lit(1)), markers, "k", "t")
    }
    intercept[IllegalArgumentException] {
      AsOf.join(probes, markers.withColumn("__side", lit(1)), "k", "t")
    }
  }

  test("AsOf.join: several markers at the same (key, ts) resolve " +
      "deterministically to the largest payload") {
    val dup = Seq(("a", 100L, 10.0), ("a", 100L, 99.0), ("a", 100L, 7.0))
      .toDF("k", "t", "v")
    // Repeat to catch nondeterminism that only shows up across plans/runs.
    (1 to 3).foreach { _ =>
      val got = AsOf.join(probes.filter($"id" === 1L), dup, "k", "t")
        .select($"asof.v").as[Double].collect().toSeq
      assert(got == Seq(99.0))
    }
  }

  test("AsOf.join rejects a map-typed payload it cannot tie-break") {
    val mapped = markers.withColumn("m", map(lit("x"), $"v")).drop("v")
    intercept[IllegalArgumentException] {
      AsOf.join(probes, mapped, "k", "t")
    }
  }

  test("RangeJoin rejects ts-name shadowing across sides, internal-name " +
      "collisions, and empty aggs") {
    val l = Seq((1L, "a", 1L)).toDF("id", "k", "t")
    val r = Seq(("a", 1L, 1.0)).toDF("k", "rt", "rv")
    intercept[IllegalArgumentException] { // right side carries lts name
      RangeJoin.aggWithin(l, r.withColumn("t", lit(1L)), "k", "t", "rt",
        100L, Seq("id"), Seq(count(lit(1))))
    }
    intercept[IllegalArgumentException] { // left side carries rts name
      RangeJoin.aggWithin(l.withColumn("rt", lit(1L)), r, "k", "t", "rt",
        100L, Seq("id"), Seq(count(lit(1))))
    }
    intercept[IllegalArgumentException] { // reserved internal name
      RangeJoin.aggWithin(l.withColumn("__band", lit(1L)), r, "k", "t", "rt",
        100L, Seq("id"), Seq(count(lit(1))))
    }
    intercept[IllegalArgumentException] { // no aggregates
      RangeJoin.aggWithin(l, r, "k", "t", "rt", 100L, Seq("id"), Seq.empty)
    }
  }

  test("RangeJoin rejects identical ts names and non-positive widths") {
    val d = Seq((1L, "a", 1L)).toDF("id", "k", "t")
    intercept[IllegalArgumentException] {
      RangeJoin.aggWithin(d, d, "k", "t", "t", 100L, Seq("id"), Seq(count(lit(1))))
    }
    intercept[IllegalArgumentException] {
      RangeJoin.aggWithin(d, d.withColumnRenamed("t", "rt"), "k", "t", "rt",
        0L, Seq("id"), Seq(count(lit(1))))
    }
  }

  test("AsOf.join matches a θ-join + max_by reference on real events data") {
    val ev = graft.operators.EventsCdc
      .normalizeTs(spark.read.parquet(sf("sf0.001") + "/events.parquet"))
      .withColumn("tus", unix_micros($"ts"))
      .select($"event_id", $"user_id", $"tus", $"event_type", $"value")
    val marks = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"tus")
      .agg(expr("max_by(value, event_id)").as("pv"))
    val fast = AsOf.join(ev, marks.withColumn("ptus", $"tus"),
        key = "user_id", ts = "tus")
      .select($"event_id", $"asof.pv".as("pv"), $"asof.ptus".as("ptus"))
    // naive truth: θ-join + latest marker per event
    val slow = ev.as("e").join(marks.as("m"),
        $"e.user_id" === $"m.user_id" && $"m.tus" <= $"e.tus", "left")
      .groupBy($"e.event_id".as("event_id"))
      .agg(expr("max_by(struct(m.tus, m.pv), m.tus)").as("top"))
      .select($"event_id", $"top.pv".as("pv"), $"top.tus".as("ptus"))
    assert(fast.count() == ev.count())
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("value sketch: lattice percentiles land within one cent bucket of " +
      "the exact order statistics, deterministically") {
    val dir = sf("sf0.001")
    val approx = graft.queries.TemporalQueries
      .queries("events_value_sketch")(spark, dir).collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = spark.read.parquet(s"$dir/events.parquet")
      .select($"event_type", $"value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    assert(approx.keySet == exact.keySet)
    val targets = Seq(0.5, 0.9, 0.99)
    exact.foreach { case (t, sorted) =>
      val n = sorted.length
      targets.zip(approx(t)).foreach { case (q, a) =>
        // The sketch's contract: the estimate is the lower cent-bucket
        // edge of the exact rank-ceil(q·n) value (percentile_disc), so
        // 0 <= disc − approx < 0.01 (+ float-edge epsilon).
        val disc = sorted(math.ceil(q * n).toInt - 1)
        assert(disc - a >= -1e-9 && disc - a < 0.01 + 1e-9,
          s"$t q=$q: approx $a vs exact disc $disc of n=$n")
      }
    }
    val again = graft.queries.TemporalQueries
      .queries("events_value_sketch")(spark, dir).collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(again == approx, "sketch must be deterministic across runs")
  }

  test("events_funnel: stage counts are monotone and each converted user " +
      "really has the ordered click -> purchase -> signup sequence") {
    val dir = sf("sf0.001")
    val row = graft.queries.TemporalQueries
      .queries("events_funnel")(spark, dir).head()
    val (nUsers, n1, n2, n3) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    assert(nUsers >= n1 && n1 >= n2 && n2 >= n3, row.toString)
    assert(n3 > 0, "sf0.001 should contain full-funnel conversions")
    // independent truth: per-user ordered scan on the driver (test-only)
    val events = graft.operators.EventsCdc
      .normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
      .withColumn("tus", unix_micros($"ts"))
      .select($"user_id", $"event_id", $"tus", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val perUser = events.groupBy(_._1).map { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      var t1 = Long.MaxValue; var t2 = Long.MaxValue; var t3 = Long.MaxValue
      ordered.foreach { case (_, _, ts, tp) =>
        if (tp == "click") t1 = math.min(t1, ts)
        if (tp == "purchase" && t1 < ts) t2 = math.min(t2, ts)
        if (tp == "signup" && t2 < ts) t3 = math.min(t3, ts)
      }
      u -> (t1 != Long.MaxValue, t2 != Long.MaxValue, t3 != Long.MaxValue)
    }
    assert(n1 == perUser.count(_._2._1))
    assert(n2 == perUser.count(_._2._2))
    assert(n3 == perUser.count(_._2._3))
  }
}
