package graft

import scala.util.Random

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.functions._
import graft.operators.Pack

/** Pack.runningTotal / packShards: exact semantics against a driver-side
  * cumsum, the reserved-name guards, and the scale contract — NO
  * single-partition exchange anywhere in the plan (the whole point vs the
  * naive global window).
  */
class PackSpec extends SparkSuite {
  import spark.implicits._

  private def data(n: Int, seed: Int) = {
    val rnd = new Random(seed)
    // non-contiguous, shuffled keys so range partitioning actually works
    rnd.shuffle((0 until n).map(i => (i.toLong * 7 + 3, rnd.nextInt(500).toLong)))
  }

  test("runningTotal matches a driver-side cumsum across partitions") {
    val rows = data(500, 1)
    val got = Pack.runningTotal(rows.toDF("k", "v"), "k", "v", "run")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (k, v) => acc += v; k -> acc }.toMap
    assert(got == want)
  }

  test("packShards: shard = running-before DIV budget, never splits a row") {
    val rows = Seq((1L, 600L), (2L, 600L), (3L, 600L), (4L, 100L), (5L, 2000L))
    val got = Pack.packShards(rows.toDF("k", "v"), "k", "v", budget = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // running-before: 0, 600, 1200, 1800, 1900 → shards 0,0,1,1,1
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("plan has no single-partition exchange (the global-window trap)") {
    val nodes = physicalNodes(
      Pack.runningTotal(data(300, 2).toDF("k", "v"), "k", "v", "run"))
    val single = nodes.collect {
      case e: ShuffleExchangeLike if e.outputPartitioning == SinglePartition => e
    }
    assert(single.isEmpty, s"single-partition exchange planned: $single")
  }

  test("rejects reserved/output name collisions and bad budgets") {
    val d = Seq((1L, 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Pack.runningTotal(d.withColumn("__pid", lit(1)), "k", "v", "run")
    }
    intercept[IllegalArgumentException] {
      Pack.runningTotal(d.withColumn("run", lit(1)), "k", "v", "run")
    }
    intercept[IllegalArgumentException] {
      Pack.packShards(d, "k", "v", budget = 0L)
    }
  }
}
