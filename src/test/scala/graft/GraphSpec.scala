package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** ConnectedComponents: exact semantics against a driver-side union-find on
  * hand-built and randomized graphs, the messy-input normalizations
  * (self-loops, duplicate/reversed edges), and the convergence contract
  * (long path = worst case for min-propagation, must finish in O(log² n)
  * rounds).
  */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  /** Runs BOTH execution paths (driver union-find fast path and the
    * distributed large-star/small-star alternation, forced via
    * driverBound = 0) and asserts they agree before returning — every
    * graph in this suite pins the adaptive cutover's result identity.
    */
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val fast = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = ConnectedComponents
      .run(edges.toDF("a", "b"), "a", "b", driverBound = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist,
      s"fast-path/distributed divergence: ${fast.toSet.diff(dist.toSet)} " +
        s"vs ${dist.toSet.diff(fast.toSet)}")
    dist
  }

  /** Driver-side truth: path-compressed union-find, component = min id. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("path, star, and disjoint components resolve to the min id") {
    assert(cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
    assert(cc(Seq((10L, 7L), (10L, 8L), (10L, 9L))) ==
      Map(7L -> 7L, 8L -> 7L, 9L -> 7L, 10L -> 7L))
  }

  test("self-loops, duplicates, and reversed edges normalize away") {
    assert(cc(Seq((1L, 1L), (2L, 1L), (1L, 2L), (2L, 1L), (3L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L))
    assert(cc(Seq.empty[(Long, Long)]) == Map.empty)
  }

  test("cycle plus bridge merges into one component") {
    assert(cc(Seq((4L, 5L), (5L, 6L), (6L, 4L), (6L, 1L), (1L, 2L))) ==
      Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("matches union-find on randomized graphs") {
    val rnd = new Random(42)
    (1 to 5).foreach { _ =>
      val n = 50 + rnd.nextInt(150)
      val edges = Seq.fill(2 * n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(cc(edges) == unionFind(edges))
    }
  }

  test("500-node path (worst case for naive propagation) converges " +
      "within the O(log² n) round budget") {
    val edges = (0L until 499L).map(i => (i, i + 1))
    // shuffle edge order so convergence can't lean on input order
    val got = cc(new Random(7).shuffle(edges))
    assert(got == (0L to 499L).map(_ -> 0L).toMap)
  }
}
