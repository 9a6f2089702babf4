package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** Pins text_bpe_train (the iterative BPE merge-table learner) bit-exact
  * against a naive single-node reference trainer — the standard Sennrich
  * et al. 2016 algorithm run directly on collected word counts.
  */
class BpeTrainSpec extends SparkSuite {

  /** Reference trainer: word counts → K (rank, l, r, merged, cnt) merges.
    * Greedy leftmost merge application (identical semantics to the
    * query's fold: merge when the accumulated tail equals l and the next
    * raw symbol equals r).
    */
  private def referenceTrain(
      words: Map[String, Long], k: Int): Seq[(Long, String, String, String, Long)] = {
    var syms: Map[List[String], Long] =
      words.toSeq.groupBy(_._1.split("").toList)
        .view.mapValues(_.map(_._2).sum).toMap
    val out = mutable.Buffer.empty[(Long, String, String, String, Long)]
    for (r <- 1 to k) {
      val pairCnt = mutable.Map.empty[(String, String), Long]
      syms.foreach { case (sy, c) =>
        sy.zip(sy.drop(1)).foreach { p =>
          pairCnt(p) = pairCnt.getOrElse(p, 0L) + c
        }
      }
      if (pairCnt.nonEmpty) {
        val ((l, rr), c) = pairCnt.toSeq
          .sortBy { case ((l, rr), c) => (-c, l, rr) }.head
        out += ((r.toLong, l, rr, l + rr, c))
        val m = l + rr
        syms = syms.toSeq.map { case (sy, cnt) =>
          val acc = mutable.ListBuffer.empty[String]
          sy.foreach { x =>
            if (acc.nonEmpty && acc.last == l && x == rr) {
              acc.remove(acc.size - 1); acc += m
            } else acc += x
          }
          (acc.toList, cnt)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    out.toSeq
  }

  test("text_bpe_train matches the reference trainer on real testdata") {
    val got = TextQueries.queries("text_bpe_train")(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val words = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceTrain(words, TextQueries.BpeMerges)
    assert(got == want)
    assert(got.size == TextQueries.BpeMerges, "vacuous: trainer ran dry")
  }

  test("merge application is leftmost-greedy: 'aaa' under (a,a) becomes " +
      "[aa, a], and learned symbols compose across rounds") {
    // corpus of one word "aaa" ×3: round 1 must merge (a,a) with count 6
    // (two adjacent pairs per word), leaving [aa, a]; round 2 merges
    // (aa, a) with count 3.
    val ref = referenceTrain(Map("aaa" -> 3L), 2)
    assert(ref == Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "aa", "a", "aaa", 3L)))
  }

  test("trainer references learned symbols (a multi-round merge chain " +
      "exists in the real corpus output)") {
    val got = TextQueries.queries("text_bpe_train")(spark, sf("sf0.001"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    val produced = got.map(_._3).toSet
    assert(got.exists { case (l, r, _) =>
      produced.contains(l) || produced.contains(r) },
      s"no merge built on an earlier merge — suspicious for BPE: $got")
  }
}
