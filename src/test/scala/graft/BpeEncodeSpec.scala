package graft

import org.apache.spark.sql.functions._
import graft.functions.BpeImpl
import graft.queries.TextQueries

/** Pins the native bpe_apply encoder and the text_bpe_encode query. */
class BpeEncodeSpec extends SparkSuite {

  private def ranksOf(pairs: Seq[(String, String)]) = {
    val m = new java.util.HashMap[String, Integer]()
    pairs.zipWithIndex.foreach { case ((l, r), i) =>
      m.put(l + " " + r, Integer.valueOf(i))
    }
    m
  }

  private def enc(w: String, pairs: Seq[(String, String)]): Seq[String] = {
    val a = BpeImpl.encode(
      org.apache.spark.unsafe.types.UTF8String.fromString(w), ranksOf(pairs))
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  test("encode applies merges lowest-rank-first with leftmost-greedy " +
      "occurrence merging") {
    // rank 0 = (a,a), rank 1 = (aa,b)
    // "aab": (a,a) → [aa, b], then (aa,b) → [aab]
    assert(enc("aab", Seq(("a", "a"), ("aa", "b"))) == Seq("aab"))
    // "aaab": (a,a) leftmost-greedy → [aa, a, b]; remaining pairs
    // (aa,a) and (a,b) are unranked → settled
    assert(enc("aaab", Seq(("a", "a"), ("aa", "b"))) == Seq("aa", "a", "b"))
    // rank order beats position: (b,c) ranked below (a,b) merges first
    assert(enc("abc", Seq(("b", "c"), ("a", "b"))) == Seq("a", "bc"))
  }

  test("encode equals the trainer's in-order fold chain on every corpus " +
      "word (two independent algorithms, same segmentation)") {
    val merges = TextQueries.queries("text_bpe_train")(spark, sf("sf0.001"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val words = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0))
    assert(words.nonEmpty)
    for (w <- words) {
      // reference: apply each merge in learned order with the greedy fold
      var syms = w.split("").toList
      for ((l, r) <- merges) {
        val acc = scala.collection.mutable.ListBuffer.empty[String]
        syms.foreach { x =>
          if (acc.nonEmpty && acc.last == l && x == r) {
            acc.remove(acc.size - 1); acc += (l + r)
          } else acc += x
        }
        syms = acc.toList
      }
      assert(enc(w, merges) == syms, s"word '$w'")
    }
  }

  test("segmentation is lossless: concatenated tokens rebuild the word") {
    val merges = Seq(("e", "r"), ("t", "h"), ("th", "e"))
    for (w <- Seq("there", "her", "the", "x", "", "thethe")) {
      assert(enc(w, merges).mkString == w)
    }
  }

  test("text_bpe_encode: counts are consistent (1 ≤ n_bpe ≤ n_chars unless " +
      "empty) and the query is deterministic") {
    val rows = TextQueries.queries("text_bpe_encode")(spark, sf("sf0.001"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nc, nb) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nb >= nw, s"fewer BPE tokens than words: $r")
      assert(nb <= nc, s"more BPE tokens than chars: $r")
    }
    val again = TextQueries.queries("text_bpe_encode")(spark, sf("sf0.001"))
      .collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
