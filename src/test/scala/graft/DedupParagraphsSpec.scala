package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** Semantic pin for dedup_paragraphs (the oracle gate proves engine↔DuckDB
  * parity; this proves the REMOVAL semantics): on a constructed corpus of
  * known 16-token segments, exactly one copy of every duplicated segment
  * survives corpus-wide (the first by doc order, then in-doc position),
  * short tail segments count their true token length, and a doc whose
  * every segment occurred earlier is emptied, not dropped.
  */
class DedupParagraphsSpec extends SparkSuite {

  private def seg(p: String): String =
    (1 to 16).map(i => s"$p$i").mkString(" ")

  test("first occurrence survives, later copies (cross- and in-doc) are " +
      "cut, short tails keep their length") {
    val tmp = Files.createTempDirectory("graft-para").toString
    val A = seg("a"); val B = seg("b"); val C = seg("c")
    val D = seg("d"); val E = seg("e")
    val tail = "t1 t2 t3 t4 t5"
    val docs = Seq(
      (1L, s"$A $B"),    // both segments first seen here: all kept
      (2L, s"$A $C"),    // A is doc1's: only C survives
      (3L, s"$B $B"),    // both copies of B are later than doc1's: emptied
      (4L, s"$D $tail"), // unique 16-token segment + unique 5-token tail
      (5L, s"$E $E"))    // in-doc dup: first copy kept, second cut
    import spark.implicits._
    docs.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")

    val got = DedupQueries.queries("dedup_paragraphs")(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_paras"), r.getAs[Long]("kept_paras"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("kept_tokens"),
          r.getAs[String]("clean_text")))).toMap

    assert(got(1L) == ((2L, 2L, 32L, 32L, s"$A $B")))
    assert(got(2L) == ((2L, 1L, 32L, 16L, C)))
    assert(got(3L) == ((2L, 0L, 32L, 0L, "")))
    assert(got(4L) == ((2L, 2L, 21L, 21L, s"$D $tail")))
    assert(got(5L) == ((2L, 1L, 32L, 16L, E)))
    // exactly one survivor per distinct segment text
    assert(got.values.map(_._2).sum == 6L) // A B C D tail E
  }

  test("real-corpus invariants: one survivor per distinct segment, " +
      "kept ≤ total everywhere") {
    val dir = sf("sf0.001")
    val out = DedupQueries.queries("dedup_paragraphs")(spark, dir)
    val bad = out.filter(col("kept_paras") > col("n_paras") ||
      col("kept_tokens") > col("n_tokens")).count()
    assert(bad == 0)
    val kept = out.agg(sum("kept_paras")).head.getLong(0)
    val distinctSegs = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(explode(expr(
        "transform(sequence(0, cast((size(split(text, ' ')) + 15) div 16 " +
          "as int) - 1), k -> array_join(slice(split(text, ' '), " +
          "k * 16 + 1, 16), ' '))")).as("p"))
      .select(countDistinct(col("p"))).head.getLong(0)
    assert(kept == distinctSegs,
      s"kept $kept segments vs $distinctSegs distinct")
  }
}
