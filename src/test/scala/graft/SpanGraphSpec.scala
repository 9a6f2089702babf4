package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, SimilarityQueries}

/** Pins for the operators that complete the exact-substring dedup story
  * (span REMOVAL — the cut step over dedup_span_detect's signal) and the
  * graph side of similarity search (corpus-wide kNN graph): cross-query
  * consistency and structural invariants the bit-exact oracle rows can't
  * state directly.
  */
class SpanGraphSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("span removal: keeps every doc, never grows one, and leaves " +
      "span-free docs byte-identical") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = DedupQueries.queries("dedup_span_removal")(spark, dir)
    assert(out.count() == docs.count())
    assert(out.filter(col("kept_tokens") > col("n_tokens")).count() == 0)
    val joined = out.join(docs.select(col("doc_id"), col("text")), "doc_id")
    assert(joined.filter(col("kept_tokens") === col("n_tokens"))
      .filter(col("clean_text") =!= col("text")).count() == 0,
      "a doc with zero covered tokens must come back verbatim")
    // the fixture corpus contains repeated spans — removal must bite
    assert(joined.filter(col("kept_tokens") < col("n_tokens")).count() > 0)
  }

  test("span removal semantics on a synthetic corpus: exact dup cut to " +
      "nothing, shared span cut from both, unique doc untouched") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("span-rm").toString
    val t10 = (1 to 10).map(i => s"w$i").mkString(" ") // 10 shared tokens
    Seq(
      (1L, t10), // exact dup of 2 → fully covered
      (2L, t10),
      (3L, s"alpha beta $t10 gamma"), // contains the shared span + extras
      (4L, "lone doc with fewer than eight distinct tokens"),
      (5L, "u1 u2 u3 u4 u5 u6 u7 u8 u9") // unique 9-gram doc, untouched
    ).toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val out = DedupQueries.queries("dedup_span_removal")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((10L, 0L, "")) && out(2L) == ((10L, 0L, "")),
      s"exact dups must be fully cut: ${out(1L)}, ${out(2L)}")
    // doc 3: the 10 shared tokens are covered (every one of its grams
    // inside t10 also occurs in docs 1/2); alpha/beta/gamma survive only
    // where no duplicated 8-gram covers them. Its grams overlapping the
    // prefix/suffix are unique to doc 3, so exactly t10 is removed.
    assert(out(3L) == ((13L, 3L, "alpha beta gamma")), s"got ${out(3L)}")
    assert(out(4L)._3 == "lone doc with fewer than eight distinct tokens")
    assert(out(5L) == ((9L, 9L, "u1 u2 u3 u4 u5 u6 u7 u8 u9")))
  }

  test("span removal ≡ independent local reference on seeded random " +
      "corpora (heavy token reuse + grafted shared spans)") {
    import spark.implicits._
    val L = 8
    def reference(docs: Seq[(Long, String)])
        : Map[Long, (Long, Long, String)] = {
      val toksOf = docs.map { case (id, t) =>
        id -> t.split(" ", -1).toSeq
      }.toMap
      val gramsOf = toksOf.view.mapValues(ts =>
        (0 to ts.length - L).map(i => ts.slice(i, i + L).mkString(" ")))
        .toMap
      val dup = gramsOf.toSeq
        .flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
        .groupBy(_._1).collect {
          case (g, xs) if xs.map(_._2).distinct.size >= 2 => g
        }.toSet
      docs.map { case (id, _) =>
        val ts = toksOf(id)
        val covered = gramsOf(id).zipWithIndex
          .collect { case (g, i) if dup(g) => i until (i + L) }
          .flatten.toSet
        val kept = ts.zipWithIndex
          .collect { case (tok, i) if !covered(i) => tok }
        id -> (ts.length.toLong, kept.length.toLong, kept.mkString(" "))
      }.toMap
    }
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val words = Vector("aa", "bb", "cc", "dd", "ee")
      val base = (0 until 12).map { i =>
        (i.toLong,
          Seq.fill(rnd.between(1, 24))(words(rnd.nextInt(words.size))))
      }
      // graft shared spans: copy a slice of one doc into another so some
      // (but not all) grams duplicate across docs
      val grafted = base.map { case (id, ts) =>
        if (id % 3 == 2 && ts.length > L) {
          val src = base((id.toInt + 1) % base.length)._2
          val take = math.min(src.length, L + rnd.nextInt(4))
          (id, ts.take(rnd.nextInt(ts.length)) ++ src.take(take))
        } else (id, ts)
      }
      val docs = grafted.map { case (id, ts) => (id, ts.mkString(" ")) }
      val tmp = java.nio.file.Files
        .createTempDirectory(s"span-prop-$seed").toString
      docs.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
      val got = graft.queries.DedupQueries
        .queries("dedup_span_removal")(spark, tmp)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      val want = reference(docs)
      assert(got == want,
        s"seed $seed mismatch: ${got.toSet.diff(want.toSet)} vs " +
          s"${want.toSet.diff(got.toSet)}")
    }
  }

  test("knn graph: ranks consecutive from 1, cos non-increasing in rank, " +
      "≤ k edges per node, mutual ≡ reverse edge present") {
    val g = SimilarityQueries.queries("sim_knn_graph")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(g.nonEmpty)
    val edges = g.map { case (v, _, n, _, _) => (v, n) }.toSet
    g.groupBy(_._1).foreach { case (v, es) =>
      val byRank = es.sortBy(_._2)
      assert(byRank.length <= 5, s"node $v has ${byRank.length} edges")
      assert(byRank.map(_._2).toSeq == (1L to byRank.length).toSeq,
        s"ranks not consecutive for $v")
      val cs = byRank.map(_._4).toSeq
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"cos increases along ranks for $v")
    }
    g.foreach { case (v, _, n, _, m) =>
      assert(m == edges.contains((n, v)), s"mutual flag wrong on ($v,$n)")
    }
  }

  test("graph clusters: mutual edges share a community, representatives " +
      "are component minima, non-mutual vectors self-cluster") {
    val g = SimilarityQueries.queries("sim_knn_graph")(spark, dir)
      .filter(col("mutual")).select("vec_id", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(g.nonEmpty, "fixture should produce mutual edges")
    val cl = SimilarityQueries.queries("sim_graph_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cl.size ==
      spark.read.parquet(s"$dir/embeddings.parquet").count())
    assert(cl.forall { case (v, c) => c <= v }, "rep must be a minimum")
    g.foreach { case (a, b) =>
      assert(cl(a) == cl(b), s"mutual edge ($a,$b) straddles communities")
    }
    val inMutual = g.flatMap { case (a, b) => Seq(a, b) }.toSet
    cl.foreach { case (v, c) =>
      if (!inMutual(v)) assert(c == v, s"non-mutual $v not a singleton")
    }
  }

  test("autoPlanes sizing rule: floor 6 at gate-SF corpus counts, grows " +
      "one plane per corpus doubling, monotonic, capped at 24") {
    import SimilarityQueries.autoPlanes
    // gate SFs (500 / 2000 vectors) must keep the committed 6-plane shape
    assert(autoPlanes(500) == 6)
    assert(autoPlanes(2000) == 6)
    assert(autoPlanes(2048) == 6) // boundary: 2^6 * 32 = 2048
    assert(autoPlanes(2049) == 7)
    // the sf1 / sf10 replica corpora
    assert(autoPlanes(20000) == 10)
    assert(autoPlanes(200000) == 13)
    // monotonic in corpus size, hard cap at 24
    val ps = Seq(1L, 100L, 10000L, 1000000L, 100000000L, Long.MaxValue)
      .map(autoPlanes)
    assert(ps == ps.sorted, s"not monotonic: $ps")
    assert(ps.last == 24)
  }

  test("knn graph plane knob: non-default (tables, planes, cap, k) run " +
      "keeps the structural contract — the scale knob is live code") {
    val g = SimilarityQueries
      .knnGraphEdges(spark, dir, tables = 4, planes = 8, cap = 100, k = 3)
      .collect()
    assert(g.nonEmpty, "8-plane graph should still retrieve neighbors")
    g.groupBy(_.getLong(0)).foreach { case (v, es) =>
      assert(es.length <= 3, s"node $v exceeds k=3")
      val ranks = es.map(_.getLong(1)).sorted.toSeq
      assert(ranks == (1L to es.length).toSeq)
    }
  }

  test("knn graph recall@5 vs brute force on the query panel") {
    val brute = SimilarityQueries.queries("sim_knn_brute")(spark, dir)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val graph = SimilarityQueries.queries("sim_knn_graph")(spark, dir)
      .filter(col("vec_id") < 10)
      .select("vec_id", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val recalls = brute.map { case (q, bs) =>
      graph.getOrElse(q, Set.empty[Long]).intersect(bs).size.toDouble /
        bs.size
    }
    val mean = recalls.sum / recalls.size
    // same bound class as the sim_knn_lsh pin (≥0.2): 4 tables × 6 planes
    // on 64-dim data retrieves partial-but-real neighborhoods; the graph
    // additionally recovers edges through symmetrization (measured 0.32
    // at sf0.001 vs 0.2x for the one-sided query LSH).
    assert(mean >= 0.25, s"mean graph recall@5 $mean")
  }
}
