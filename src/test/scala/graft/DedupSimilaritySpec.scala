package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, SimilarityQueries}

/** Recall/quality pins for the approximate (rows-only-checked) operators:
  * the LSH candidate generators must find what the exact methods find.
  */
class DedupSimilaritySpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("MinHash banding recall: finds every exact-Jaccard ≥ 0.7 pair") {
    val exact = DedupQueries.queries("dedup_ngram_jaccard")(spark, dir)
      .filter(col("jaccard") >= 0.7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = DedupQueries.queries("dedup_minhash_pairs")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain near-dup pairs")
    val recall = exact.intersect(cand).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall; missed ${exact.diff(cand)}")
  }

  test("incremental probe ≡ batch generator restricted to cross-side " +
      "pairs: same buckets, same signatures, same estimates") {
    // the batch path over the full corpus, pairs relabeled by which side
    // each doc falls on under the md5 delta tag
    val tag = graft.queries.DedupQueries.queries
    val isDelta = (id: Column) => conv(substring(md5(concat(lit("delta:"),
      id.cast("string"))), 1, 2), 16, 10).cast("int") < 26
    val batch = tag("dedup_minhash_pairs")(spark, dir)
      .withColumn("a_delta", isDelta(col("doc_a")))
      .withColumn("b_delta", isDelta(col("doc_b")))
      .filter(col("a_delta") =!= col("b_delta")) // exactly one side new
      .select(
        when(col("a_delta"), col("doc_a")).otherwise(col("doc_b"))
          .as("delta_id"),
        when(col("a_delta"), col("doc_b")).otherwise(col("doc_a"))
          .as("base_id"),
        col("est_jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val incr = tag("dedup_incremental_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incr == batch,
      s"only-incremental=${incr.diff(batch)} only-batch=${batch.diff(incr)}")
  }

  test("SimHash banding finds the high-similarity pairs too") {
    val exact = DedupQueries.queries("dedup_ngram_jaccard")(spark, dir)
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = DedupQueries.queries("dedup_simhash_pairs")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(cand).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall; missed ${exact.diff(cand)}")
  }

  test("containment finds subset-duplicates Jaccard misses (and agrees " +
      "with Jaccard on the symmetric pairs)") {
    // The gated corpus has no asymmetric near-dups (containment set ==
    // jaccard set there — both 25 pairs at sf0.01), so the distinguishing
    // semantics are pinned on a constructed fixture: a short doc embedded
    // verbatim in a much longer one.
    val dir = java.nio.file.Files.createTempDirectory("contain").toString
    val passage =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val filler = (1 to 60).map(i => s"filler$i").mkString(" ")
    val near1 = "one two three four five six seven eight nine ten"
    val near2 = "one two three four five six seven eight nine zzz"
    val rows = Seq(
      (1L, s"$filler $passage", "en", "src0"),
      (2L, passage, "en", "src0"),
      (3L, near1, "en", "src0"),
      (4L, near2, "en", "src0"))
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")

    val cont = DedupQueries.queries("dedup_containment_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val jacc = DedupQueries.queries("dedup_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Subset-dup: every shingle of doc 2 occurs in doc 1, so containment
    // is 1.0 — but the union is dominated by doc 1's filler, so Jaccard
    // sits at ~8/67 and the pair is invisible to the Jaccard query.
    assert(cont.contains((1L, 2L)), s"containment missed the subset dup: $cont")
    assert(!jacc.contains((1L, 2L)), s"jaccard should miss the subset dup: $jacc")
    // Symmetric near-dup (9/10 tokens shared): both metrics agree.
    assert(cont.contains((3L, 4L)) && jacc.contains((3L, 4L)))
  }

  test("span detection finds the repeated 8-token span with its first " +
      "position, and short docs are span-free (not a crash)") {
    val dir = java.nio.file.Files.createTempDirectory("spans").toString
    val span = "s1 s2 s3 s4 s5 s6 s7 s8"
    val rows = Seq(
      (1L, s"pre1 pre2 $span post1", "en", "src0"),   // span at pos 3
      (2L, s"$span tail1 tail2 tail3", "en", "src0"), // span at pos 1
      (3L, "too short for spans", "en", "src0"))      // 4 tokens: no spans
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")

    val out = DedupQueries.queries("dedup_span_detect")(spark, dir).collect()
    // Only the shared span repeats across >=2 docs on this fixture.
    assert(out.length == 1, out.mkString("; "))
    val r = out.head
    assert(r.getString(0) == span)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L) // n_occ, n_docs
    assert(r.getLong(3) == 1L && r.getLong(4) == 3L) // first_doc, first_pos
  }

  test("span detection matches a naive in-memory reference on randomized " +
      "tie-rich corpora") {
    // Tiny vocabulary so identical 8-token spans actually recur across
    // docs and (n_docs, n_occ) ties exercise the gram tie-break. Seeded:
    // deterministic, not flaky.
    import spark.implicits._
    for (seed <- Seq(1, 2, 7)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "dd", "e")
      val docs = (0 until 40).map { id =>
        val n = rnd.nextInt(31)
        (id.toLong, Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "), "en", "src0")
      }
      val dir = java.nio.file.Files.createTempDirectory(s"spanprop$seed")
        .toString
      docs.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.parquet(s"$dir/documents.parquet")

      val naive = docs.flatMap { case (id, text, _, _) =>
        val t = text.split(' ')
        if (text.isEmpty || t.length < 8) Nil
        else (0 to t.length - 8).map(i =>
          (t.slice(i, i + 8).mkString(" "), id, i + 1L))
      }
        .groupBy(_._1).toSeq
        .map { case (gram, occ) =>
          val enc = occ.map { case (_, id, pos) => id * 1000000L + pos }.min
          (gram, occ.size.toLong, occ.map(_._2).distinct.size.toLong,
            enc / 1000000L, enc % 1000000L)
        }
        .filter(_._3 >= 2)
        .sortBy { case (gram, nOcc, nDocs, _, _) => (-nDocs, -nOcc, gram) }
        .take(100)

      val got = DedupQueries.queries("dedup_span_detect")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(got == naive,
        s"seed $seed: got ${got.take(5)}... want ${naive.take(5)}...")
    }
  }

  test("leak-proof split: near-dup clusters never straddle splits, " +
      "every doc assigned exactly once, proportions near 80/10/10") {
    val out = DedupQueries.queries("dedup_split_leakproof")(spark, dir)
    val rows = out.collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == nDocs, "one split row per document")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    // The leakage guard: a cluster maps to exactly ONE split — so a
    // training near-copy of an eval doc is impossible by construction.
    val perCluster = out.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n")).agg(max("n")).head.getLong(0)
    assert(perCluster == 1L, "a near-dup cluster straddled splits")
    val frac = rows.groupBy(_.getString(2)).view.mapValues(
      _.length.toDouble / rows.length).toMap
    assert(frac("train") > 0.70 && frac("train") < 0.90, s"train=$frac")
    assert(frac("val") > 0.04 && frac("test") > 0.04, s"holdout=$frac")
  }

  private def knnPairs(name: String) =
    SimilarityQueries.queries(name)(spark, dir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("CDC chunking: high-Jaccard near-dup pairs share a large chunk " +
      "fraction (offset-shift robustness fixed windows lack)") {
    import org.apache.spark.sql.functions._
    val pairs = DedupQueries.queries("dedup_ngram_jaccard")(spark, dir)
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "sf0.001 contains high-Jaccard pairs")
    val chunks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), expr("cdc_chunks(text, 5)").as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val overlaps = pairs.map { case (a, b) =>
      val (ca, cb) = (chunks(a), chunks(b))
      ca.intersect(cb).size.toDouble / math.min(ca.size, cb.size)
    }
    val mean = overlaps.sum / overlaps.length
    assert(mean >= 0.3,
      s"near-dups should share chunks: mean overlap $mean")
    // and the corpus-level query runs, bounded, with sane counts
    val rows = DedupQueries.queries("dedup_cdc_chunks")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(n >= 2 && n <= 64 && r.getAs[Long]("n_hits") >= n)
    }
  }

  test("filtered kNN: every neighbor shares the query's label, and " +
      "agrees with brute force where brute's neighbor already matched") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val filtered = SimilarityQueries.queries("sim_knn_filtered")(spark, dir)
      .select("qid", "nid", "label").collect()
    assert(filtered.nonEmpty)
    filtered.foreach { r =>
      assert(r.getLong(2) == emb(r.getLong(0)).toLong,
        "neighbor label must equal query label")
      assert(emb(r.getLong(1)).toLong == r.getLong(2))
    }
    // consistency: a brute top-5 neighbor with matching label must also
    // appear in the filtered top-5 (the filter only removes candidates)
    val brute = SimilarityQueries.queries("sim_knn_brute")(spark, dir)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (q, n) => emb(q) == emb(n) }.toSet
    val fset = filtered.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.subsetOf(fset),
      s"brute same-label pairs missing from filtered: ${brute.diff(fset)}")
  }

  test("PQ codes: reconstructions rank like the originals — ADC top-5 " +
      "recall vs brute force") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // codebooks refit deterministically (same data + seeds as the query)
    val books = graft.operators.KMeans.fitMany(
      emb, "vec_id",
      (0 until 4).map(sub => expr(s"slice(embedding, ${sub * 16 + 1}, 16)")),
      k = 16, iters = 3)
      .map(_.map { case (cell, cq, _) =>
        cell -> cq.map(_ / 1e6) // micro-units → doubles for ADC
      }.toMap)
    val codes = SimilarityQueries.queries("sim_pq_codes")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    def reconstruct(id: Long): Array[Double] =
      codes(id).zipWithIndex
        .flatMap { case (c, sub) => books(sub)(c) }.toArray
    // 50-query panel: 10 queries × top-5 = 50 outcomes has ±0.1 sampling
    // noise on this metric (round-6 seeding change exposed it); 250
    // outcomes make the ≥0.3 pin stable across codebook perturbations
    val queries = vecs.keys.filter(_ < 50)
    val recalls = queries.map { q =>
      def topk(score: Long => Double) = vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (-score(n), n)).take(5).toSet
      val brute = topk(n => cos(vecs(q), vecs(n)))
      val adc = topk(n => cos(vecs(q), reconstruct(n)))
      brute.intersect(adc).size / 5.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean ADC recall@5 $mean")
  }

  test("trained-quantizer IVF ANN recall@5 vs brute force " +
      "(train → index → search loop)") {
    val brute = knnPairs("sim_knn_brute")
    val ann = knnPairs("sim_knn_ivf_trained")
    val recall = brute.intersect(ann).size.toDouble / brute.size
    // nprobe=3 of 8 trained cells — same bound class as the label-cell IVF
    assert(recall >= 0.5, s"recall@5 $recall")
  }

  test("LSH ANN recall@5 vs brute force") {
    val brute = knnPairs("sim_knn_brute")
    val ann = knnPairs("sim_knn_lsh")
    val recall = brute.intersect(ann).size.toDouble / brute.size
    // 4 tables × 6 planes on 64-dim data — partial recall is expected;
    // the bound pins that bucketing actually retrieves near neighbors.
    assert(recall >= 0.2, s"recall@5 $recall")
  }

  test("IVF ANN recall@5 vs brute force (nprobe=3 of 10 cells)") {
    val brute = knnPairs("sim_knn_brute")
    val ivf = knnPairs("sim_knn_ivf")
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    // label cells are weak quantizers for random embeddings, but probing
    // 3/10 cells must still beat random scan pruning (≈0.3 expected)
    assert(recall >= 0.25, s"recall@5 $recall")
  }

  test("embedding-cosine near-dup: bucketed candidates find the top " +
      "exact pairs") {
    import spark.implicits._
    // exact pairs ≥ 0.45 via brute force (test-side only — quadratic)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val a = emb.toDF("va", "ea"); val b = emb.toDF("vb", "eb")
    val cosExpr =
      """aggregate(zip_with(ea, eb, (x, y) -> cast(x as double) * cast(y as double)),
                   cast(0 as double), (acc, v) -> acc + v)
         / (sqrt(aggregate(ea, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double)))
            * sqrt(aggregate(eb, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))))"""
    val exact = a.crossJoin(b).filter(col("va") < col("vb"))
      .withColumn("cos", expr(cosExpr)).filter(col("cos") >= 0.45)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    val cand = DedupQueries.queries("dedup_embedding_near")(spark, dir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(cand.subsetOf(exact)) // precision 1.0: every pair re-checked
    // The threshold pairs here sit at cos≈0.45-0.51 (~60° apart — no true
    // near-dups in this corpus): 6 tables × 6 planes gives expected recall
    // ≈ 1-(1-(1-θ/π)^6)^6 ≈ 0.4; the pin guards against degenerate
    // bucketing, not a precise rate. True near-dups (cos>0.9) collide with
    // per-table prob (1-θ/π)^6 ≈ 0.82.
    val recall = exact.intersect(cand).size.toDouble / exact.size
    assert(recall >= 0.15, s"recall $recall of ${exact.size}")
  }

  test("winnowing candidates recover the high-Jaccard pairs") {
    val exact = DedupQueries.queries("dedup_ngram_jaccard")(spark, dir)
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = DedupQueries.queries("dedup_winnow_pairs")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(cand).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall; missed ${exact.diff(cand)}")
  }

  test("exact dedup groups partition the corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val groups = DedupQueries.queries("dedup_exact_groups")(spark, dir)
    assert(groups.agg(sum("n_dups")).head().getLong(0) == docs.count())
  }

  test("degenerate corpus (1.2k identical docs): candidate generation " +
      "stays bounded, small buckets still pair") {
    // The INPUT of a dedup pipeline is duplicate-heavy by definition: every
    // copy of a boilerplate doc lands in the same band bucket in every
    // band/table. The bucket caps must drop that monster bucket (its pairs
    // belong to exact dedup, which handles them in linear time) while the
    // genuinely-near pair in its own small bucket is still found.
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-degenerate").toString
    val boiler = ("lorem ipsum dolor sit amet consectetur adipiscing elit " +
      "sed do eiusmod tempor incididunt ut labore et dolore magna aliqua")
    // the small-bucket pair is an exact duplicate: deterministically lands
    // in a 2-doc bucket in EVERY band (near-recall rates are pinned by the
    // other tests; this one pins the cap's drop/keep boundary)
    val small = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = (0L until 1200L).map(i => (i, boiler)) ++
      Seq((2000L, small), (2001L, small))
    docs.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val base = Array.fill(64)(0.01f)
    val clusterVec = base.updated(0, 1.0f)
    val nearA = base.updated(32, 1.0f)
    val nearB = base.updated(32, 1.0f).updated(33, 0.2f)
    val vecs = (0L until 1200L).map(i => (i, clusterVec.toSeq, 0)) ++
      Seq((2000L, nearA.toSeq, 1), (2001L, nearB.toSeq, 1))
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    try {
      for (q <- Seq("dedup_minhash_pairs", "dedup_simhash_pairs")) {
        val pairs = DedupQueries.queries(q)(spark, tmp)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
        // no quadratic explode of the 1200-doc cluster...
        assert(!pairs.exists(p => p._1 < 1200 && p._2 < 1200),
          s"$q emitted cluster pairs — over-full bucket not dropped")
        // ...but the near-dup pair in its own bucket is still found
        assert(pairs.contains((2000L, 2001L)), s"$q lost the small bucket")
      }
      val embPairs = DedupQueries.queries("dedup_embedding_near")(spark, tmp)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      assert(!embPairs.exists(p => p._1 < 1200 && p._2 < 1200),
        "embedding near-dup emitted cluster pairs")
      assert(embPairs.contains((2000L, 2001L)),
        "embedding near-dup lost the small-bucket pair")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }
}
