package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.functions.{TextHashImpl, ToExtendedJson}

/** Property-based pins for the hash/serialization primitives — these run
  * on plain JVM values (no SparkSession), so they cover the full input
  * space cheaply.
  */
object HashProperties extends Properties("graft.hashes") {

  private def utf8(s: String) = UTF8String.fromString(s)

  property("fnv64 is deterministic and sensitive to any char change") =
    forAll { (s: String, i: Int) =>
      val base = TextHashImpl.poly64(utf8(s))
      val same = TextHashImpl.poly64(utf8(s))
      val changed =
        if (s.isEmpty) TextHashImpl.poly64(utf8(s + "x"))
        else {
          val k = math.floorMod(i, s.length)
          val c = if (s.charAt(k) == 'a') 'b' else 'a'
          TextHashImpl.poly64(utf8(s.updated(k, c)))
        }
      base == same && base != changed
    }

  property("escape emits valid JSON that round-trips any string") =
    forAll { (s: String) =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val parsed = mapper.readTree("\"" + ToExtendedJson.escape(s) + "\"")
      parsed.asText() == s
    }

  private val tokenSet: Gen[Set[String]] =
    Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.identifier).map(_.toSet))

  private val repeatyTokens: Gen[List[String]] =
    Gen.chooseNum(0, 80).flatMap(n =>
      // small alphabet so repeats (and count ties) actually occur
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "ba", "z")))

  property("token_mode matches the naive groupBy-max with " +
      "lexicographic tie-break") =
    forAll(repeatyTokens) { ts =>
      val got = TextHashImpl.tokenMode(
        new GenericArrayData(ts.map(utf8).toArray[Any]))
      if (ts.isEmpty) got == null
      else {
        val counts = ts.groupBy(identity).view.mapValues(_.size.toLong)
        val bestCnt = counts.values.max
        val bestTok = counts.collect {
          case (t, c) if c == bestCnt => t
        }.min // smallest lexicographic among maximal counts
        got.getUTF8String(0).toString == bestTok && got.getLong(1) == bestCnt
      }
    }

  property("minhash similarity estimate tracks true Jaccard within 0.25") =
    forAll(tokenSet, tokenSet) { (a, b) =>
      def sig(ts: Set[String]) = TextHashImpl.minhashSig(
        new GenericArrayData(ts.toSeq.map(utf8).toArray[Any]), 128)
        .toLongArray()
      val trueJ =
        if (a.union(b).isEmpty) 1.0
        else a.intersect(b).size.toDouble / a.union(b).size
      val est = sig(a).zip(sig(b)).count { case (x, y) => x == y } / 128.0
      Prop(math.abs(est - trueJ) < 0.25) :|
        s"trueJ=$trueJ est=$est"
    }

  property("minhash is order-insensitive over the token multiset") =
    forAll(tokenSet) { ts =>
      val fwd = TextHashImpl.minhashSig(
        new GenericArrayData(ts.toSeq.map(utf8).toArray[Any]), 32).toLongArray()
      val rev = TextHashImpl.minhashSig(
        new GenericArrayData(ts.toSeq.reverse.map(utf8).toArray[Any]), 32)
        .toLongArray()
      fwd.sameElements(rev)
    }

  property("simhash of identical token arrays is equal; hamming to a " +
      "disjoint vocabulary is large") =
    forAll(tokenSet) { ts =>
      def sh(xs: Seq[String]) = TextHashImpl.simhash(
        new GenericArrayData(xs.map(utf8).toArray[Any]))
      val a = sh(ts.toSeq)
      val b = sh(ts.toSeq)
      val other = sh(ts.toSeq.map(_ + "_completely_different_suffix"))
      a == b && (ts.isEmpty ||
        java.lang.Long.bitCount(a ^ other) > 0)
    }

  property("ToExtendedJson on plain-string structs matches a reference " +
      "JSON library byte-for-byte") =
    forAll(Gen.listOfN(3, Gen.zip(Gen.identifier, Gen.asciiPrintableStr))) {
      fields =>
        // distinct field names, none in the opaque/raw set
        val fs = fields.zipWithIndex.map { case ((k, v), i) => (s"f${i}_$k", v) }
        val schema = org.apache.spark.sql.types.StructType(fs.map { case (k, _) =>
          org.apache.spark.sql.types.StructField(k,
            org.apache.spark.sql.types.StringType)
        })
        val row = org.apache.spark.sql.catalyst.InternalRow
          .fromSeq(fs.map { case (_, v) => utf8(v) })
        val rendered = graft.functions.ToExtendedJson(
          org.apache.spark.sql.catalyst.expressions.Literal(row, schema))
          .renderForCodegen(row).toString
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = mapper.createObjectNode()
        fs.foreach { case (k, v) => node.put(k, v) }
        rendered == mapper.writeValueAsString(node)
    }

  property("winnow fingerprints are a subset of all k-gram hashes and " +
      "stable under repetition") =
    forAll(Gen.alphaStr.suchThat(_.length >= 8)) { s =>
      val w1 = TextHashImpl.winnow(utf8(s), 8, 4).toLongArray().toSet
      val w2 = TextHashImpl.winnow(utf8(s), 8, 4).toLongArray().toSet
      val all = (0 to s.length - 8)
        .map(i => TextHashImpl.poly64(utf8(s.substring(i, i + 8)))).toSet
      w1 == w2 && w1.subsetOf(all) && w1.nonEmpty
    }

  /** Naive Schleimer et al. reference: full FNV per position, full min
    * rescan per window, SortedSet dedup — the round-15 kernel verbatim.
    * Pins the round-16 amortized sliding-min + primitive-buffer rewrite
    * to the exact sorted-distinct value set at arbitrary (k, w).
    */
  private def winnowRef(s: String, k: Int, w: Int): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    val m = bytes.length - k + 1
    if (m <= 0) return Seq.empty
    val hashes = (0 until m).map { i =>
      var h = TextHashImpl.Offset
      (0 until k).foreach { j =>
        h ^= (bytes(i + j) & 0xffL); h *= TextHashImpl.Prime
      }
      h
    }
    val picked = scala.collection.mutable.SortedSet.empty[Long]
    if (m <= w) picked += hashes.min
    else (0 to m - w).foreach(i => picked += hashes.slice(i, i + w).min)
    picked.toSeq
  }

  property("winnow == the naive reference (exact sorted distinct window " +
      "minima) at arbitrary k and w") =
    forAll(Gen.asciiPrintableStr, Gen.chooseNum(1, 12), Gen.chooseNum(1, 9)) {
      (s, k, w) =>
        val got = TextHashImpl.winnow(utf8(s), k, w).toLongArray().toSeq
        val want = winnowRef(s, k, w)
        Prop(got == want) :| s"k=$k w=$w got=$got want=$want"
    }

  private val tokenList: Gen[List[String]] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.identifier.map(_.take(8))))

  property("shingle_hashes = FNV of each joined k-gram window, " +
      "deduplicated; minhash_ngrams = minhash_sig over those windows") =
    forAll(tokenList) { ts =>
      val arr = new GenericArrayData(ts.map(utf8).toArray[Any])
      val got = TextHashImpl.shingleHashes(arr, 3).toLongArray().toSeq
      val windows = ts.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq
      val want = windows.map(w => TextHashImpl.poly64(utf8(w))).distinct
      val sigGot = TextHashImpl.minhashNgrams(arr, 3, 16).toLongArray()
      val sigWant = TextHashImpl.minhashSig(
        new GenericArrayData(windows.distinct.map(utf8).toArray[Any]), 16)
        .toLongArray()
      Prop(got == want && sigGot.sameElements(sigWant)) :|
        s"got=$got want=$want"
    }

  private val longArr: Gen[Array[Long]] =
    Gen.chooseNum(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue)).map(_.toArray))

  property("ordered_pairs emits exactly the i<j index pairs") =
    forAll(longArr) { ds =>
      val out = TextHashImpl.orderedPairs(new GenericArrayData(ds))
      val got = (0 until out.numElements()).map { k =>
        val r = out.getStruct(k, 2); (r.getLong(0), r.getLong(1))
      }
      val want = for {
        i <- 0 until ds.length; j <- i + 1 until ds.length
      } yield (ds(i), ds(j))
      got == want
    }

  property("sig_match counts agreeing positions, symmetric") =
    forAll(longArr, longArr) { (a, b) =>
      val ga = new GenericArrayData(a); val gb = new GenericArrayData(b)
      val n = math.min(a.length, b.length)
      val want = (0 until n).count(i => a(i) == b(i)).toLong
      TextHashImpl.sigMatch(ga, gb) == want &&
        TextHashImpl.sigMatch(gb, ga) == want
    }

  private val words: Gen[List[String]] =
    Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.identifier.map(_.take(8))))

  property("word_ngrams: count = max(0, m-n+1), each gram joins n " +
      "consecutive tokens with single spaces") =
    forAll(words, Gen.chooseNum(1, 6)) { (ws, n) =>
      val arr = new GenericArrayData(ws.map(utf8).toArray[Any])
      val out = TextHashImpl.wordNgrams(arr, n)
      val grams = (0 until out.numElements())
        .map(i => out.getUTF8String(i).toString)
      val want = if (ws.length < n) Nil
        else ws.sliding(n).map(_.mkString(" ")).toList
      Prop(grams == want) :| s"got=$grams want=$want"
    }

  property("char_windows: count = (len-w)/s+1, every window is w chars " +
      "at stride s offsets") =
    forAll(Gen.asciiPrintableStr, Gen.chooseNum(1, 10),
        Gen.chooseNum(1, 10)) { (s, w, st) =>
      val out = TextHashImpl.charWindows(utf8(s), w, st)
      val wins = (0 until out.numElements())
        .map(i => out.getUTF8String(i).toString)
      val want = if (s.length < w) Nil
        else (0 to (s.length - w) / st).map(i => s.substring(st * i, st * i + w))
      Prop(wins == want) :| s"got=$wins want=$want"
    }

  property("cdc_chunks: chunks concatenate to the whole string (count " +
      "consistency) and an edit changes only a bounded chunk window") =
    forAll(Gen.asciiPrintableStr.suchThat(_.length >= 2),
        Gen.chooseNum(0, 1 << 20)) { (s, seed) =>
      val mask = 31L // 5 bits, ~32-byte chunks
      def chunks(x: String) =
        TextHashImpl.cdcChunks(utf8(x), mask).toLongArray().toList
      val base = chunks(s)
      // deterministic + full coverage: re-chunking is identical
      val again = chunks(s)
      // single-char edit: strict locality — the multiset difference is
      // bounded by the chunks overlapping the 64-byte gear window
      val k = seed % s.length
      val edited = s.updated(k, if (s.charAt(k) == 'a') 'b' else 'a')
      val ec = chunks(edited)
      def multiset(l: List[Long]) =
        l.groupBy(identity).view.mapValues(_.size).toMap
      val mb = multiset(base); val me = multiset(ec)
      val diff = (mb.keySet ++ me.keySet).toSeq
        .map(key => math.abs(mb.getOrElse(key, 0) - me.getOrElse(key, 0)))
        .sum
      // window 64 bytes / expected chunk 32 bytes ⇒ a handful of chunks
      // on each side; 12 is a generous strict bound
      Prop(base == again && base.nonEmpty && diff <= 12) :|
        s"chunks=${base.size} editedChunks=${ec.size} multisetDiff=$diff"
    }

  private val vec: Gen[Array[Double]] =
    Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0, 10.0)).map(_.toArray))

  property("vector ops: dot is left-to-right exact, cos bounded, " +
      "normalize yields unit norm; lsh_buckets matches an independent " +
      "integer mirror (order-free exact projections)") =
    forAll(vec) { v =>
      import graft.functions.{VectorLshImpl, VectorOpsImpl}
      val g = new GenericArrayData(v)
      val dot = VectorOpsImpl.dot(g, false, g, false)
      var want = 0.0; v.foreach(x => want += x * x)
      val nrm = VectorOpsImpl.normalize(g, false)
      var unit = 0.0
      (0 until nrm.numElements()).foreach { i =>
        val x = nrm.getDouble(i); unit += x * x
      }
      val cosSelf = VectorOpsImpl.cos(g, false, g, false)
      // Independent mirror of the quantized-projection bucket semantics:
      // 6dp micro-unit quantization makes each plane's projection an exact
      // BigInt sum — summed here in REVERSE dimension order to prove the
      // result is addition-order free (the property the quantization buys;
      // the former double accumulation had a sign-test knife-edge at 0).
      def mirror(xs: Array[Double]): Array[Long] =
        Array.tabulate(4) { t =>
          (0 until 6).foldLeft(0L) { (b, j) =>
            val p = (t * 6 + j).toLong
            val s = xs.indices.reverse.map { i =>
              val xq = BigInt(math.floor(xs(i) * 1000000.0 + 0.5).toLong)
              val w = (p * 2654435761L + (i + 1).toLong * 2246822519L) %
                251L % 7L - 3L
              xq * w
            }.sum
            if (s > 0) b | (1L << j) else b
          }
        }
      val sameBuckets = VectorLshImpl.lshBuckets(g, false, 4, 6)
        .toLongArray().sameElements(mirror(v))
      val nonZero = want > 1e-12 // degenerate all-zero vector excluded
      Prop(!nonZero || (dot == want && math.abs(unit - 1.0) < 1e-9 &&
        math.abs(cosSelf - 1.0) < 1e-12 && sameBuckets)) :|
        s"dot=$dot want=$want unit=$unit cos=$cosSelf"
    }
}
