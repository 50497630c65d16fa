package graft

import graft.functions.Bpe

/** BPE encode correctness: textbook behavior on hand cases, the
  * reconstruction invariant, and full-table equality between the
  * registered query and an independent driver-side recomputation
  * (pair counting + greedy merges reimplemented with plain Scala
  * collections, sharing no code with the operator).
  */
class BpeSpec extends SparkSpec {

  test("encode follows merge ranks greedily, leftmost-first on ties") {
    val ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1)
    assert(Bpe.encode("abc", ranks) == Vector("abc"))
    assert(Bpe.encode("abab", ranks) == Vector("ab", "ab"))
    assert(Bpe.encode("cab", ranks) == Vector("c", "ab"))
    assert(Bpe.encode("xyz", Map.empty) == Vector("x", "y", "z"))
    assert(Bpe.encode("", Map.empty) == Vector())
    assert(Bpe.encode("q", Map.empty) == Vector("q"))
    // Tie rank: both "aa" pairs in "aaa" have rank 0; leftmost merges
    // first, leaving ("aa", "a").
    assert(Bpe.encode("aaa", Map(("a", "a") -> 0)) == Vector("aa", "a"))
  }

  test("encoded symbols always reconstruct the word and never exceed its chars") {
    val ranks = Map(("t", "h") -> 0, ("th", "e") -> 1, ("i", "n") -> 2,
      ("a", "n") -> 3, ("an", "d") -> 4)
    for (w <- Seq("the", "then", "and", "standing", "inland", "a", "thethe")) {
      val syms = Bpe.encode(w, ranks)
      assert(syms.mkString == w, s"reconstruction failed for $w: $syms")
      assert(syms.length <= w.length)
    }
  }

  test("learned merges compose: higher-level ranks exist and apply") {
    import spark.implicits._
    // "aaab" ×3: round 1 fuses (a,a) [weight 6]; round 2 fuses (a,b)
    // [tie at 3 with (aa,a), pair-asc breaks it]; round 3 fuses the
    // SECOND-LEVEL pair (aa,ab) — exactly the rank class the round-7
    // single-pass learner could never produce (ADVICE r7).
    val docs = Seq("aaab aaab aaab").toDF("text")
    val merges = Bpe.learnMerges(docs, 50)
    assert(merges == Vector(("a", "a"), ("a", "b"), ("aa", "ab")))
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encode("aaab", ranks) == Vector("aaab"),
      "encode must compose all three merge levels down to one symbol")
    // Compression below the single-round floor of 0.5 proves iteration.
    assert(Bpe.encode("aaab", ranks).length.toDouble / 4 < 0.5)
  }

  test("q_bpe_encode equals an independent driver-side recomputation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // Independent ITERATIVE merge learning (plain Scala collections,
    // sharing no code with the operator): word-frequency vocab, then 50
    // rounds of count-adjacent-pairs (weighted by word frequency) →
    // pick (count desc, pair asc) → fuse left-to-right non-overlapping.
    val wordCounts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, text) =>
      text.split(" ").filter(_.length >= 2).foreach { w =>
        wordCounts(w) = wordCounts.getOrElse(w, 0L) + 1
      }
    }
    var vocab = wordCounts.toSeq.sortBy { case (w, c) => (-c, w) }
      .map { case (w, c) => (w.map(_.toString).toList, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < 50 && vocab.nonEmpty) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      if (pc.nonEmpty) {
        val best = pc.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += best
        def fuse(l: List[String]): List[String] = l match {
          case a :: b :: rest if (a, b) == best => (a + b) :: fuse(rest)
          case a :: rest => a :: fuse(rest)
          case Nil => Nil
        }
        vocab = vocab.map { case (s, c) => (fuse(s), c) }
          .filter(_._1.length >= 2)
      }
      round += 1
    }
    val ranks = merges.zipWithIndex.toMap
    // Independent greedy encoder (recursive, not the while-loop under test).
    def enc(syms: Vector[String]): Vector[String] = {
      val cands = syms.indices.dropRight(1)
        .map(i => (ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue), i))
      if (cands.isEmpty || cands.min._1 == Int.MaxValue) syms
      else {
        val i = cands.min._2
        enc((syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2))
      }
    }
    val expected = docs
      .flatMap { case (lang, text) =>
        text.split(" ").filter(_.nonEmpty).map { w =>
          (lang, w.length.toLong, enc(w.map(_.toString).toVector).length.toLong)
        }
      }
      .groupBy(_._1).map { case (lang, xs) =>
        val chars = xs.map(_._2).sum; val syms = xs.map(_._3).sum
        (lang, xs.length.toLong, chars, syms,
          BigDecimal(syms.toDouble / chars)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSet
    val got = Bpe.query(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expected,
      s"extra=${got.diff(expected)} missing=${expected.diff(got)}")
  }
}
