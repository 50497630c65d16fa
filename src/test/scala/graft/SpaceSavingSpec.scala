package graft

import graft.functions.SpaceSaving
import graft.functions.SpaceSaving.{Agg, Cell}

/** SpaceSaving sketch correctness: exactness while the vocabulary fits
  * in the capacity (the registry query's H contract), the classic
  * ε = 1/m guarantees once eviction starts (overestimate invariant,
  * error bound, heavy-hitter completeness), and merge soundness under
  * arbitrary partition splits — all checked against plain-Scala exact
  * counts sharing no code with the Aggregator.
  */
class SpaceSavingSpec extends SparkSpec {

  private def runSketch(stream: Seq[String], m: Int,
      splits: Int = 4): Map[String, Cell] = {
    val agg = new Agg(m)
    // Fold each split independently then merge pairwise — the same
    // shape Spark's partial/final aggregation tree produces.
    val parts = stream.grouped(math.max(1, stream.size / splits)).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    parts.reduce(agg.merge).toMap
  }

  test("exact (zero err) while distinct tokens fit in capacity") {
    val stream = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++
      Seq.fill(9)("c") ++ Seq.fill(2)("d")
    val sk = runSketch(scala.util.Random.shuffle(stream), m = 8)
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(sk.keySet == exact.keySet)
    sk.foreach { case (k, Cell(c, e)) =>
      assert(c == exact(k), s"count drifted for $k")
      assert(e == 0L, s"err nonzero for $k without eviction")
    }
  }

  test("registry query equals the exact top-20 on the fixture corpus") {
    val got = SpaceSaving.query(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    import org.apache.spark.sql.functions._
    val exact = graft.core.Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").count()
      .orderBy(desc("count"), col("tok"))
      .limit(20).collect()
      .map(r => (r.getString(0), r.getLong(1), 0L))
    assert(got.toSeq == exact.toSeq)
  }

  test("overestimate invariant and 1/m error bound under eviction") {
    // 50 heavy tokens + 400 singletons through a capacity-64 sketch:
    // eviction happens constantly, the guarantees must still hold.
    val heavy = (0 until 50).flatMap(i => Seq.fill(100 + i)(f"h$i%02d"))
    val light = (0 until 400).map(i => f"l$i%03d")
    val stream = new scala.util.Random(7).shuffle(heavy ++ light)
    val m = 64
    val sk = runSketch(stream, m)
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = stream.size.toLong
    assert(sk.size <= m)
    sk.foreach { case (k, Cell(c, e)) =>
      assert(c >= exact(k), s"underestimate for $k")
      assert(c - e <= exact(k), s"err bound broken for $k")
      // Per-merge truncation can stack at most one minimum per level on
      // top of the single-stream ε·N bound; 2·N/m is a safe envelope.
      assert(c - exact(k) <= 2L * n / m, s"overestimate beyond 2N/m for $k")
    }
    // Heavy-hitter completeness: every token with true count > 2N/m is
    // present (the SpaceSaving guarantee survives the merge envelope).
    exact.filter(_._2 > 2L * n / m).keys.foreach { k =>
      assert(sk.contains(k), s"heavy hitter $k evicted")
    }
  }

  test("grouped sketch equals exact per-group top-5") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = SpaceSaving.groupQuery(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val w = Window.partitionBy("lang").orderBy(desc("est"), col("tok"))
    val exact = graft.core.Tables.t(spark, sf, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("lang", "tok").agg(count(lit(1)).as("est"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .orderBy(col("lang"), desc("est"), col("tok"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == exact)
  }

  test("bucket-indexed buffer matches the reference O(m)-scan algorithm cell-for-cell") {
    // The round-13 rewrite moved the min-eviction from an O(m) scan over
    // an immutable Map to a count-bucket index (the measured e=2.45 →
    // linear fix). Same algorithm, so the buffers must agree EXACTLY —
    // including eviction order — with this literal transcription of the
    // original reduce/merge, on a stream that evicts constantly.
    def refReduce(b: Map[String, Cell], tok: String, m: Int): Map[String, Cell] =
      b.get(tok) match {
        case Some(Cell(c, e)) => b.updated(tok, Cell(c + 1, e))
        case None if b.size < m => b.updated(tok, Cell(1L, 0L))
        case None =>
          val (mk, Cell(mc, _)) = b.minBy { case (k, Cell(c, _)) => (c, k) }
          (b - mk).updated(tok, Cell(mc + 1, mc))
      }
    def refMerge(a: Map[String, Cell], b: Map[String, Cell], m: Int): Map[String, Cell] = {
      val minA = if (a.size < m) 0L else a.values.map(_.c).min
      val minB = if (b.size < m) 0L else b.values.map(_.c).min
      val merged = (a.keySet ++ b.keySet).iterator.map { k =>
        (a.get(k), b.get(k)) match {
          case (Some(Cell(c1, e1)), Some(Cell(c2, e2))) => k -> Cell(c1 + c2, e1 + e2)
          case (Some(Cell(c1, e1)), None) => k -> Cell(c1 + minB, e1 + minB)
          case (None, Some(Cell(c2, e2))) => k -> Cell(c2 + minA, e2 + minA)
          case _ => throw new IllegalStateException("unreachable")
        }
      }.toMap
      if (merged.size <= m) merged
      else merged.toSeq.sortBy { case (k, Cell(c, _)) => (-c, k) }.take(m).toMap
    }
    val m = 16
    val rnd = new scala.util.Random(23)
    // Zipf-ish stream over a 200-token vocabulary >> m: constant eviction.
    val stream = Seq.fill(4000)(f"t${math.min(rnd.nextInt(200), rnd.nextInt(200))}%03d")
    val agg = new Agg(m)
    for (splits <- Seq(1, 2, 5)) {
      val chunks = stream.grouped(math.max(1, stream.size / splits)).toSeq
      val got = chunks.map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge).toMap
      val want = chunks.map(_.foldLeft(Map.empty[String, Cell])(refReduce(_, _, m)))
        .reduce(refMerge(_, _, m))
      assert(got == want, s"buffer diverged from reference at splits=$splits")
    }
  }

  test("merge is split-invariant for the heavy tail") {
    val heavy = (0 until 20).flatMap(i => Seq.fill(200 + 10 * i)(f"h$i%02d"))
    val light = (0 until 300).map(i => f"l$i%03d")
    val stream = new scala.util.Random(11).shuffle(heavy ++ light)
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = stream.size.toLong
    for (splits <- Seq(1, 3, 8)) {
      val sk = runSketch(stream, m = 64, splits = splits)
      exact.filter(_._2 > 2L * n / 64).keys.foreach { k =>
        assert(sk.contains(k), s"heavy hitter $k lost at splits=$splits")
        assert(sk(k).c >= exact(k))
      }
    }
  }
}
