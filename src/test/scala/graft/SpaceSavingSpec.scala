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
    parts.reduce(agg.merge)
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
