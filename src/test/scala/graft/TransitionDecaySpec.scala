package graft

import graft.queries.{EventOps, GraphOps}

/** Ground-truth recomputations for the round-7 event/graph additions
  * (sf0.001 fixture, driver-side Scala sharing no code with the
  * operators under test).
  *
  * q_event_transitions: bigram totals must equal Σ_users (events_u − 1),
  * and every prev_type's probability row must sum to 1 within the 6 dp
  * rounding grain.
  *
  * q_decay_sum: the whole output table must equal an exact BigDecimal /
  * bit-shift recomputation of the declared semantics (HALF_UP 4 dp value
  * canon, 2^-k day decay floored at k=20, anchored at the corpus max
  * day).
  *
  * q_triangle_count: equals a brute-force adjacency-set triangle count
  * over the same degree-capped subgraph.
  */
class TransitionDecaySpec extends SparkSpec {

  private def events = {
    graft.core.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type", "value",
        "unix_micros(ts) AS us")
  }

  test("transition bigram mass and per-row normalization") {
    val ev = events.collect()
    val perUser = ev.groupBy(_.getLong(0)).view.mapValues(_.length)
    val expectedPairs = perUser.values.map(_ - 1L).sum
    val out = EventOps.queries("q_event_transitions")(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum == expectedPairs,
      "bigram count must be Σ(events_u - 1)")
    out.groupBy(_.getString(0)).foreach { case (prev, rows) =>
      val mass = rows.map(_.getDouble(3)).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"$prev rows sum to $mass")
    }
  }

  test("decay scores equal an exact integer-arithmetic recomputation") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val ev = events.collect().map { r =>
      val us = r.getLong(4)
      val dayUs = us - Math.floorMod(us, 86400L * 1000000L)
      (r.getLong(0), r.getDouble(3), dayUs)
    }
    val anchor = ev.map(_._3).max
    val expected = ev.groupBy(_._1).map { case (u, xs) =>
      val s = xs.map { case (_, v, dayUs) =>
        val iv = new JBD(v).setScale(4, RoundingMode.HALF_UP)
          .movePointRight(4).longValueExact()
        val k = math.min(((anchor - dayUs) / (86400L * 1000000L)).toInt, 20)
        iv << (20 - k)
      }.sum
      val score = BigDecimal(s) / BigDecimal(1048576L * 10000L)
      (u, score.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        xs.length.toLong)
    }.toSet
    val got = EventOps.queries("q_decay_sum")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == expected,
      s"extra=${got.diff(expected).take(3)} missing=${expected.diff(got).take(3)}")
  }

  test("triangle count equals brute-force on the capped subgraph") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.toSeq.flatMap { grp =>
      val ps: Seq[Long] = grp.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size)
    val keep = deg.filter(_._2 <= 128).keySet
    val e = edges.filter(p => keep(p._1) && keep(p._2))
    val adj = e.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val tris = e.toSeq.map { case (a, b) =>
      (adj.getOrElse(a, Set.empty) & adj.getOrElse(b, Set.empty)).size.toLong
    }.sum
    val got = GraphOps.queries("q_triangle_count")(spark, sf).head()
    assert(got.getLong(0) == keep.size.toLong, "n_nodes")
    assert(got.getLong(1) == e.size.toLong, "n_edges")
    assert(got.getLong(2) == tris, s"triangles: got ${got.getLong(2)} want $tris")
  }
}
