package graft

import org.apache.spark.sql.functions._
import graft.queries.{EventOps, TextOps}

/** Ground-truth invariants for the round-8 profiling/sampling operators,
  * each recomputed independently driver-side (plain Scala collections,
  * sharing no code path with the operators under test; sf0.001 fixture).
  *
  * q_anomaly_zscore: flagged (type, day) set and z values equal a Scala
  * recomputation of mean/sample-std over the daily counts.
  *
  * q_debounce_dedup: per-type dropped counts equal a recomputation over
  * collected events sorted per (user, type).
  *
  * q_mad_outliers: median, MAD and outlier count per type equal a Scala
  * percentile_cont (linear interpolation) recomputation.
  *
  * q_posting_stats: df/span/varint-bytes of the top token equal a
  * recomputation from raw (doc, token) pairs.
  *
  * q_stratified_sample: every stratum delivers exactly its ceil(n/10)
  * quota in md5 order, and the sample is invariant under repartitioning
  * (layout independence — the property that makes it rerunnable at
  * 100 TB).
  */
class PipelineProfilersSpec extends SparkSpec {

  private def events = graft.core.Tables.t(spark, sf, "events")
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** percentile_cont(0.5): linear interpolation between the two middle
    * order statistics — the definition both engines implement. */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val idx = (s.length - 1) * 0.5
    val lo = s(idx.toInt)
    val hi = s(math.ceil(idx).toInt)
    lo + (idx - idx.toInt) * (hi - lo)
  }

  test("anomaly z-scores equal a driver-side mean/std recomputation") {
    val daily = events
      .select(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .groupBy("day", "event_type").count()
      .collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString, r.getLong(2)))
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      val cnts = rows.map(_._3.toDouble)
      val mu = cnts.sum / cnts.length
      val sigma = math.sqrt(
        cnts.map(c => (c - mu) * (c - mu)).sum / (cnts.length - 1))
      rows.collect {
        case (_, day, cnt) if math.abs(cnt - mu) > 2.0 * sigma =>
          (tpe, day, cnt, math.round((cnt - mu) / sigma * 1e6) / 1e6)
      }
    }.toSet
    assert(expected.nonEmpty, "fixture should contain a >2-sigma day")
    // Compare on the date part: the two sides render timestamps
    // differently but both start with yyyy-MM-dd.
    val expNorm = expected.map { case (t, d, c, z) => (t, d.take(10), c, z) }
    val got = EventOps.queries("q_anomaly_zscore")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1).take(10), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == expNorm,
      s"mismatch: extra=${got.diff(expNorm)} missing=${expNorm.diff(got)}")
  }

  test("debounce drop counts equal a per-(user,type) gap recomputation") {
    // sf0.001's ~1k events are too sparse for any same-(user,type) pair
    // inside 5 minutes; the sf0.01 fixture genuinely debounces.
    val sf01 = "/root/testdata/sf0.01"
    val evs = graft.core.Tables.t(spark, sf01, "events")
      .select("user_id", "event_type", "ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime * 1000L +
        r.getTimestamp(2).getNanos / 1000 % 1000, r.getLong(3)))
    val expected = evs.groupBy(e => (e._1, e._2)).toSeq
      .flatMap { case ((_, tpe), xs) =>
        val sorted = xs.sortBy(e => (e._3, e._4))
        sorted.zip(sorted.drop(1)).collect {
          case (a, b) if b._3 - a._3 <= 300L * 1000000L => tpe
        }
      }
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val got = EventOps.queries("q_debounce_dedup")(spark, sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._2).sum == evs.length.toLong, "n_events must cover the corpus")
    got.foreach { case (tpe, n, dropped, kept) =>
      assert(n == dropped + kept, s"$tpe: kept+dropped != total")
      assert(dropped == expected.getOrElse(tpe, 0L),
        s"$tpe: dropped=$dropped recomputed=${expected.getOrElse(tpe, 0L)}")
    }
    assert(expected.values.sum > 0, "fixture should contain debounced events")
  }

  test("MAD outlier profile equals a driver-side percentile recomputation") {
    val vals = events.select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSeq }
    val got = EventOps.queries("q_mad_outliers")(spark, sf).collect()
    assert(got.length == vals.size)
    got.foreach { r =>
      val (tpe, n, med, mad, outliers) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      val xs = vals(tpe)
      val m = median(xs)
      val d = xs.map(x => math.abs(x - m))
      val md = median(d)
      assert(n == xs.length)
      assert(math.abs(med - m) < 1e-5, s"$tpe median $med != $m")
      assert(math.abs(mad - md) < 1e-5, s"$tpe mad $mad != $md")
      val exp = d.count(a => math.round((a - 4.4478 * md) * 1e9) / 1e9 > 0)
      assert(outliers == exp, s"$tpe outliers $outliers != $exp")
    }
  }

  test("top posting list equals a driver-side df/span/varint recomputation") {
    val pairs = docs.select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty).distinct
        .map(t => (t, r.getLong(0))))
    val byTok = pairs.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._2).sorted.toSeq
    }
    def varint(v: Long): Long = math.ceil(v.toBinaryString.length / 7.0).toLong
    val rows = TextOps.queries("q_posting_stats")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // df is non-increasing down the output (ties broken by token).
    assert(rows.map(_.getLong(1)).sliding(2).forall(p => p(0) >= p(1)))
    rows.take(5).foreach { r =>
      val (tok, df, span, bytes) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val postings = byTok(tok)
      assert(df == postings.length, s"$tok df")
      assert(span == postings.last - postings.head, s"$tok span")
      val expBytes = varint(postings.head) +
        postings.zip(postings.drop(1)).map { case (a, b) => varint(b - a) }.sum
      assert(bytes == expBytes, s"$tok bytes_est $bytes != $expBytes")
    }
  }

  test("stratified sample fills exact quotas in md5 order, layout-independent") {
    val out = TextOps.queries("q_stratified_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val sizes = docs.groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perStratum = out.groupBy(x => (x._1, x._2))
    assert(perStratum.keySet == sizes.keySet, "every stratum is sampled")
    perStratum.foreach { case (k, xs) =>
      val quota = (sizes(k) + 9) / 10
      assert(xs.length.toLong == quota, s"$k delivered ${xs.length} != quota $quota")
      assert(xs.forall(_._5 == quota), s"$k quota column wrong")
    }
    // md5-order check on one stratum: the sampled ids are the quota-first
    // ids under the md5 sort recomputed here.
    val (k0, got0) = perStratum.head
    val expIds = docs.filter(col("lang") === k0._1 && col("source") === k0._2)
      .select("doc_id").collect().map(_.getLong(0))
      .sortBy(id => (md5hex(id.toString), id))
      .take(got0.length).toSeq
    assert(got0.sortBy(_._4).map(_._3).toSeq == expIds, s"$k0 not in md5 order")
    // Layout independence: the same window logic over a deliberately
    // different physical partitioning yields the identical sample —
    // md5 order owes nothing to row order, so the sample is rerunnable
    // on any layout of the same table.
    import org.apache.spark.sql.expressions.Window
    val rankW = Window.partitionBy("lang", "source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val sizeW = Window.partitionBy("lang", "source")
    val reparted = docs.repartition(7, col("doc_id"))
      .select(col("lang"), col("source"), col("doc_id"))
      .withColumn("rk", row_number().over(rankW).cast("long"))
      .withColumn("quota", ((count(lit(1)).over(sizeW) + 9L) / 10L).cast("long"))
      .filter(col("rk") <= col("quota"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(reparted == out.map(x => (x._1, x._2, x._3)).toSet,
      "sample must be invariant under repartitioning")
  }

  test("equi-depth deciles are balanced, ordered, and cover the corpus") {
    val rows = EventOps.queries("q_equidepth_bins")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val types = rows.map(_._1).distinct
    val total = events.count()
    assert(rows.map(_._3).sum == total, "deciles must cover every event")
    types.foreach { t =>
      val bins = rows.filter(_._1 == t).sortBy(_._2)
      assert(bins.map(_._2).toSeq == (1L to 10L), s"$t: missing deciles")
      // ntile balance: bucket sizes differ by at most 1.
      assert(bins.map(_._3).max - bins.map(_._3).min <= 1, s"$t: unbalanced")
      // Value ranges are non-decreasing across deciles (equal boundary
      // values may straddle two buckets, so hi(i) <= lo(i+1) holds only
      // up to rounding-grain ties).
      bins.sliding(2).foreach { p =>
        assert(p(0)._5 <= p(1)._4 + 1e-9,
          s"$t: decile ranges out of order: ${p.toSeq}")
      }
    }
  }

  test("lang-id confusion matrix partitions the corpus with unit row rates") {
    val rows = TextOps.queries("q_langid_confusion")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._3).sum == docs.count(), "matrix must cover every doc")
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      val mass = cells.map(_._4).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"$lang rates sum to $mass")
    }
    // The prediction column is the q_lang_id heuristic: cross-check
    // totals against that H-verified operator.
    val preds = TextOps.queries("q_lang_id")(spark, sf)
      .groupBy("pred_lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byPred = rows.groupBy(_._2).map { case (p, cs) => p -> cs.map(_._3).sum }
    assert(byPred == preds, "confusion marginals must match q_lang_id")
  }

  test("LLR keyword score equals a driver-side Dunning recomputation") {
    val rows = TextOps.queries("q_llr_keywords")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, ks) =>
      assert(ks.map(_._2).sorted.toSeq == (1L to ks.length), s"$lang ranks")
      // Scores non-increasing down the ranking.
      assert(ks.sortBy(_._2).map(_._5).sliding(2)
        .forall(p => p.length < 2 || p(0) >= p(1)), s"$lang not sorted")
    }
    // Recompute the LLR of the top (lang, tok) cell from raw counts.
    val tf = docs.select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val (lang0, _, tok0, k11got, llrGot) = rows.head
    val k11 = tf.count(p => p._1 == lang0 && p._2 == tok0).toLong
    val tokTot = tf.count(_._2 == tok0).toLong
    val langTot = tf.count(_._1 == lang0).toLong
    val n = tf.length.toLong
    assert(k11 == k11got, s"k11 $k11got != $k11")
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    def term(k: Long, e: Double) =
      if (k > 0) r6(k.toDouble * math.log(k.toDouble / e)) else 0.0
    val nd = n.toDouble
    val exp = 2.0 * (
      term(k11, langTot * tokTot / nd) +
      term(tokTot - k11, (nd - langTot) * tokTot / nd) +
      term(langTot - k11, langTot * (nd - tokTot) / nd) +
      term(n - tokTot - langTot + k11, (nd - langTot) * (nd - tokTot) / nd))
    assert(math.abs(llrGot - math.round(exp * 1e4) / 1e4) < 1e-9,
      s"llr $llrGot != recomputed $exp")
  }

  test("compaction plan covers every small shard in bounded groups") {
    val plan = graft.queries.LayoutOps.queries("q_compaction_plan")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(plan.nonEmpty)
    // Independent inventory recomputation.
    val inv = docs.select("lang", "doc_id", "text").collect()
      .map(r => ((r.getString(0), Integer.parseInt(
        md5hex(r.getLong(1).toString).substring(0, 1), 16) % 16),
        r.getString(2).length.toLong))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val mean = inv.values.sum.toDouble / inv.size
    val small = inv.filter(_._2 < 2.0 * mean)
    assert(plan.map(_._3).sum == small.size.toLong,
      "every small shard must land in exactly one merge group")
    assert(plan.map(_._4).sum == small.values.sum, "plan loses bytes")
    plan.groupBy(_._1).foreach { case (lang, groups) =>
      val sorted = groups.sortBy(_._2)
      // Groups within a lang are contiguous, non-overlapping shard ranges.
      sorted.sliding(2).foreach { p =>
        if (p.length == 2)
          assert(p(0)._6 < p(1)._5, s"$lang: overlapping groups ${p.toSeq}")
      }
      // No group (except possibly the last) exceeds target + one shard:
      // exclusive-running-sum packing bounds a group by target + its
      // final member.
      sorted.foreach { g =>
        assert(g._4 < 4.0 * mean + 2.0 * mean,
          s"$lang grp ${g._2}: ${g._4} bytes exceeds target + one small shard")
      }
    }
  }
}
