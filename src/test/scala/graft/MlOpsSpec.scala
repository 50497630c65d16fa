package graft

import graft.queries.MlOps

/** Ground-truth recomputation for the model-evaluation operators
  * (sf0.001 = 500 docs / 1000 events), sharing no code path with the
  * operators under test: AUC by brute-force pairwise comparison, OLS by
  * a sequential textbook loop, the weighted sample by a sequential
  * cumulative scan — plus the distributed-prefix-sum identity and a
  * partitioning-invariance check for the sampler.
  */
class MlOpsSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "source", "lang", "n_chars").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q_auc_rank equals brute-force pairwise AUC per source") {
    val expected = docs.groupBy(_._2).flatMap { case (src, xs) =>
      val pos = xs.filter(_._3 == "en").map(_._4.toDouble)
      val neg = xs.filterNot(_._3 == "en").map(_._4.toDouble)
      if (pos.isEmpty || neg.isEmpty) None
      else {
        val wins = (for (p <- pos; q <- neg)
          yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
        Some(src -> BigDecimal(wins / (pos.length.toLong * neg.length))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val got = MlOps.queries("q_auc_rank")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, auc) =>
      assert(math.abs(got(src) - auc) < 1e-9, s"$src: ${got(src)} vs $auc")
    }
  }

  test("q_linreg_closed matches a sequential textbook OLS") {
    val rows = graft.core.Tables.t(spark, sf, "events")
      .selectExpr("event_type",
        "CAST(CAST(value AS DECIMAL(18,4)) * 100 AS LONG) AS iv",
        "unix_micros(date_trunc('DAY', ts)) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val d0 = rows.map(_._3).min
    val expected = rows.groupBy(_._1).map { case (et, xs) =>
      val pts = xs.map { case (_, iv, day) => ((day - d0).toDouble, iv / 100.0) }
      val n = pts.length
      val mx = pts.map(_._1).sum / n
      val my = pts.map(_._2).sum / n
      val sxy = pts.map { case (x, y) => (x - mx) * (y - my) }.sum
      val sxx = pts.map { case (x, _) => (x - mx) * (x - mx) }.sum
      et -> (sxy / sxx, my - (sxy / sxx) * mx)
    }
    val got = MlOps.queries("q_linreg_closed")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (et, (slope, icept)) =>
      assert(math.abs(got(et)._1 - slope) < 1e-4, s"$et slope")
      assert(math.abs(got(et)._2 - icept) < 1e-4, s"$et intercept")
    }
  }

  test("q_calibration_bins: bins partition the corpus, scores sit in-bin") {
    val out = MlOps.queries("q_calibration_bins")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val eligible = docs.groupBy(_._2).filter(_._2.length > 1).map(_._2.length).sum
    assert(out.map(_._2).sum == eligible, "every scoreable doc lands in a bin")
    out.foreach { case (bin, _, avgScore, fracPos) =>
      assert(avgScore >= bin / 10.0 - 1e-9 &&
        avgScore <= (bin + 1) / 10.0 + (if (bin == 9) 1e-9 else 1e-9),
        s"bin $bin mean score $avgScore outside its decile")
      assert(fracPos >= 0.0 && fracPos <= 1.0)
    }
    assert(out.map(_._1).toSeq == out.map(_._1).toSeq.sorted)
  }

  test("q_weighted_sample equals a sequential cumulative-stride scan") {
    val byHash = docs.map { case (id, _, _, nc) => (md5hex(id.toString), id, nc.toLong) }
      .sortBy(x => (x._1, x._2))
    val tot = byHash.map(_._3).sum
    var cum = 0L
    val expected = byHash.flatMap { case (_, id, wt) =>
      cum += wt
      val hi = cum * MlOps.SampleK / tot
      val lo = (cum - wt) * MlOps.SampleK / tot
      if (hi > lo) Some((id, wt, lo)) else None
    }.toSet
    val got = MlOps.queries("q_weighted_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"extra=${got.diff(expected)} missing=${expected.diff(got)}")
    // Heavier docs are proportionally likelier to straddle a stride:
    // the sample's mean weight must exceed the corpus mean.
    val meanW = tot.toDouble / byHash.length
    val sampleMean = got.toSeq.map(_._2).sum.toDouble / got.size
    assert(sampleMean > meanW, s"weighted sample mean $sampleMean <= $meanW")
  }

  test("q_weighted_sample is invariant under input repartitioning") {
    val base = MlOps.queries("q_weighted_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val parts = Seq(1, 7).map { n =>
      val dir = graft.core.TempDirs.create("graft-mlops-repart")
      spark.read.parquet(s"$sf/documents.parquet").repartition(n)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // t() loads lazily — only documents must exist under the dir.
      val got = MlOps.queries("q_weighted_sample")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      graft.core.TempDirs.delete(dir)
      got
    }
    parts.foreach(p => assert(p == base, "sample changed under repartition"))
  }
}
