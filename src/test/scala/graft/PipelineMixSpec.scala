package graft

import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** Temperature-mix and shard-export operators (training-data pipeline
  * additions, round 7). The DuckDB hash-match proves engine agreement;
  * these specs lock the SEMANTICS: temperature re-weighting must move
  * every lang's share toward uniform (the whole point of the mT5/XLM-R
  * scheme), the deterministic epoch assignment must track its target
  * factor, and the shard manifest must describe exactly the files a real
  * partitioned export writes.
  */
class PipelineMixSpec extends SparkSpec {

  private lazy val mix =
    TextOps.queries("q_temperature_mix")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6)))
      .toMap

  test("temperature re-weighting pulls every lang's share toward uniform") {
    val n = mix.size
    mix.foreach { case (lang, (_, pNat, pTemp, _, _)) =>
      val toUniform = math.abs(pTemp - 1.0 / n) <= math.abs(pNat - 1.0 / n) + 1e-9
      assert(toUniform, s"$lang: p_temp=$pTemp further from 1/$n than p_nat=$pNat")
    }
    assert(math.abs(mix.values.map(_._3).sum - 1.0) < 1e-4, "sum q != 1")
    assert(math.abs(mix.values.map(_._2).sum - 1.0) < 1e-4, "sum p != 1")
  }

  test("majority lang downsamples, minority langs upsample") {
    val byShare = mix.toSeq.sortBy(_._2._2)
    val (_, (_, _, _, fMax, _)) = byShare.head
    val (_, (_, _, _, fMin, _)) = byShare.last
    assert(fMin < 1.0, s"largest lang should have factor < 1, got $fMin")
    assert(fMax > 1.0, s"smallest lang should have factor > 1, got $fMax")
  }

  test("deterministic epoch assignment tracks the target factor") {
    mix.foreach { case (lang, (docs, _, _, factor, planned)) =>
      val target = factor * docs
      // md5 buckets are uniform but finite: allow sampling noise of
      // ~2·sqrt(docs) around the expectation, floored for tiny strata.
      val slack = math.max(2.0 * math.sqrt(docs.toDouble), 4.0)
      assert(math.abs(planned - target) <= slack,
        s"$lang: planned=$planned vs target=$target (docs=$docs, slack=$slack)")
    }
  }

  test("shard manifest matches a real partitioned export") {
    val manifest = TextOps.queries("q_shard_manifest")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(manifest.values.map(_._1).sum == total, "manifest loses docs")
    assert(manifest.keySet.subsetOf((0L until 16L).toSet), "shard out of range")

    val out = graft.core.TempDirs.create("graft-shard-export")
    val bucket = expr(
      "(instr('0123456789abcdef', substring(md5(cast(doc_id AS string)), 1, 1)) - 1) * 16" +
        " + (instr('0123456789abcdef', substring(md5(cast(doc_id AS string)), 2, 1)) - 1)")
    spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("shard", (bucket % 16).cast("long"))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(out)

    val written = spark.read.parquet(out)
    assert(written.count() == total, "export loses docs")
    // partitionBy writes the shard as a directory key, so the read-back
    // infers int — normalize before comparing against the manifest.
    val perShard = written.groupBy(col("shard").cast("long").as("shard"))
      .count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perShard == manifest.view.mapValues(_._1).toMap,
      "manifest disagrees with the files actually written")
  }
}
