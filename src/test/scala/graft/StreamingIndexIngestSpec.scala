package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.similarity.AnnIvf

/** Streaming ingest composed with the persisted ANN index: new vectors
  * arrive as a file stream and foreachBatch appends them to the IVF
  * index via `AnnIvf.append` — assignment against the FROZEN persisted
  * centroids, no refit, existing files untouched. The daily-ingest loop
  * of a 100 TB embedding corpus is exactly this composition; the proof
  * is that a stream-ingested index answers every query identically to
  * one built by a single batch append over the same split.
  */
class StreamingIndexIngestSpec extends SparkSpec {

  private def emb: DataFrame =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  test("stream-appended IVF index answers searches identically to batch append") {
    val base = emb.filter(col("vec_id") % 2 === 0)   // initial corpus
    val incoming = emb.filter(col("vec_id") % 2 === 1) // the ingest wave
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))

    // Index A: fit on the base, append the wave in ONE batch call.
    val idxBatch = graft.core.TempDirs.create("graft-ivf-batch")
    AnnIvf.fit(base, idxBatch, k = 8)
    AnnIvf.append(spark, idxBatch, incoming)

    // Index B: same fit, wave arrives as a 4-chunk file stream through
    // foreachBatch -> AnnIvf.append.
    val idxStream = graft.core.TempDirs.create("graft-ivf-stream")
    AnnIvf.fit(base, idxStream, k = 8)
    val waveDir = graft.core.TempDirs.create("graft-ivf-wave")
    incoming.withColumn("chunk", pmod(col("vec_id"), lit(4)))
      .write.partitionBy("chunk").mode("overwrite").parquet(waveDir)
    val chk = graft.core.TempDirs.create("graft-ivf-chk")
    val q = spark.readStream
      .schema("vec_id BIGINT, emb ARRAY<DOUBLE>")
      .option("maxFilesPerTrigger", "2") // force multiple micro-batches
      .parquet(s"$waveDir/chunk=*")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        AnnIvf.append(spark, idxStream, batch.toDF())
      }
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // Both indexes hold the full corpus...
    val nAll = emb.count()
    assert(spark.read.parquet(s"$idxStream/assigned").count() == nAll)
    assert(spark.read.parquet(s"$idxBatch/assigned").count() == nAll)
    // ...and answer identically (same frozen centroids -> same cells ->
    // same candidates -> same exact rerank).
    def answers(idx: String) =
      AnnIvf.search(spark, idx, queries, nprobe = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(answers(idxStream) == answers(idxBatch),
      "stream-ingested index diverged from the batch-appended twin")
  }
}
