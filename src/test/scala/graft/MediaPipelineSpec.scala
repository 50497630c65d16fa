package graft

import graft.multimodal.MediaPipeline
import graft.multimodal.MediaPipeline.MediaRow

/** Multimodal plumbing: typed schema, mapPartitions batch shape, and
  * decode-stub determinism (the codec itself is stubbed — container has
  * no media libraries; SURVEY.md north star). */
class MediaPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val payloads = Seq(
    MediaRow(1L, "image/fake", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)),
    MediaRow(2L, "audio/fake", "hello world hello world".getBytes("UTF-8")),
    MediaRow(3L, "video/fake", Array.tabulate(256)(i => (i % 127).toByte)))

  test("extract produces deterministic fake features with correct schema") {
    val ds = spark.createDataset(payloads).repartition(2)
    val out1 = MediaPipeline.extract(ds).collect().sortBy(_.docId)
    val out2 = MediaPipeline.extract(ds).collect().sortBy(_.docId)
    assert(out1.length == 3)
    assert(out1.map(_.byteLen).toSeq == Seq(10, 23, 256))
    // determinism across runs and partitionings
    out1.zip(out2).foreach { case (a, b) =>
      assert(a.width == b.width && a.height == b.height)
      assert(a.featureVec.toSeq == b.featureVec.toSeq)
      assert(a.frameSample.toSeq == b.frameSample.toSeq)
    }
    // dimensions are in the fake decoder's declared range
    out1.foreach { f =>
      assert(f.width >= 64 && f.width < 64 + 1024)
      assert(f.height >= 64 && f.height < 64 + 1024)
    }
  }

  test("frame sample takes every 8th byte up to 16 frames") {
    val fs = MediaPipeline.frameSample(Array.tabulate(200)(_.toByte))
    assert(fs.toSeq == (0 until 200 by 8).take(16).map(_.toByte))
  }

  test("resize stub downsamples deterministically and handles edges") {
    val src = Array.tabulate(100)(_.toByte)
    val out = MediaPipeline.resizeStub(src, 10)
    assert(out.length == 10)
    assert(out.toSeq == MediaPipeline.resizeStub(src, 10).toSeq)
    assert(MediaPipeline.resizeStub(Array.empty[Byte], 10).isEmpty)
    assert(MediaPipeline.resizeStub(src, 0).isEmpty)
    // target larger than payload: capped at payload length, no index error
    assert(MediaPipeline.resizeStub(Array[Byte](1, 2, 3), 10).toSeq == Seq[Byte](1, 2, 3))
  }

  test("payload fixture is authored at most once per session, revalidated after sweeps") {
    import java.nio.file.{Files, Paths}
    val d1 = MediaPipeline.payloadDir(spark, sf)
    val d2 = MediaPipeline.payloadDir(spark, sf)
    assert(d1 == d2, "second call must reuse the session-cached dir, not re-author")
    // A TempDirs sweep can delete the cached dir mid-session: the cache
    // must notice and re-author rather than scan a missing path.
    graft.core.TempDirs.delete(d1)
    val d3 = MediaPipeline.payloadDir(spark, sf)
    assert(d3 != d1 && Files.exists(Paths.get(d3)), "swept cache must re-author")
  }

  test("registry query runs over binaryFile-source payloads") {
    val df = MediaPipeline.query(spark, sf)
    assert(df.count() > 0)
    assert(df.columns.toSeq == Seq("doc_id", "byte_len", "width", "height", "f0"))
  }

  test("binaryFile scan hands back byte-exact payloads") {
    import org.apache.spark.sql.functions._
    // Features computed from binary-source rows must equal features
    // computed straight from the documents' text bytes — any scan-side
    // byte corruption or misattributed path→doc_id mapping breaks this.
    val viaFiles = MediaPipeline.query(spark, sf).collect().map(_.toString).toSeq
    val direct = {
      import spark.implicits._
      val rows = graft.core.Tables.t(spark, sf, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          MediaPipeline.MediaRow(id, "application/octet-stream", text.getBytes("UTF-8")) }
      MediaPipeline.extract(rows)
        .select(col("docId").as("doc_id"), col("byteLen").as("byte_len"),
          col("width"), col("height"),
          round(element_at(col("featureVec"), 1), 4).as("f0"))
        .orderBy("doc_id").collect().map(_.toString).toSeq
    }
    assert(viaFiles.nonEmpty && viaFiles == direct)
  }
}
