package graft.tools

import org.apache.spark.sql.functions._

/** Scratch micro-A/B for the IVF assign stage: where do the ~100 us/row
  * go — the broadcast cross join, the cosine projection, or the max_by
  * struct aggregation? */
object AssignAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.ensureRegistered(s)
    val e = graft.core.Tables.t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .repartition(32, col("vec_id"))
    e.write.mode("overwrite").parquet("/tmp/assign_ab_e")
    val en = s.read.parquet("/tmp/assign_ab_e")
    val k = graft.similarity.AnnIvf.chooseK(en.count())
    val stride = math.max(1L, 2000 / k)
    val seedsDf = en.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
    seedsDf.write.mode("overwrite").parquet("/tmp/assign_ab_c")
    val c = s.read.parquet("/tmp/assign_ab_c")
    def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.CosineSimilarity.cosine(a, b)
    def joinOnly() = en.join(broadcast(c)).select(col("vec_id"), col("cid"))
    def scored() = en.join(broadcast(c))
      .select(col("vec_id"), col("cid"), cosine(col("emb"), col("cemb")).as("csim"))
    def full() = scored()
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("csim"), (-col("cid")).as("ord"))).as("cid"))
    def fullMaxStruct() = scored()
      .groupBy(col("vec_id"))
      .agg(max(struct(col("csim"), (-col("cid")).as("ord"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))
    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(joinOnly _); time(scored _); time(full _); time(fullMaxStruct _)
    def reps(n: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val a = Seq.fill(4)(time(f))
      println(f"$n%-14s reps=${a.map(x => f"$x%.3f").mkString(",")} min=${a.min}%.3f")
    }
    reps("join-only", joinOnly _)
    reps("join+cosine", scored _)
    reps("full-max_by", full _)
    reps("full-maxstruct", fullMaxStruct _)
    s.stop()
  }
}
