object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q43_minhash_lsh")(spark, "/root/testdata/sf0.01")
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    println("ReusedExchange count: " + "ReusedExchange".r.findAllIn(p).length)
    println("HashAggregate(keys=[doc_id" + ": " + "HashAggregate\\(keys=\\[doc_id".r.findAllIn(p).length)
    println("FileScan count: " + "FileScan".r.findAllIn(p).length)
    spark.stop()
  }
}
