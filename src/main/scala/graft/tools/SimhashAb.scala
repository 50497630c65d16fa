package graft.tools

/** Scratch same-JVM A/B (round 17): q_simhash vote aggregation in two
  * exchanges (distinct (doc,tok) counts, then 48 doc sums — the shape
  * the r17 vocab-join removal left) vs ONE exchange (votes summed over
  * raw token OCCURRENCES — sum(cnt·sgn) over distinct pairs equals
  * sum(sgn) over occurrences, so the (doc_id, tok) pre-aggregation and
  * its corpus-keyed exchange disappear; md5 runs per occurrence instead
  * of per distinct pair). Interleaved min-of-5, both AQE modes.
  */
object SimhashAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.t(s, dir, "documents").createOrReplaceTempView("documents")
    val sgnSums = (0 until 48).map { b =>
      val sh = 4 * (11 - b / 4) + (b % 4)
      s"sum(cnt * (2 * (shiftright(v, $sh) % 2) - 1)) AS v$b"
    }.mkString(",\n")
    val sgnSumsOcc = (0 until 48).map { b =>
      val sh = 4 * (11 - b / 4) + (b % 4)
      s"sum(2 * (shiftright(v, $sh) % 2) - 1) AS v$b"
    }.mkString(",\n")
    val fromVotes = (0 until 48)
      .map(b => s"CASE WHEN v$b > 0 THEN ${1L << b}L ELSE 0L END")
      .mkString(" + ")
    val twoEx = s"""
      WITH tok AS (
        SELECT doc_id, tok, count(*) AS cnt FROM (
          SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY doc_id, tok),
      tokv AS (
        SELECT doc_id, cnt,
               CAST(conv(substring(md5(tok), 1, 12), 16, 10) AS BIGINT) AS v
        FROM tok),
      bitvotes AS (SELECT doc_id, $sgnSums FROM tokv GROUP BY doc_id),
      fp AS (SELECT doc_id, $fromVotes AS simhash FROM bitvotes)
      SELECT doc_id, simhash FROM fp ORDER BY doc_id"""
    val oneEx = s"""
      WITH occ AS (
        SELECT doc_id,
               CAST(conv(substring(md5(tok), 1, 12), 16, 10) AS BIGINT) AS v
        FROM (SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''),
      bitvotes AS (SELECT doc_id, $sgnSumsOcc FROM occ GROUP BY doc_id),
      fp AS (SELECT doc_id, $fromVotes AS simhash FROM bitvotes)
      SELECT doc_id, simhash FROM fp ORDER BY doc_id"""
    def time(q: String): Double = {
      val t0 = System.nanoTime()
      s.sql(q).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Value identity first: occurrence sums must equal weighted sums.
    val d = s.sql(twoEx).exceptAll(s.sql(oneEx)).count() +
      s.sql(oneEx).exceptAll(s.sql(twoEx)).count()
    println(s"row diff = $d (must be 0)")
    for (aqe <- Seq("true", "false")) {
      s.conf.set("spark.sql.adaptive.enabled", aqe)
      time(twoEx); time(oneEx) // warm
      val (a, b) = (collection.mutable.ArrayBuffer[Double](),
        collection.mutable.ArrayBuffer[Double]())
      for (_ <- 1 to 5) { a += time(twoEx); b += time(oneEx) }
      println(f"aqe=$aqe two-exchange reps=${a.map(x => f"$x%.3f").mkString(",")} min=${a.min}%.3f")
      println(f"aqe=$aqe one-exchange reps=${b.map(x => f"$x%.3f").mkString(",")} min=${b.min}%.3f")
    }
    s.stop()
  }
}
