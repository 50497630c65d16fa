package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Same-JVM AQE on/off A/B for one registry query (VERDICT r16 item 1):
  * interleaved min-of-N timings — immune to this machine's ±50% window
  * drift like EdgeAb/SpanAb — plus the EXECUTED plan under each mode
  * (with AQE on that is the final adaptive plan, captured after the run,
  * so the on/off diff shows exactly which node AQE rescued: a runtime
  * broadcast, a coalesce, a skew split).
  *
  *   sbt "runMain graft.tools.AqeAb q_simhash 5 plans/r17"
  *
  * Third arg (optional): directory to write <query>_aqe_{on,off}.txt.
  */
object AqeAb {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_simhash")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def setAqe(on: Boolean): Unit =
      s.conf.set("spark.sql.adaptive.enabled", on.toString)
    def run(): (Double, org.apache.spark.sql.DataFrame) = {
      // Timer starts BEFORE construction: eager queries (index fits,
      // iteration loops, Materialize barriers) do their real work at
      // DataFrame-construction time — Bench.runAt times it the same way.
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(s, dir)
      df.write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, df)
    }
    setAqe(true); run() // warm codegen/footers per mode, as in Bench
    setAqe(false); run()
    setAqe(true)
    val on = collection.mutable.ArrayBuffer[Double]()
    val off = collection.mutable.ArrayBuffer[Double]()
    var lastOn: org.apache.spark.sql.DataFrame = null
    var lastOff: org.apache.spark.sql.DataFrame = null
    for (_ <- 1 to reps) {
      setAqe(true); val (ta, da) = run(); on += ta; lastOn = da
      setAqe(false); val (tb, db) = run(); off += tb; lastOff = db
    }
    setAqe(true)
    println(f"$name aqe_on  reps=${on.map(x => f"$x%.3f").mkString(",")} min=${on.min}%.3f")
    println(f"$name aqe_off reps=${off.map(x => f"$x%.3f").mkString(",")} min=${off.min}%.3f")
    args.lift(2).foreach { outDir =>
      Files.createDirectories(Paths.get(outDir))
      def dump(suffix: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val txt = df.queryExecution.executedPlan.toString
        Files.write(Paths.get(outDir, s"${name}_aqe_$suffix.txt"),
          (s"// $name @ $dir — executedPlan after run, aqe=$suffix\n" + txt)
            .getBytes(StandardCharsets.UTF_8))
        println(s"wrote $outDir/${name}_aqe_$suffix.txt")
      }
      dump("on", lastOn)
      dump("off", lastOff)
    }
    graft.core.TempDirs.cleanupAll()
    s.stop()
  }
}
