package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump formatted plans for a SUBSET of queries (r17 plan artifacts):
  * runMain graft.PlanOne <sfDir> <outDir> <suffix> <q1> [q2 ...] */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args.drop(3)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", Files
        .createTempDirectory("graft-planone-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_PLAN_EXEC=1 (r18): dump the EXECUTED plan for every
    // query, not just Deferred ones — the post-AQE tree is the only
    // place runtime re-optimization (AQEShuffleRead coalescing, join
    // rewrites, the cached-plan partitioning change) is visible; the
    // static FormattedMode text is identical across those confs.
    val execAll = sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val pre = df.queryExecution.explainString(FormattedMode).trim
      val txt = if (execAll || pre.contains("Deferred")) {
        df.write.format("noop").mode("overwrite").save()
        df.queryExecution.executedPlan.toString.trim
      } else pre
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[planone] wrote $name")
    }
    spark.stop()
  }
}
