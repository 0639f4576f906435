package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one per suite via lazy val).
  * SPARK_GRAFT_TEST_CPUS (default 4) sets cores AND shuffle
  * partitions — running the suite at a different value is the
  * partition-invariance sweep for every determinism claim.
  * Deliberately NOT the SPARK_GRAFT_CPUS knob Bench/Verify honor:
  * the driver exports that for perf runs, and tests must keep their
  * fixed default unless the sweep is requested explicitly. */
trait SparkTestBase extends AnyFunSuite {
  private val cpus: Int = {
    val raw = sys.env.getOrElse("SPARK_GRAFT_TEST_CPUS", "4")
    try raw.toInt
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(
        s"SPARK_GRAFT_TEST_CPUS must be an integer, got '$raw'") }
  }
  lazy val spark: SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.extensions", "graft.engine.GraftExtensions")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  def q(name: String) = SparkEntry.queries(name)(spark, sf)
}
