package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Source/sink format coverage beyond parquet: ORC, CSV, JSON-lines,
  * and compression codecs all round-trip the same data. */
class FormatsSpec extends SparkTestBase {

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private lazy val sample = Tables.t(spark, sf, "orders")
    .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"))

  private def assertRoundTrip(df: org.apache.spark.sql.DataFrame): Unit = {
    assert(df.count() == sample.count())
    assert(df.exceptAll(sample).isEmpty && sample.exceptAll(df).isEmpty)
  }

  test("ORC round-trip") {
    val d = tmp("orc")
    sample.write.mode("overwrite").orc(d)
    assertRoundTrip(spark.read.orc(d))
  }

  test("CSV round-trip (header + explicit schema)") {
    val d = tmp("csv")
    sample.write.mode("overwrite").option("header", "true").csv(d)
    assertRoundTrip(spark.read.option("header", "true")
      .schema(sample.schema).csv(d))
  }

  test("JSON-lines round-trip") {
    val d = tmp("json")
    sample.write.mode("overwrite").json(d)
    assertRoundTrip(spark.read.schema(sample.schema).json(d))
  }

  test("parquet zstd compression round-trips and actually compresses") {
    val d = tmp("zstd")
    sample.write.mode("overwrite")
      .option("compression", "zstd").parquet(d)
    assertRoundTrip(spark.read.parquet(d))
    val files = new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.getName.contains("zstd")))
  }
}
