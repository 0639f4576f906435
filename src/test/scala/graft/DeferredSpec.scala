package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.Deferred

/** plans.Deferred contract: the body runs at first EXECUTION (never at
  * build), exactly once per built DataFrame even across re-executions
  * and plan copies, with the declared schema enforced at
  * materialization. */
class DeferredSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("sq", LongType)))

  test("body runs once per built DataFrame, at first action") {
    val calls = new AtomicInteger
    val df = Deferred.df(spark, "spec_once", schema) { () =>
      calls.incrementAndGet()
      spark.range(10).select(col("id"), (col("id") * col("id")).as("sq"))
    }
    assert(calls.get() == 0, "body ran at build time")
    assert(df.count() == 10)
    assert(df.agg(sum(col("sq"))).collect()(0).getLong(0) == 285)
    assert(calls.get() == 1, s"body ran ${calls.get()} times")
  }

  test("deferred relations join with ordinary plans (inner plan fully optimized)") {
    val df = Deferred.df(spark, "spec_join", schema) { () =>
      spark.range(5).select(col("id"), (col("id") * col("id")).as("sq"))
    }
    val other = spark.range(3).select(col("id"), lit("x").as("tag"))
    val joined = df.join(other, Seq("id")).orderBy(col("id")).collect()
    assert(joined.length == 3 && joined.map(_.getLong(1)).toSeq == Seq(0L, 1L, 4L))
  }

  test("declared-schema drift fails fast at materialization") {
    val bad = Deferred.df(spark, "spec_drift", schema) { () =>
      spark.range(3).select(col("id"), lit("not a long").as("sq"))
    }
    val e = intercept[Exception] { bad.count() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("spec_drift")), e.toString)
  }

  test("explain before execution is free and shows the unbuilt marker") {
    val calls = new AtomicInteger
    val df = Deferred.df(spark, "spec_explain", schema) { () =>
      calls.incrementAndGet()
      spark.range(2).select(col("id"), col("id").as("sq"))
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("spec_explain") && plan.contains("unbuilt"), plan)
    assert(calls.get() == 0)
    assert(df.count() == 2 && calls.get() == 1)
  }
}
