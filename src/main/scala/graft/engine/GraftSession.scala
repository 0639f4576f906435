package graft.engine

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Spark-native session integration.
  *
  * `GraftExtensions` registers the engine's Catalyst expressions through
  * SparkSessionExtensions (builder `.withExtensions(new GraftExtensions)`
  * or conf `spark.sql.extensions=graft.engine.GraftExtensions`), so
  * `spark.sql("SELECT dot_d(a, b) ...")` works with zero imperative
  * setup. `openCatalog` exposes the testdata tables as temp views for
  * the pure-SQL surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.RankFilterToAggregate)
    def info(name: String) =
      new ExpressionInfo("graft.functions", name)
    e.injectFunction((FunctionIdentifier("dot_d"), info("dot_d"),
      (es: Seq[Expression]) => DotProductD(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("parse_locale_pct"), info("parse_locale_pct"),
      (es: Seq[Expression]) => ParseLocalePct(es.head)))
    e.injectFunction((FunctionIdentifier("parse_locale_money"), info("parse_locale_money"),
      (es: Seq[Expression]) => ParseLocaleMoney(es.head)))
    e.injectFunction((FunctionIdentifier("parse_date_it"), info("parse_date_it"),
      (es: Seq[Expression]) => ParseDateIt(es.head)))
  }
}

object GraftSession {
  /** Temp views for every testdata table → full spark.sql surface. */
  def openCatalog(spark: SparkSession, dir: String): Unit = {
    GraftFunctions.register(spark)
    Tables.names.foreach { n =>
      Tables.t(spark, dir, n).createOrReplaceTempView(n)
    }
  }
}
