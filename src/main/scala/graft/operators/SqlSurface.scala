package graft.operators

import graft.engine.{GraftSession, QueryPack}

/** Pure-SQL surface (spark.sql over the registered catalog): correlated
  * scalar subqueries, LATERAL top-n-per-group, recursive CTEs. These
  * exercise Catalyst's subquery decorrelation (rewritten to joins — no
  * per-row execution) and the Spark 4 recursive-CTE machinery, and
  * prove the engine's SQL entry point end-to-end: the same statements
  * run verbatim on DuckDB as their own oracle. */
object SqlSurface extends QueryPack {

  private def sql(q: String): Q = (s, d) => {
    GraftSession.openCatalog(s, d)
    s.sql(q)
  }

  private val scalarSubquery =
    """SELECT o_orderkey,
      |  (SELECT c_name FROM customer WHERE c_custkey = o_custkey) AS cust_name,
      |  o_totalprice
      |FROM orders ORDER BY o_orderkey""".stripMargin

  private val lateralTopN =
    """SELECT c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer,
      |  LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |           WHERE o_custkey = c_custkey
      |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |ORDER BY c_custkey, t.o_orderkey""".stripMargin

  private val recursiveCte =
    """WITH RECURSIVE r(n) AS (
      |  SELECT 0
      |  UNION ALL
      |  SELECT n + 1 FROM r WHERE n < 90)
      |SELECT n, n % 7 AS dow, n * n AS sq FROM r ORDER BY n""".stripMargin

  override def queries: Map[String, Q] = Map(
    "q_scalar_subquery" -> sql(scalarSubquery),
    "q_lateral_topn" -> sql(lateralTopN),
    "q_recursive_cte" -> sql(recursiveCte))

  // the SQL is its own oracle — identical text runs on DuckDB
  override def oracle: Map[String, String] = Map(
    "q_scalar_subquery" -> scalarSubquery,
    "q_lateral_topn" -> lateralTopN,
    "q_recursive_cte" -> recursiveCte)
}
