package graft

import graft.engine.{Metrics, Tables}

/** QueryExecutionListener observability: every action emits one
  * structured event (crocus A27 analog). */
class MetricsSpec extends SparkTestBase {

  test("listener records completed actions as structured events") {
    val listener = Metrics.attach(spark)
    try {
      Tables.t(spark, sf, "nation").count()
      q("q_agg_distinct").collect()
      // listener callbacks are async — poll until delivered
      var lines = Seq.empty[String]
      val deadline = System.currentTimeMillis() + 10000
      while (lines.size < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        lines = lines ++ listener.drainJson()
      }
      assert(lines.size >= 2, lines.mkString("\n"))
      assert(lines.forall(_.contains("\"ok\":true")), lines.mkString("\n"))
      assert(lines.exists(_.contains("\"plan_nodes\":")), lines.mkString("\n"))
    } finally spark.listenerManager.unregister(listener)
  }
}
