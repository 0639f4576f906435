package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{QueryPack, Tables}
import graft.engine.Tables.{dec2, dec4, dsum2, dsum4}

/** Relational core: scan/filter/project, the join family, aggregation,
  * set ops, top-k (SURVEY.md §2B, generalizing §2A A1-A17).
  *
  * Scale notes (100 TB design point):
  *  - filters/projections are plain Catalyst expressions → pushed into
  *    the parquet scan (PushedFilters / ReadSchema);
  *  - small dimensions (part, nation, region, supplier) are broadcast —
  *    no shuffle of the fact table for those joins;
  *  - big-big joins (orders⋈customer, lineitem⋈orders) shuffle on the
  *    join key once; aggregations reuse partial (map-side) aggregation;
  *  - AQE (enabled in session conf) coalesces post-shuffle partitions
  *    and splits skewed ones at runtime.
  */
object Relational extends QueryPack {

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))

  private val bucketed =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Land customer+orders as co-bucketed sorted managed tables, once
    * per (process, sf dir) — the A28 write-once layout; names carry a
    * digest of the ABSOLUTE fixture path so differently-scaled (or
    * differently-spelled) fixtures never collide in-session. */
  private[graft] def bucketedBase(s: SparkSession, d: String): (String, String) = {
    // ONE derived count for both tables (Layout.bucketsFor, from the
    // larger side): co-bucketed joins elide BOTH Exchanges only when
    // the counts match — deriving per-table would silently reintroduce
    // one side's shuffle the first time the sizes diverge
    val bk = graft.engine.Layout.bucketsFor(s"$d/orders.parquet")
    val h = Tables.md5hex(new java.io.File(d).getAbsolutePath) + s"b$bk"
    bucketed.computeIfAbsent(h, _ => {
      val oT = s"graft_orders_bkt_$h"
      val cT = s"graft_customer_bkt_$h"
      graft.engine.Layout.writeBucketed(
        Tables.t(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        oT, "o_custkey", bk)
      graft.engine.Layout.writeBucketed(
        Tables.t(s, d, "customer"), cT, "c_custkey", bk)
      (oT, cT)
    })
  }

  override def queries: Map[String, Q] = Map(
    "q_scan_project" -> ((s, d) => {
      Tables.t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q_filter_pred" -> ((s, d) => {
      Tables.t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1998-01-01 00:00:00") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 25)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
          col("l_discount"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q_join_inner" -> ((s, d) => {
      Tables.t(s, d, "orders")
        .join(Tables.t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"), "inner")
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"),
          col("c_mktsegment"))
        .orderBy(col("o_orderkey"))
    }),

    // The A28 memoized-layout claim on the QUERY surface (VERDICT r11
    // missing #3): customer and orders land ONCE as co-bucketed +
    // sorted managed tables (engine/Layout.writeBucketed, Layout.bucketsFor-derived buckets on
    // the customer key); the per-customer aggregate and the join then
    // run with ZERO hash-partitioning Exchange — the aggregation rides
    // the bucketed scan's partitioning and the join matches bucket
    // layouts on both sides (plan-pinned in PlanSpec). The merge hint
    // pins the non-broadcast path: at real scale neither side fits a
    // broadcast, which is exactly when the write-once layout pays for
    // every subsequent join. Oracled: DuckDB recomputes the same
    // aggregate+join from the raw parquet, so the bucketed write→read
    // round trip is value-checked.
    "q_join_bucketed" -> ((s, d) => {
      val custT = Tables.t(s, d, "customer").schema("c_custkey").dataType
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c_custkey", custT),
        org.apache.spark.sql.types.StructField("c_mktsegment",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_orders",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("spend",
          org.apache.spark.sql.types.DoubleType)))
      graft.plans.Deferred.df(s, "join_bucketed", schema) { () =>
        val (ordersT, custTbl) = bucketedBase(s, d)
        val o = graft.engine.Layout.readTable(s, ordersT)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(dec2(col("o_totalprice"))).as("spend_d"))
        graft.engine.Layout.readTable(s, custTbl)
          .hint("merge") // never broadcast: the layout IS the point
          .join(o, col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("c_mktsegment"), col("n_orders"),
            col("spend_d").cast("double").as("spend"))
          .orderBy(col("c_custkey"))
      }
    }),

    "q_join_broadcast" -> ((s, d) => {
      Tables.t(s, d, "lineitem")
        .join(broadcast(Tables.t(s, d, "part").filter(col("p_size") <= 10)),
          col("l_partkey") === col("p_partkey"), "inner")
        .select(col("l_orderkey"), col("l_linenumber"), col("p_name"),
          col("p_brand"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // TPC-H Q5 shape: local-supplier revenue by nation.
    "q_join_multiway" -> ((s, d) => {
      val c = Tables.t(s, d, "customer"); val o = Tables.t(s, d, "orders")
      val l = Tables.t(s, d, "lineitem"); val su = Tables.t(s, d, "supplier")
      val n = Tables.t(s, d, "nation"); val r = Tables.t(s, d, "region")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1998-01-01 00:00:00"))
        .groupBy(col("n_name"))
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    // Cross-catalog "confront" (crocus README.md:4): full-outer + diffs.
    "q_join_outer_diff" -> ((s, d) => {
      val cs = Tables.t(s, d, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"), dsum2(col("c_acctbal")).as("cust_bal"))
      val ss = Tables.t(s, d, "supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"), dsum2(col("s_acctbal")).as("supp_bal"))
      cs.join(ss, Seq("nk"), "full_outer")
        .select(col("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          (coalesce(col("n_cust"), lit(0L)) - coalesce(col("n_supp"), lit(0L)))
            .as("n_diff"),
          col("cust_bal"), col("supp_bal"))
        .orderBy(col("nk"))
    }),

    "q_join_semi" -> ((s, d) => {
      Tables.t(s, d, "customer")
        .join(Tables.t(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q_join_anti" -> ((s, d) => {
      Tables.t(s, d, "customer")
        .join(Tables.t(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // TPC-H Q1 shape; exact decimal sums → deterministic under parallelism.
    "q_agg_group" -> ((s, d) => {
      val l = Tables.t(s, d, "lineitem")
      l.filter(col("l_shipdate") <= ts("2001-09-01 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum2(col("l_quantity")).as("sum_qty"),
          dsum2(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (dsum2(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum4(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q_agg_distinct" -> ((s, d) => {
      Tables.t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))
    }),

    // HLL sketch — scale path for 100 TB distinct counts. Sketch impls
    // differ across engines → rows-only check (no oracle entry).
    "q_agg_approx_distinct" -> ((s, d) => {
      Tables.t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))
    }),

    "q_agg_rollup" -> ((s, d) => {
      Tables.t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("gflag"),
          grouping(col("l_linestatus")).cast("int").as("gstat"),
          dsum2(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("gflag"), col("gstat"), col("l_returnflag"),
          col("l_linestatus"))
    }),

    "q_agg_cube" -> ((s, d) => {
      Tables.t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("gflag"),
          grouping(col("l_linestatus")).cast("int").as("gstat"),
          dsum2(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("gflag"), col("gstat"), col("l_returnflag"),
          col("l_linestatus"))
    }),

    "q_grouping_sets" -> ((s, d) => {
      Tables.t(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("gflag"),
          grouping(col("l_linestatus")).cast("int").as("gstat"),
          dsum2(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("gflag"), col("gstat"), col("l_returnflag"),
          col("l_linestatus"))
    }),

    "q_sort_limit_topk" -> ((s, d) => {
      Tables.t(s, d, "orders")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // Union of 3 branches + last-wins key dedup — the reference's
    // {**equity, **bond, **multi_asset} merge (crocus vanguard.py:101-109).
    "q_union_dedup" -> ((s, d) => {
      val o = Tables.t(s, d, "orders")
      val b1 = o.select(col("o_orderkey").as("k"),
        col("o_totalprice").as("v"), lit(1).as("src"))
      val b2 = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("k"),
          (col("o_totalprice") * 0.5).as("v"), lit(2).as("src"))
      val b3 = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k"),
          (col("o_totalprice") * 0.25).as("v"), lit(3).as("src"))
      val w = Window.partitionBy(col("k")).orderBy(desc("src"))
      b1.unionByName(b2).unionByName(b3)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("k"), col("v"), col("src"))
        .orderBy(col("k"))
    }),

    // Pivot: order counts by status × priority (reporting surface).
    "q_pivot" -> ((s, d) => {
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val p = Tables.t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", prios)
        .agg(count(lit(1)))
      p.select(col("o_orderstatus") +:
          prios.map(n => coalesce(col(s"`$n`"), lit(0L)).as(n)): _*)
        .orderBy(col("o_orderstatus"))
    }),

    // Discrete percentiles (p50/p90) via window position — exact element
    // selection, no interpolation arithmetic to diverge between engines.
    // Sketch family member next to HLL/minhash/simhash: KLL-style
    // approximate percentiles — single-pass mergeable summaries, the
    // only percentile that works at 100 TB (the exact form below
    // needs a per-group full sort). Rows-only; tolerance vs the exact
    // discrete percentile asserted in RegressionSpec.
    "q_agg_approx_percentile" -> ((s, d) => {
      // r17 (guide §1.2 "don't compute things twice"): ONE sketch per
      // group serving both percentiles — the KLL/GK summary is built
      // from (column, accuracy) alone, the requested percentages only
      // index into it at output, so the two-sketch form computed the
      // identical summary twice. Values bit-identical by construction.
      Tables.t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          percentile_approx(col("o_totalprice"),
            array(lit(0.5), lit(0.9)), lit(10000)).as("aps"),
          count(lit(1)).as("n"))
        .select(col("o_orderstatus"),
          col("aps").getItem(0).as("ap50"),
          col("aps").getItem(1).as("ap90"), col("n"))
        .orderBy(col("o_orderstatus"))
    }),

    "q_agg_percentile" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.t(s, d, "orders")
        .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("o_orderstatus"))))
        .groupBy(col("o_orderstatus"))
        .agg(
          min(when(col("rn") === ceil(col("cnt") * 0.5), col("o_totalprice"))).as("p50"),
          min(when(col("rn") === ceil(col("cnt") * 0.9), col("o_totalprice"))).as("p90"),
          min(col("o_totalprice")).as("p_min"),
          max(col("o_totalprice")).as("p_max"))
        .orderBy(col("o_orderstatus"))
    }),

    // Unpivot/melt: wide metrics → long (metric, value) rows.
    "q_unpivot" -> ((s, d) => {
      Tables.t(s, d, "part")
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").as("price"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size"), col("price")), "metric", "value")
        .orderBy(col("p_partkey"), col("metric"))
    }),

    // Argmax/argmin aggregates — the reference's argmax-by-mtime
    // (crocus base_scraper.py:96) as max_by over a unique measure
    // (composite measure keeps ties impossible ⇒ deterministic).
    "q_agg_argmax" -> ((s, d) => {
      // round before the long cast: Spark cast(double as long) truncates
      // while DuckDB rounds - round() agrees on both engines
      val measure = round(col("o_totalprice") * 100, 0).cast("long") * 10000000000L +
        col("o_orderkey")
      Tables.t(s, d, "orders")
        .withColumn("m", measure)
        .groupBy(col("o_orderstatus"))
        .agg(max_by(col("o_orderkey"), col("m")).as("top_order"),
          min_by(col("o_orderkey"), col("m")).as("bottom_order"),
          max(col("o_totalprice")).as("top_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // Custom TypedImperativeAggregate: top-k keys per group by a unique
    // measure (bounded buffer; see functions/TopKBy.scala).
    "q_agg_topk" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val measure = round(col("o_totalprice") * 100, 0).cast("long") * 10000000000L +
        col("o_orderkey")
      Tables.t(s, d, "orders")
        .withColumn("m", measure)
        .groupBy(col("o_orderstatus"))
        .agg(call_function("top_k_by", col("o_orderkey"), col("m"), lit(3))
          .as("top3_arr"))
        .select(col("o_orderstatus"),
          expr("array_join(transform(top3_arr, x -> CAST(x AS STRING)), ',')")
            .as("top3"))
        .orderBy(col("o_orderstatus"))
    }),

    // Statistical aggregates from exact-decimal components: variance /
    // stddev / correlation computed by explicit formulas over exact
    // sums, so results are order-independent and bit-match the oracle
    // (running-moment implementations are partition-order dependent —
    // unusable for hash checks).
    "q_agg_stats" -> ((s, d) => {
      val q = dec2(col("l_quantity")); val p = dec2(col("l_extendedprice"))
      Tables.t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(q).cast("double").as("sum_q"),
          sum(q * q).cast("double").as("sum_qq"),
          sum(p).cast("double").as("sum_p"),
          sum(p * p).cast("double").as("sum_pp"),
          sum(q * p).cast("double").as("sum_qp"))
        // round derived stats well above double ulp: the multiply-
        // subtract chains can differ by 1 ulp across engines (FMA)
        .withColumn("var_q",
          round((col("sum_qq") - col("sum_q") * col("sum_q") / col("n")) / (col("n") - 1), 6))
        .withColumn("stddev_q", round(sqrt(col("var_q")), 6))
        .withColumn("corr_qp",
          round((col("n") * col("sum_qp") - col("sum_q") * col("sum_p")) /
            (sqrt(col("n") * col("sum_qq") - col("sum_q") * col("sum_q")) *
              sqrt(col("n") * col("sum_pp") - col("sum_p") * col("sum_p"))), 10))
        .select(col("l_returnflag"), col("n"), col("var_q"),
          col("stddev_q"), col("corr_qp"))
        .orderBy(col("l_returnflag"))
    }),

    // Null semantics: outer-join nulls, null-safe equality, coalesce
    // defaults, explicit null ordering.
    "q_null_semantics" -> ((s, d) => {
      val big = Tables.t(s, d, "orders").filter(col("o_totalprice") > 150000)
      Tables.t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_big"),
          max(dec2(col("o_totalprice"))).cast("double").as("mx"))
        .select(col("c_custkey"), col("n_big"),
          col("mx"),
          coalesce(col("mx"), lit(-1.0)).as("mx_dflt"),
          col("mx").isNull.cast("int").as("mx_is_null"),
          (col("mx") <=> lit(null).cast("double")).cast("int").as("mx_nullsafe_eq_null"))
        .orderBy(desc_nulls_last("mx"), col("c_custkey"))
    }),

    "q_intersect" -> ((s, d) => {
      Tables.t(s, d, "customer").select(col("c_custkey").as("k"))
        .intersect(Tables.t(s, d, "orders").select(col("o_custkey").as("k")))
        .orderBy(col("k"))
    }),

    "q_except" -> ((s, d) => {
      Tables.t(s, d, "customer").select(col("c_custkey").as("k"))
        .except(Tables.t(s, d, "orders").select(col("o_custkey").as("k")))
        .orderBy(col("k"))
    }),

    // Robust statistics: exact median and MAD (median absolute
    // deviation) per group via DISCRETE rank selection — the value AT
    // rank ceil(n/2), never an interpolation, so there is no midpoint
    // arithmetic to diverge between engines. Computed in HISTOGRAM
    // form: aggregate to (group, value, count) with map-side combine
    // first, then pick the rank from a cumulative sum over DISTINCT
    // values — the per-group ordered pass touches the compressed
    // histogram, not the raw rows. That is the scalable exact-median
    // shape: a raw row_number() over 3 status groups would sort the
    // whole fact table on 3 reducers; the histogram bounds the sorted
    // data by value cardinality. (The value at rank r is identical
    // either way — equal values are interchangeable at a rank
    // boundary.) Two passes by construction (MAD needs the median
    // first); the 3-row median table broadcasts back.
    "q_median_mad" -> ((s, d) => {
      val o = Tables.t(s, d, "orders")
        .select(col("o_orderstatus"), col("o_totalprice"))
      def rankPick(df: DataFrame, valCol: String, out: String): DataFrame = {
        val hist = df.groupBy(col("o_orderstatus"), col(valCol))
          .agg(count(lit(1)).as("c"))
        val wc = Window.partitionBy(col("o_orderstatus")).orderBy(col(valCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wn = Window.partitionBy(col("o_orderstatus"))
        hist
          .withColumn("cum", sum(col("c")).over(wc))
          .withColumn("n", sum(col("c")).over(wn))
          // first value whose cumulative count reaches rank ceil(n/2)
          .filter(col("cum") >= ceil(col("n") * 0.5) &&
            col("cum") - col("c") < ceil(col("n") * 0.5))
          .select(col("o_orderstatus"), col(valCol).as(out), col("n"))
      }
      // 3-row result consumed twice (deviation join + final output) —
      // without the cache the whole first histogram+window subtree
      // executes twice (same lesson as the IVF centroid cache)
      val med = rankPick(o, "o_totalprice", "med").cache()
      val dev = o
        .join(broadcast(med.select(col("o_orderstatus"), col("med"))),
          Seq("o_orderstatus"))
        .select(col("o_orderstatus"),
          abs(col("o_totalprice") - col("med")).as("adev"))
      med.select(col("o_orderstatus"), col("n"), col("med").as("median_price"))
        .join(rankPick(dev, "adev", "mad")
          .select(col("o_orderstatus"), col("mad")), Seq("o_orderstatus"))
        .orderBy(col("o_orderstatus"))
    }),

    // Hot-key aggregation through the two-phase salted path
    // (engine/Skew.saltedSumCount): l_returnflag has 3 values over the
    // whole fact table — the direct groupBy would route ~1/3 of all
    // rows to each of 3 reducers no matter how many executors exist.
    // Salting splits each key into 32 sub-keys for the wide shuffle
    // and recombines the partials in a second (96-row) aggregation.
    // The exact-decimal partial sums are associative, so salted ==
    // direct bit-for-bit — which is exactly what the oracle (a plain
    // direct-aggregation SQL) certifies. AQE re-splits skewed JOINs
    // but not skewed aggregations; this is the engine's answer there.
    "q_skew_salted" -> ((s, d) => {
      graft.engine.Skew
        .saltedSumCount(Tables.t(s, d, "lineitem"), "l_returnflag",
          "l_extendedprice")
        .orderBy(col("l_returnflag"))
    }),

    // Hot-key JOIN under AQE skew-split (VERDICT r10 #3): 70% of
    // lineitem rows collapse onto ONE order key — the reference's
    // world, one ISIN dominating a snapshot — then join orders on it.
    // The orders side is merge-hinted because at fact scale both sides
    // are past any broadcast budget (a 100-TB orders table is not a
    // broadcast candidate); a sort-merge join with one hot key is
    // exactly the shape AQE's OptimizeSkewedJoin re-splits at runtime.
    // SkewSpec lowers the split thresholds to fixture scale and
    // asserts the hot partition actually splits (skew=true on the
    // join, skewed AQEShuffleRead) with values unchanged; the oracle
    // certifies the default-threshold plan. Aggregation-side skew is
    // q_skew_salted's territory — this is the join half of the pair.
    "q_join_skew" -> ((s, d) => {
      val li = Tables.t(s, d, "lineitem")
      val sk = when(pmod(col("l_orderkey"), lit(10)) < 7, lit(1))
        .otherwise(col("l_orderkey"))
        .cast(li.schema("l_orderkey").dataType)
      li.withColumn("sk", sk)
        .join(Tables.t(s, d, "orders").hint("merge"),
          col("sk") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          sum(Tables.dec2(col("l_extendedprice"))).cast("double")
            .as("revenue"))
        .orderBy(col("o_orderpriority"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q_join_bucketed" ->
      """SELECT c_custkey, c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1, 2 ORDER BY c_custkey""".stripMargin,

    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_discount, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_brand
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_join_multiway" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_join_outer_diff" ->
      """WITH cs AS (
        |  SELECT c_nationkey AS nk, COUNT(*) AS n_cust,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS cust_bal
        |  FROM customer GROUP BY c_nationkey),
        |ss AS (
        |  SELECT s_nationkey AS nk, COUNT(*) AS n_supp,
        |    CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS supp_bal
        |  FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(cs.nk, ss.nk) AS nk,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp,
        |  COALESCE(n_cust, 0) - COALESCE(n_supp, 0) AS n_diff,
        |  cust_bal, supp_bal
        |FROM cs FULL OUTER JOIN ss ON cs.nk = ss.nk
        |ORDER BY nk""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(DISTINCT o_orderpriority) AS n_prio, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS gflag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS gstat,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gflag, gstat, l_returnflag, l_linestatus""".stripMargin,

    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS gflag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS gstat,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gflag, gstat, l_returnflag, l_linestatus""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS gflag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS gstat,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gflag, gstat, l_returnflag, l_linestatus""".stripMargin,

    "q_sort_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_union_dedup" ->
      """WITH u AS (
        |  SELECT o_orderkey AS k, o_totalprice AS v, 1 AS src FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice * 0.5, 2 FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice * 0.25, 3 FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT k, v, src FROM (
        |  SELECT k, v, src, ROW_NUMBER() OVER (PARTITION BY k ORDER BY src DESC) AS rn
        |  FROM u) t
        |WHERE rn = 1 ORDER BY k""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderstatus,
        |  COALESCE(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0) AS "1-URGENT",
        |  COALESCE(COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END), 0) AS "2-HIGH",
        |  COALESCE(COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END), 0) AS "3-MEDIUM",
        |  COALESCE(COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END), 0) AS "4-NOT SPECIFIED",
        |  COALESCE(COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END), 0) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_agg_percentile" ->
      """WITH w AS (
        |  SELECT o_orderstatus, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
        |  FROM orders)
        |SELECT o_orderstatus,
        |  MIN(CASE WHEN rn = CEIL(cnt * 0.5) THEN o_totalprice END) AS p50,
        |  MIN(CASE WHEN rn = CEIL(cnt * 0.9) THEN o_totalprice END) AS p90,
        |  MIN(o_totalprice) AS p_min,
        |  MAX(o_totalprice) AS p_max
        |FROM w GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, metric, value FROM (
        |  SELECT p_partkey, CAST(p_size AS DOUBLE) AS size, p_retailprice AS price
        |  FROM part)
        |UNPIVOT (value FOR metric IN (size, price))
        |ORDER BY p_partkey, metric""".stripMargin,

    "q_agg_argmax" ->
      """WITH o AS (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) * 10000000000 + o_orderkey AS m
        |  FROM orders)
        |SELECT o_orderstatus,
        |  arg_max(o_orderkey, m) AS top_order,
        |  arg_min(o_orderkey, m) AS bottom_order,
        |  MAX(o_totalprice) AS top_price
        |FROM o GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_agg_topk" ->
      """WITH o AS (
        |  SELECT o_orderstatus, o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) * 10000000000 + o_orderkey AS m
        |  FROM orders)
        |SELECT o_orderstatus,
        |  array_to_string(list_transform((list(o_orderkey ORDER BY m DESC))[1:3],
        |    x -> CAST(x AS VARCHAR)), ',') AS top3
        |FROM o GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_agg_stats" ->
      """WITH s AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_q,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qq,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_p,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_pp,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_qp
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((sum_qq - sum_q * sum_q / n) / (n - 1), 6) AS var_q,
        |  round(sqrt(round((sum_qq - sum_q * sum_q / n) / (n - 1), 6)), 6) AS stddev_q,
        |  round((n * sum_qp - sum_q * sum_p) /
        |    (sqrt(n * sum_qq - sum_q * sum_q) * sqrt(n * sum_pp - sum_p * sum_p)), 10) AS corr_qp
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "q_null_semantics" ->
      """WITH j AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS n_big,
        |    CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mx
        |  FROM customer LEFT JOIN (
        |    SELECT * FROM orders WHERE o_totalprice > 150000) o
        |    ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_custkey, n_big, mx,
        |  COALESCE(mx, -1.0) AS mx_dflt,
        |  CAST(mx IS NULL AS INT) AS mx_is_null,
        |  CAST(mx IS NOT DISTINCT FROM NULL AS INT) AS mx_nullsafe_eq_null
        |FROM j ORDER BY mx DESC NULLS LAST, c_custkey""".stripMargin,

    "q_intersect" ->
      """SELECT c_custkey AS k FROM customer
        |INTERSECT SELECT o_custkey FROM orders ORDER BY k""".stripMargin,

    "q_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT SELECT o_custkey FROM orders ORDER BY k""".stripMargin,

    "q_median_mad" ->
      """WITH w AS (
        |  SELECT o_orderstatus, o_totalprice, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
        |  FROM orders),
        |med AS (
        |  SELECT o_orderstatus,
        |    MIN(CASE WHEN rn = CEIL(cnt * 0.5) THEN o_totalprice END) AS med
        |  FROM w GROUP BY o_orderstatus),
        |dev AS (
        |  SELECT o.o_orderstatus, med.med,
        |    abs(o.o_totalprice - med.med) AS adev, o.o_orderkey
        |  FROM orders o JOIN med ON o.o_orderstatus = med.o_orderstatus),
        |w2 AS (
        |  SELECT o_orderstatus, med, adev,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY adev, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
        |  FROM dev)
        |SELECT o_orderstatus, count(*) AS n, MIN(med) AS median_price,
        |  MIN(CASE WHEN rn = CEIL(cnt * 0.5) THEN adev END) AS mad
        |FROM w2 GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // the DIRECT aggregation: the salted two-phase plan must match it
    // bit-for-bit (exact decimal partials are associative)
    "q_skew_salted" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_l_extendedprice,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_join_skew" ->
      """SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON (CASE WHEN l_orderkey % 10 < 7 THEN 1
        |                     ELSE l_orderkey END) = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
