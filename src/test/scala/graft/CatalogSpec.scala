package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.catalog.Catalog

/** The reference domain end-to-end: bronze catalog records (the exact
  * golden encodings from crocus output_examples/, embedded per
  * FIXTURES.md §A) → normalize → confront → keyed-JSON round-trip →
  * snapshot-partitioned store. */
class CatalogSpec extends SparkTestBase {
  import spark.implicits._

  private def isharesBronze = Seq(
    ("IE00B5BMR087", "iShares Core S&P 500 UCITS ETF\nCSPX", null: String,
      "USD", "0,07", "USD 632,42", "28 feb 2025",
      "https://e.com/fs", "https://e.com/kid", "https://e.com/p",
      "https://e.com/h?fileType=csv"))
    .toDF("isin", "name", "fund_type", "currency", "ter", "price", "date",
      "factsheet", "kid", "product_page", "holdings_file")

  private def vanguardBronze = Seq(
    ("IE00BK5BQT80", "FTSE All-World UCITS ETF (USD)\nACCUMULATING",
      "VWCE IM", "equity", "USD", "0,22%", "144,12 USD", "21/02/25",
      "https://v.com/fs", "https://v.com/kid", "https://v.com/p"),
    ("IE00BFMXXD54", "S&P 500 UCITS ETF (USD)\nACCUMULATING",
      "VUAA IM", "equity", "EUR", "0,07%", "5,66 €", "21/02/25",
      "https://v.com/fs2", "https://v.com/kid2", "https://v.com/p2"))
    .toDF("isin", "name", "ticker", "asset_class", "currency", "ter",
      "price", "date", "factsheet", "kid", "product_page")

  test("iShares normalization types the golden record") {
    val r = Catalog.normalizeIShares(isharesBronze).collect()(0)
    assert(r.getAs[String]("name") == "iShares Core S&P 500 UCITS ETF")
    // the ishares.py:151 TODO: null fund_type is classified from the
    // name with the Vanguard vocabulary (S&P 500 → equity)
    assert(r.getAs[String]("fund_type") == "equity")
    assert(r.getAs[String]("ticker_symbol") == null)
    assert(r.getAs[String]("exchange") == null)
    assert(r.getAs[Double]("ter") == 0.07 / 100)
    assert(r.getAs[Double]("price") == 632.42)
    assert(r.getAs[String]("price_ccy") == "USD")
    assert(r.getAs[java.sql.Date]("price_date").toString == "2025-02-28")
    assert(r.getAs[String]("provider") == "ishares")
  }

  test("iShares fund-type classification covers the Vanguard vocabulary") {
    val named = Seq(
      ("B1", "iShares Core Global Aggregate Bond UCITS ETF"),
      ("B2", "iShares $ Treasury Bd 1-3y UCITS ETF\nIBTS"),
      ("B3", "iShares Core £ Corporate Bond UCITS ETF"),
      ("M1", "BlackRock ESG Multi-Asset Growth Portfolio UCITS ETF"),
      ("E1", "iShares Core MSCI World UCITS ETF"))
      .toDF("isin", "name")
      .withColumn("fund_type", lit(null).cast("string"))
      .withColumn("currency", lit("USD"))
      .withColumn("ter", lit("0,07")).withColumn("price", lit("USD 10,00"))
      .withColumn("date", lit("28 feb 2025"))
      .withColumn("factsheet", lit("f")).withColumn("kid", lit("k"))
      .withColumn("product_page", lit("p"))
      .withColumn("holdings_file", lit("h"))
    val got = Catalog.normalizeIShares(named).collect()
      .map(r => r.getAs[String]("isin") -> r.getAs[String]("fund_type")).toMap
    assert(got == Map("B1" -> "bond", "B2" -> "bond", "B3" -> "bond",
      "M1" -> "multi_asset", "E1" -> "equity"), got.toString)
  }

  test("Vanguard normalization types the golden records") {
    val rows = Catalog.normalizeVanguard(vanguardBronze)
      .orderBy("isin").collect()
    val vwce = rows.find(_.getAs[String]("isin") == "IE00BK5BQT80").get
    assert(vwce.getAs[String]("name") ==
      "Vanguard FTSE All-World UCITS ETF (USD) ACCUMULATING")
    assert(vwce.getAs[Double]("ter") == 0.22 / 100)
    assert(vwce.getAs[Double]("price") == 144.12)
    assert(vwce.getAs[String]("price_ccy") == "USD")
    val vuaa = rows.find(_.getAs[String]("isin") == "IE00BFMXXD54").get
    assert(vuaa.getAs[Double]("price") == 5.66)
    assert(vuaa.getAs[String]("price_ccy") == "EUR")
    assert(vuaa.getAs[java.sql.Date]("price_date").toString == "2025-02-21")
    // the vanguard.py:76 TODO: "VWCE IM" splits into symbol + exchange
    assert(vwce.getAs[String]("ticker_symbol") == "VWCE")
    assert(vwce.getAs[String]("exchange") == "IM")
    assert(vuaa.getAs[String]("ticker_symbol") == "VUAA")
    assert(vuaa.getAs[String]("exchange") == "IM")
  }

  test("confront: disjoint keys → full-outer null sides") {
    val c = Catalog.confront(
      Catalog.normalizeIShares(isharesBronze),
      Catalog.normalizeVanguard(vanguardBronze)).collect()
    assert(c.length == 3)
    val a = c.find(_.getAs[String]("isin") == "IE00B5BMR087").get
    assert(a.getAs[Boolean]("in_a") && !a.getAs[Boolean]("in_b"))
    val b = c.find(_.getAs[String]("isin") == "IE00BK5BQT80").get
    assert(!b.getAs[Boolean]("in_a") && b.getAs[Boolean]("in_b"))
  }

  test("confront: shared key → field diffs") {
    val a = Catalog.normalizeIShares(isharesBronze)
      .withColumn("isin", lit("SHARED"))
    val b = Catalog.normalizeVanguard(vanguardBronze.limit(1))
      .withColumn("isin", lit("SHARED"))
    val r = Catalog.confront(a, b).collect()(0)
    assert(r.getAs[Boolean]("in_a") && r.getAs[Boolean]("in_b"))
    assert(math.abs(r.getAs[Double]("ter_diff") - (0.07 / 100 - 0.22 / 100)) < 1e-12)
    assert(r.getAs[Boolean]("same_ccy"))
    assert(r.getAs[Int]("date_lag_days") == 7)
  }

  test("keyed products.json round-trip (reference sink shape)") {
    val silver = Catalog.normalizeIShares(isharesBronze)
      .select("isin", "name", "ter", "price_ccy")
    val json = Catalog.productsJsonString(silver)
    assert(json.startsWith("""{"IE00B5BMR087":{"""))
    val tmp = java.nio.file.Files.createTempDirectory("cat").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/products.json"), json)
    val back = Catalog.readProductsJson(spark, s"$tmp/products.json")
    val r = back.collect()(0)
    assert(r.getAs[String]("isin") == "IE00B5BMR087")
    assert(r.getAs[Double]("ter") == 0.07 / 100)
  }

  test("locale emit round-trips through the parsers (money + Italian dates)") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val vals = spark.range(1, 500)
      .select((col("id") * 37 + col("id") % 97 / 100.0).as("amount"),
        date_add(lit(java.sql.Date.valueOf("1995-01-01")),
          (col("id") * 13 % 4000).cast("int")).as("d"))
      .withColumn("amount", round(col("amount"), 2))
    val emitted = vals
      .withColumn("raw_money",
        Catalog.formatLocaleMoney(col("amount"), lit("EUR")))
      .withColumn("raw_date", Catalog.formatDateIt(col("d")))
    val back = emitted
      .withColumn("parsed_money",
        GraftFunctions.parse_locale_money(col("raw_money")).getField("amount"))
      .withColumn("parsed_ccy",
        GraftFunctions.parse_locale_money(col("raw_money")).getField("ccy"))
      .withColumn("parsed_date", GraftFunctions.parse_date_it(col("raw_date")))
    val bad = back.filter(col("parsed_money") =!= col("amount") ||
      col("parsed_ccy") =!= "EUR" || col("parsed_date") =!= col("d"))
    assert(bad.count() == 0, bad.limit(3).collect().mkString(", "))
  }

  test("fuzzy match pairs the same index across providers despite different ISINs") {
    val a = Catalog.normalizeIShares(isharesBronze)   // iShares Core S&P 500
    val b = Catalog.normalizeVanguard(vanguardBronze) // Vanguard FTSE All-World + S&P 500
    val m = Catalog.fuzzyMatch(a, b, minJaccard = 0.5).collect()
    assert(m.length == 1, m.mkString(", "))
    assert(m(0).getAs[String]("a_isin") == "IE00B5BMR087")
    assert(m(0).getAs[String]("b_isin") == "IE00BFMXXD54") // the S&P 500 one
    assert(m(0).getAs[Double]("jaccard") >= 0.5)
  }

  test("snapshot time-series: day-over-day price change per ISIN") {
    // the reference's end goal: re-scrape daily, monitor changes (§1.1)
    val tmp = java.nio.file.Files.createTempDirectory("ts").toString
    val day1 = Catalog.normalizeIShares(isharesBronze)
    val day2 = Catalog.normalizeIShares(
      isharesBronze.withColumn("price", lit("USD 640,10"))
        .withColumn("date", lit("1 mar 2025")))
    Catalog.writeSnapshot(day1, tmp, "2025-02-28")
    Catalog.writeSnapshot(day2, tmp, "2025-03-01")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("isin")).orderBy(col("snapshot_date"))
    val changes = Catalog.readSnapshots(spark, tmp)
      .withColumn("prev_price", lag(col("price"), 1).over(w))
      .withColumn("chg", col("price") - col("prev_price"))
      .filter(col("prev_price").isNotNull)
      .collect()
    assert(changes.length == 1)
    assert(math.abs(changes(0).getAs[Double]("chg") - 7.68) < 1e-9)
  }

  test("daily re-scrape stream: snapshot tree ingested incrementally (§1.4)") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("snapstream").toString
    Catalog.writeSnapshot(Catalog.normalizeIShares(isharesBronze), tmp, "2025-02-28")
    Catalog.writeSnapshot(Catalog.normalizeVanguard(vanguardBronze), tmp, "2025-03-01")
    val schema = Catalog.readSnapshots(spark, tmp).schema
    val counts = spark.readStream
      .schema(schema)
      .option("basePath", tmp)
      .parquet(s"$tmp/*/*")
      .groupBy(col("snapshot_date").cast("string").as("snapshot_date"),
        col("provider"))
      .agg(count(lit(1)).as("n_products"))
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("t_snap")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("t_snap").collect()
      .map(r => (r.getAs[String]("snapshot_date"), r.getAs[String]("provider")) ->
        r.getAs[Long]("n_products")).toMap
    assert(got == Map(("2025-02-28", "ishares") -> 1L,
      ("2025-03-01", "vanguard") -> 2L), got.toString)
  }

  test("snapshot-partitioned store prunes by date+provider") {
    val tmp = java.nio.file.Files.createTempDirectory("snap").toString
    Catalog.writeSnapshot(Catalog.normalizeIShares(isharesBronze), tmp, "2025-02-28")
    Catalog.writeSnapshot(Catalog.normalizeVanguard(vanguardBronze), tmp, "2025-02-28")
    Catalog.writeSnapshot(Catalog.normalizeIShares(isharesBronze), tmp, "2025-03-01")
    val all = Catalog.readSnapshots(spark, tmp)
    assert(all.count() == 4)
    val pruned = all.filter(col("snapshot_date") === "2025-03-01" &&
      col("provider") === "ishares")
    assert(pruned.count() == 1)
    // partition pruning visible in the physical plan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.inputFiles.length == 1)
  }
}
