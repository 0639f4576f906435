package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The reference's product domain re-expressed Spark-first: an
  * ISIN-keyed, snapshot-partitioned ETF catalog (SURVEY.md §1).
  *
  * Bronze (raw, all-string — exactly what the scrapers emit, crocus
  * ishares.py:79-88 / vanguard.py:86-97) → silver (typed, normalized —
  * the layer the reference never built but needs for its stated goal
  * "confront them with eachover", README.md:4) → confront (full-outer
  * per-field diff).
  *
  * Scale notes: catalogs are small-dim data; the heavy artifacts are
  * the per-ISIN holdings files and the daily snapshot time-series —
  * both land as date+provider-partitioned parquet (partition-pruned
  * scans), mirroring the reference's /base/{date}/{provider}/ tree
  * (base_scraper.py:72-83).
  */
object Catalog {

  /** Ticker exchange-suffix split — the reference's open TODO at
    * vanguard.py:76 ("bloomberg exchange mapping"): a scraped ticker
    * like "VWCE IM" is symbol + Bloomberg exchange code; a bare ticker
    * has no exchange. Null-safe: null ticker → (null, null). */
  def tickerSymbol(t: Column): Column =
    when(t.isNull, lit(null).cast("string"))
      .otherwise(split(trim(t), "\\s+").getItem(0))

  def tickerExchange(t: Column): Column =
    when(t.isNull || size(split(trim(t), "\\s+")) < 2,
      lit(null).cast("string"))
      .otherwise(split(trim(t), "\\s+").getItem(1))

  /** Name-derived fund-type classification — the reference's open TODO
    * at ishares.py:151 (`"fund_type": None  # TODO: find a way to
    * distinguish between equity bond or multi`), using the Vanguard
    * vocabulary its own equity/bond/multi_asset tables establish
    * (vanguard.py:102-104). Keyword tiers: multi-asset brands first
    * (so "Multi-Asset ... Bond exposure" classifies multi), then
    * fixed-income vocabulary, else equity — the catalog's dominant
    * class and the right default for index-equity names that carry no
    * marker word. */
  def classifyFundType(name: Column): Column = {
    val n = lower(name)
    when(n.contains("multi-asset") || n.contains("multi asset") ||
        n.contains("lifestrategy"), lit("multi_asset"))
      .when(n.contains("bond") || n.contains("aggregate") ||
        n.contains("treasury") || n.contains("gilt") ||
        n.contains("fixed income") || n.contains("high yield") ||
        n.contains("corporate"), lit("bond"))
      .otherwise(lit("equity"))
  }

  /** iShares bronze → silver. Encodings (crocus output_examples/
    * ishares.json): name multi-line (first line wins, ishares.py:150),
    * ter '0,07' (comma decimal, percent, no % sign), price 'USD 632,42'
    * (ccy prefix), date '28 feb 2025' (Italian month). fund_type is
    * None in the reference's own output (its ishares.py:151 TODO) —
    * classified here from the name; a future non-null scrape wins. */
  def normalizeIShares(raw: DataFrame): DataFrame = {
    GraftFunctions.register(raw.sparkSession)
    val money = GraftFunctions.parse_locale_money(col("price"))
    val firstLine = split(col("name"), "\n").getItem(0)
    raw.select(
      col("isin"),
      firstLine.as("name"),
      coalesce(col("fund_type"), classifyFundType(firstLine)).as("fund_type"),
      lit(null).cast("string").as("ticker"),
      lit(null).cast("string").as("ticker_symbol"),
      lit(null).cast("string").as("exchange"),
      col("currency"),
      GraftFunctions.parse_locale_pct(col("ter")).as("ter"),
      money.getField("amount").as("price"),
      coalesce(money.getField("ccy"), col("currency")).as("price_ccy"),
      GraftFunctions.parse_date_it(col("date")).as("price_date"),
      col("factsheet"), col("kid"), col("product_page"),
      col("holdings_file"),
      lit("ishares").as("provider"))
  }

  /** Vanguard bronze → silver. Encodings (crocus output_examples/
    * vanguard.json): name 'Vanguard ' prefix + newline→space
    * (vanguard.py:60), ter '0,22%', price '144,12 USD' / '5,66 €'
    * (ccy suffix, code or symbol), date '21/02/25'. */
  def normalizeVanguard(raw: DataFrame): DataFrame = {
    GraftFunctions.register(raw.sparkSession)
    val money = GraftFunctions.parse_locale_money(col("price"))
    raw.select(
      col("isin"),
      concat(lit("Vanguard "),
        regexp_replace(col("name"), "\n", " ")).as("name"),
      col("asset_class").as("fund_type"),
      col("ticker"),
      tickerSymbol(col("ticker")).as("ticker_symbol"),
      tickerExchange(col("ticker")).as("exchange"),
      col("currency"),
      GraftFunctions.parse_locale_pct(col("ter")).as("ter"),
      money.getField("amount").as("price"),
      coalesce(money.getField("ccy"), col("currency")).as("price_ccy"),
      GraftFunctions.parse_date_it(col("date")).as("price_date"),
      col("factsheet"), col("kid"), col("product_page"),
      lit(null).cast("string").as("holdings_file"),
      lit("vanguard").as("provider"))
  }

  /** Cross-provider "confront" (crocus README.md:4): full-outer join on
    * ISIN with per-field diff columns. Both catalogs are dimension-
    * sized; Catalyst broadcasts the smaller side automatically. */
  def confront(a: DataFrame, b: DataFrame): DataFrame = {
    val an = a.select(col("isin"), col("name").as("a_name"),
      col("ter").as("a_ter"), col("price").as("a_price"),
      col("price_ccy").as("a_ccy"), col("price_date").as("a_date"))
    val bn = b.select(col("isin"), col("name").as("b_name"),
      col("ter").as("b_ter"), col("price").as("b_price"),
      col("price_ccy").as("b_ccy"), col("price_date").as("b_date"))
    an.join(bn, Seq("isin"), "full_outer")
      .select(col("isin"),
        col("a_name").isNotNull.as("in_a"),
        col("b_name").isNotNull.as("in_b"),
        col("a_name"), col("b_name"),
        col("a_ter"), col("b_ter"),
        (col("a_ter") - col("b_ter")).as("ter_diff"),
        col("a_price"), col("b_price"),
        col("a_ccy"), col("b_ccy"),
        (col("a_ccy") === col("b_ccy")).as("same_ccy"),
        datediff(col("a_date"), col("b_date")).as("date_lag_days"))
      .orderBy(col("isin"))
  }

  /** Emit side of the locale layer (inverse of parse_locale_money /
    * parse_date_it): render typed values back into the providers' raw
    * encodings. Pure built-in composition — format_number gives the
    * US grouping, translate swaps the separators to the comma-decimal
    * convention ('1.234,56'). Round-trips asserted in CatalogSpec. */
  def formatLocaleMoney(amount: Column, ccy: Column): Column =
    concat(translate(format_number(amount, 2), ",.", ".,"), lit(" "), ccy)

  private val itMonths = Seq("gen", "feb", "mar", "apr", "mag", "giu",
    "lug", "ago", "set", "ott", "nov", "dic")

  /** '28 feb 2025' — explicit Italian month map, never JVM locale data. */
  def formatDateIt(d: Column): Column = {
    val monthName = itMonths.zipWithIndex.foldLeft(lit(""): Column) {
      case (acc, (nm, i)) => when(month(d) === (i + 1), lit(nm)).otherwise(acc)
    }
    concat(dayofmonth(d).cast("string"), lit(" "), monthName, lit(" "),
      year(d).cast("string"))
  }

  /** Fuzzy cross-provider matching: candidate product pairs whose
    * normalized name token sets overlap (Jaccard ≥ minJaccard) even
    * when ISINs differ — "same underlying index, different provider",
    * the comparison the reference can't do with exact keys alone.
    * Provider prefixes and generic fund words are stopworded so the
    * index-name tokens (e.g. "s&p", "500") drive the match. Token join
    * + per-pair aggregation — no all-pairs product. */
  def fuzzyMatch(a: DataFrame, b: DataFrame,
      minJaccard: Double = 0.5): DataFrame = {
    val stop = Seq("ishares", "vanguard", "ucits", "etf", "fund", "core",
      "(usd)", "(eur)", "accumulating", "distributing", "acc", "dist")
    def toks(df: DataFrame, side: String): DataFrame =
      df.select(col("isin").as(s"${side}_isin"),
          explode(array_distinct(split(lower(col("name")), " "))).as("token"))
        .filter(col("token") =!= "" && !col("token").isin(stop: _*))
    val ta = toks(a, "a"); val tb = toks(b, "b")
    val na = ta.groupBy(col("a_isin")).agg(count(lit(1)).as("na"))
    val nb = tb.groupBy(col("b_isin")).agg(count(lit(1)).as("nb"))
    val inter = ta.join(tb, "token")
      .groupBy(col("a_isin"), col("b_isin")).agg(count(lit(1)).as("ni"))
    inter.join(na, "a_isin").join(nb, "b_isin")
      .withColumn("jaccard",
        col("ni").cast("double") / (col("na") + col("nb") - col("ni")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a_isin"), col("b_isin"), col("jaccard"))
      .orderBy(desc("jaccard"), col("a_isin"), col("b_isin"))
  }

  /** Keyed-object products.json (crocus base_scraper.py:172-178) →
    * one row per ISIN. The file is a single JSON object whose keys are
    * ISINs; inference gives one struct column per key. */
  def readProductsJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    val entries = raw.schema.fields.map { f =>
      struct(lit(f.name).as("isin"), col(s"`${f.name}`").as("rec"))
    }
    raw.select(explode(array(entries: _*)).as("e"))
      .select(col("e.isin").as("isin"), col("e.rec.*"))
  }

  /** Keyed-object JSON sink matching the reference's golden shape
    * ({isin: {...record...}}, base_scraper.py:165-170). Catalogs are
    * driver-small by definition; the aggregate collapses to one row. */
  def productsJsonString(df: DataFrame): String = {
    val rec = struct(df.columns.filterNot(_ == "isin").map(col): _*)
    df.agg(to_json(map_from_entries(
      collect_list(struct(col("isin"), rec)))).as("j"))
      .collect()(0).getString(0)
  }

  /** Snapshot-partitioned sink: /base/{snapshot_date}/{provider}/ as
    * parquet partitions (crocus base_scraper.py:72-83). Partition
    * columns give pruned time-series scans at read. */
  def writeSnapshot(df: DataFrame, basePath: String, date: String): Unit =
    df.withColumn("snapshot_date", lit(date))
      .write.mode("append")
      .partitionBy("snapshot_date", "provider")
      .parquet(basePath)

  def readSnapshots(spark: SparkSession, basePath: String): DataFrame =
    spark.read.parquet(basePath)
}
