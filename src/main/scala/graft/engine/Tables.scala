package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.functions._

/** Table loaders + shared numeric-determinism helpers.
  *
  * Tables are one parquet per name under the scale-factor dir
  * (TESTDATA.md). The reference keeps a date+provider-partitioned
  * snapshot tree (crocus base_scraper.py:72-83); our engine reads
  * columnar parquet so filters/projections push to the scan.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Session-memo reaper (r18, ADVICE r17 low): the engine's
    * session-keyed memo maps (table relations here, the semantic/LSH
    * pair memos in Retrieval, the media fixture in Multimodal) evicted
    * stopped sessions only on the NEXT lookup — a process that stops a
    * session and never touches a memo path again retained the dead
    * session's DataFrames (and localCheckpoint RDD block references)
    * indefinitely. Each memo map registers one idempotent sweep hook
    * (`removeIf(stopped)`) at class init; each memo INSERT calls
    * `watch(session)`, which attaches one listener per SparkContext;
    * application end then runs every sweep. Hooks are sweeps, not
    * per-entry closures, so duplicate registration is impossible and
    * a sweep triggered by ANY context's end also clears other
    * already-stopped sessions' leftovers. */
  object MemoReaper {
    private val hooks =
      new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()
    private val watched = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[
        org.apache.spark.SparkContext, java.lang.Boolean]())
    /** Register a sweep that drops stopped sessions' entries. Called
      * once per memo map. */
    def hook(sweep: () => Unit): Unit = hooks.add(sweep)
    /** Ensure `s`'s context triggers the sweeps when it ends. Called
      * on every memo insert (idempotent per context). */
    def watch(s: SparkSession): Unit = {
      val sc = s.sparkContext
      if (!sc.isStopped && watched.add(sc))
        sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
              : Unit = {
            hooks.forEach(f => f())
            watched.remove(sc)
          }
        })
    }
  }

  /** Collision-resistant digest for per-fixture table/dir name suffixes.
    * String.hashCode is 32 bits — two fixture dirs colliding in one JVM
    * would silently overwrite/rm each other's landed data while the
    * memo still points at the first (ADVICE r12; Multimodal hit the
    * same class in r6). Callers digest the ABSOLUTE path so two
    * spellings of one dir share a build instead of racing. */
  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // Memoized per (session, dir, name): spark.read.parquet runs a
  // 1-task file-listing/footer job per call, which both violates the
  // lazy-build contract (LazyBuildSpec — building a query must run
  // ZERO jobs) and re-pays schema inference on every plan build. The
  // map holds analyzed base relations only (no data). Entries for
  // STOPPED sessions are purged on the next lookup, so suites that
  // create many sessions per JVM don't pin dead sessions and their
  // relations forever (ADVICE r6). Caveat: a memoized relation caches
  // its file listing — a table dir REWRITTEN in-process serves stale
  // files until the session is stopped (testdata dirs are immutable,
  // so no in-repo caller hits this; a rewriter must use a new session).
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
  private val rawSchemas =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), org.apache.spark.sql.types.StructType]()
  MemoReaper.hook(() => loaded.keySet.removeIf(_._1.sparkContext.isStopped))
  MemoReaper.hook(() => rawSchemas.keySet.removeIf(_._1.sparkContext.isStopped))

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    loaded.keySet.removeIf(k => k._1.sparkContext.isStopped)
    MemoReaper.watch(spark)
    loaded.computeIfAbsent((spark, dir, name), _ => {
      // events.ts has shipped in two parquet generations: TIMESTAMP(NANOS)
      // (Spark's reader rejects it; the legacy flag surfaces it as raw
      // nanos LongType, which we truncate to micros — exactly what DuckDB
      // does on the same file) and plain timestamp[us] NTZ (passed
      // through). Adapt on the OBSERVED type, never on an assumed file
      // format — the testdata contract can move between sessions
      // (SchemaContractSpec guards the types this engine depends on).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      rawSchemas.putIfAbsent((spark, dir, name), raw.schema)
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      else raw
    })
  }

  /** Footer schema of the parquet file as stored, BEFORE t()'s
    * normalization — memoized alongside t. Lets callers (the streaming
    * reader, the drift guard spec) adapt their conversion to the file
    * generation actually on disk instead of hard-coding one. */
  def rawSchema(spark: SparkSession, dir: String, name: String): org.apache.spark.sql.types.StructType = {
    rawSchemas.keySet.removeIf(k => k._1.sparkContext.isStopped)
    MemoReaper.watch(spark)
    rawSchemas.computeIfAbsent((spark, dir, name), _ => {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet").schema
    })
  }

  /** Spread a small-file scan across the cluster before CPU-heavy
    * per-row fan-out (tokenize / explode / shingle / codec work).
    * Testdata ships ONE parquet row group per table, so a scan stage
    * gets one task no matter the split config and everything before
    * the first exchange serializes on a single core. The partition
    * count is EXPLICIT because AQE sizes shuffles by bytes and will
    * coalesce a kilobytes-of-text shuffle back to one task even
    * though each row fans out into real CPU work (measured on the
    * codec queries: 8.9 s -> 1.4 s). At 100 TB inputs arrive
    * many-file and pre-split, but the guard keeps pathological
    * layouts (one giant unsplittable file) from serializing a stage.
    *
    * r18 (guide §2.2, VERDICT r17 #1/#4): the count is capped AT THE
    * DATA, not at the core count — jstack-sampled 32-core runs showed
    * each task paying ~100-200 ms of task-binary DESERIALIZATION
    * (JavaSerializer resolveClass + LambdaDeserializer; plan-heavy
    * closures), so a kilobyte-scale input split 32 ways spends ~7×
    * more total CPU on per-task fixed cost than on the fan-out work
    * itself (q_dedup_text_lsh: 29 task-seconds at 32 partitions vs
    * 4.3 at 8 for identical output — and the .cache()d fragments
    * inherit the width through narrow chains, multiplying it into
    * every consumer stage). Partitions = clamp(optimizer-estimated
    * bytes / bytesPerTask, 1, defaultParallelism): stats come from the
    * optimized subtree (file-size-based under scans — job-free, so
    * builds stay lazy), unreliable huge estimates saturate at the old
    * full-width behavior, and at 100 TB bytes/floor >> cores so the
    * cap never binds. bytesPerTask is prop-tunable for A/B; 64 KiB
    * keeps the fan-out CPU per task well above the deser floor on the
    * measured corpora (interleaved A/B in OPTIMIZATION_r18.md). */
  private[graft] val spreadBytesPerTaskProp = "graft.spread.bytesPerTask"
  def spread(df: DataFrame, key: String): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val floor = BigInt(
      java.lang.Long.getLong(spreadBytesPerTaskProp, 64L * 1024).longValue)
    val bytes =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case _: Throwable => BigInt(Long.MaxValue) }
    val n = ((bytes + floor - 1) / floor)
      .min(BigInt(sc.defaultParallelism)).max(BigInt(1)).toInt
    df.repartition(n, col(key))
  }

  /** Full-width spread for rows whose BYTES are a useless proxy for
    * their CPU cost (e.g. the media fixture synthesis: a doc_id-only
    * frame where every row encodes images/audio). Callers must justify
    * per-row cost >> the ~100 ms per-task fixed overhead the byte cap
    * exists to amortize. */
  def spreadFull(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

  /** Exact decimal views of double columns: sums over these are
    * order-independent (exact), so parallel aggregation is deterministic
    * and bit-matches DuckDB once cast back to double.
    *
    * r17 (guide §4): precision dropped 18 → 8 and the cast replaced by
    * the codegen'd FastDecimal — value-identical to the old
    * cast-to-decimal(18,2) for every |value| < 10^(8-scale) (proof at
    * ExprHelpers.fastDec). Two wins: the per-row
    * Double.toString/BigDecimal allocation goes away, and precision 8
    * lets Spark's DecimalAggregates rule turn sum(dec2(x)) into a
    * pure-long unscaled sum (18-digit capacity ≈ 10^16 dollars —
    * comfortable at 100 TB; a corpus summing past that needs the old
    * wide form back). Measured: q_agg_group 1.51 → 0.52 s at sf0.1,
    * same hash vs the DuckDB oracle.
    *
    * r18 (ADVICE r17 medium): a PER-ROW value past the 10^(8-scale)
    * bound now THROWS instead of the cast's silent null — under the
    * exact-sum contract a nulled row silently vanishes from sums, which
    * is data corruption, not overflow handling (FastDecimalSpec pins
    * both semantics). Per-caller bound audit (all SF-independent
    * per-ROW properties; dec2 capacity 10^6, dec4 capacity 10^4):
    *   l_quantity ≤ 50, l_extendedprice < 2·10^5, l_discount/l_tax ≤
    *   0.1 (TPC-H generator constants, re-scaled nowhere); o_totalprice
    *   < 6·10^5; events.value ∈ [0, 10^3) (SfGen bounded draw);
    *   session/window sums aggregate AFTER the per-row conversion, so
    *   only the SUM capacity (~10^16) grows with data, never the
    *   per-row operand.
    * SUM headroom (VERDICT r17 #2): sum(dec2) accumulates in a Java
    * long via DecimalAggregates — ~9.2·10^18 unscaled ≈ 9·10^16 at
    * scale 2. Every dsum2/dsum4 caller is GROUPED (flag/status/day/
    * fund keys) except q_agg_stats' global sums, which at 100 TB ≈
    * 7·10^11 lineitem rows × <2·10^7 unscaled stay < 1.4·10^19 /
    * group-count — within a factor of the wrap only for a single-group
    * corpus an order past 100 TB; such a corpus must use dec2Wide. */
  def dec2Wide(c: Column): Column = c.cast("decimal(18,2)")
  def dec2(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.fastDec(c, 8, 2)
  def dec4(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.fastDec(c, 8, 4)

  /** Exact decimal(18,2) sum of a double column, emitted as double. */
  def dsum2(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact decimal(18,4) sum of a double column, emitted as double. */
  def dsum4(c: Column): Column = sum(dec4(c)).cast("double")
}
