package graft

import org.apache.spark.sql.functions._

/** Semantic ground truths for the round-4 curation pack (value-level
  * parity is the DuckDB oracle gate; these assert the properties the
  * oracle can't see: permutation-ness, token conservation, redaction
  * completeness, plan shape). */
class CurationSpec extends SparkTestBase {

  test("q_global_shuffle is a permutation with contiguous per-shard positions") {
    val rows = q("q_global_shuffle").collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(0)).distinct.length.toLong == total)
    rows.groupBy(_.getLong(1)).foreach { case (shard, rs) =>
      val pos = rs.map(_.getInt(2)).sorted
      assert(pos.sameElements(1 to rs.length), s"shard $shard positions not 1..n")
    }
  }

  test("q_pack_sequences conserves tokens and keeps bins doc-contiguous") {
    val bins = q("q_pack_sequences").collect()
    val perSourceTokens = graft.engine.Tables.t(spark, sf, "documents")
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " "))).as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bins.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.map(_.getLong(3)).sum == perSourceTokens(src),
        s"$src: packed tokens != corpus tokens")
      // docs are packed in doc_id order: bin ranges must not overlap
      val ordered = rs.sortBy(_.getLong(1))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4),
          s"$src: bin ${a.getLong(1)} overlaps ${b.getLong(1)}")
        case _ =>
      }
    }
  }

  test("q_pii_redact removes every email/phone/IP it counted") {
    val rows = q("q_pii_redact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getString(1)
      assert(!red.contains("@"), s"email survived: $red")
      assert(!"\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b".r
        .findFirstIn(red).isDefined, s"ip survived: $red")
      assert(!"\\b\\d{3}-\\d{4}\\b".r.findFirstIn(red).isDefined,
        s"phone survived: $red")
      // the synthesized contact string plants exactly one of each
      assert(r.getInt(2) == 1 && r.getInt(3) == 1 && r.getInt(4) == 1,
        s"counts off: $r")
      assert(red.contains("[EMAIL]") && red.contains("[PHONE]") &&
        red.contains("[IP]"))
    }
  }

  test("q_decontaminate never flags benchmark docs and hits are positive") {
    val rows = q("q_decontaminate").collect()
    rows.foreach { r =>
      assert(r.getLong(0) % 97 != 0, s"benchmark doc flagged: ${r.getLong(0)}")
      assert(r.getLong(1) >= 1)
    }
  }

  test("q_decontaminate broadcasts the benchmark gram set (no corpus-gram shuffle join)") {
    val p = q("q_decontaminate").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_quality_gopher ratios are sane and verdict matches the rule") {
    val rows = q("q_quality_gopher").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dr, twf, tbf) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(dr > 0 && dr <= 1.0 && twf > 0 && twf <= 1.0 && tbf > 0 && tbf <= 1.0)
      val expect = if (dr >= 0.4 && twf <= 0.1 && tbf <= 0.08) 1 else 0
      // rounded display values vs unrounded rule can only disagree
      // within 5e-7 of a threshold — synthetic ratios aren't that close
      assert(r.getInt(5) == expect, s"verdict mismatch: $r")
    }
  }

  test("q_unicode_normalize composes decomposed sequences (codegen'd NFC)") {
    val rows = q("q_unicode_normalize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // two combining marks planted per row → exactly 2 chars shorter
      assert(r.getInt(3) == r.getInt(4) + 2, s"lengths: $r")
      // explicit \uXXXX escapes (source-encoding-proof): no combining
      // marks remain, precomposed forms present
      val norm = r.getString(2)
      assert(!norm.contains('\u0301') && !norm.contains('\u0308'),
        "combining marks survived NFC")
      assert(norm.contains("caf\u00e9") && norm.contains("\u00fcber"))
    }
    // expression evaluates inside whole-stage codegen (not fallback
    // eval) — inspect the AQE-final plan (codegen renders as a "*(n)"
    // stage marker on the operator line there), so run the query first
    val df = q("q_unicode_normalize")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("nfc_normalize") && l.contains("*(")), plan)
  }

  test("q_decontaminate_bloom is a superset of the exact hits with bounded inflation") {
    val exact = q("q_decontaminate").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = q("q_decontaminate_bloom").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (doc, nHits) =>
      assert(bloom.contains(doc), s"bloom missed exact-contaminated doc $doc")
      assert(bloom(doc) >= nHits, s"doc $doc: bloom candidates < exact hits")
    }
    // 200k bits for ~240 benchmark grams => fp ~ 0; candidate volume
    // should not blow up beyond 2x the exact volume on this data
    assert(bloom.values.sum <= math.max(2 * exact.values.sum, 50L),
      s"bloom candidate volume ${bloom.values.sum} vs exact ${exact.values.sum}")
  }

  test("q_graph_pagerank matches a driver-side power iteration") {
    val spRanks = q("q_graph_pagerank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pairs = operators.Pipeline.queries("q_dedup_minhash")(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs ++ pairs.map(p => (p._2, p._1))
    val nodes = edges.map(_._1).distinct.sorted
    if (nodes.isEmpty) assert(spRanks.isEmpty)
    else {
      // mirror of the engine's 1e15 integer fixed point — floor
      // divisions make the ground truth EXACT, not tolerance-based
      val n = nodes.length
      val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      var rank = nodes.map(_ -> 1000000000000000L / n).toMap
      (1 to 5).foreach { _ =>
        val in = edges.groupBy(_._2).view.mapValues(
          _.map(e => rank(e._1) / deg(e._1)).sum).toMap
        rank = nodes.map(v =>
          v -> (150000000000000L / n + 85L * in.getOrElse(v, 0L) / 100L)).toMap
      }
      assert(spRanks.keySet == rank.keySet)
      spRanks.foreach { case (doc, r) =>
        val want = rank(doc).toDouble / 1e15
        assert(r == want, s"doc $doc: $r vs $want")
      }
      // undirected graph, no dangling nodes: total rank stays ~1
      // (floor divisions shave < 1e-12 per node per round)
      assert(math.abs(spRanks.values.sum - 1.0) < 1e-6)
    }
  }

  test("q_inverted_index postings are capped, sorted, and df<=cf") {
    val rows = q("q_inverted_index").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), s"df>cf: $r")
      val ids = r.getString(3).split(",").map(_.toLong)
      assert(ids.length <= 5 && ids.sameElements(ids.sorted))
    }
  }

  test("q_domain_mix: weights normalize to 1 and are monotone in token mass") {
    val rows = q("q_domain_mix").collect()
    assert(rows.length > 1, "vacuous: single source")
    val wsum = rows.map(_.getDouble(3)).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    rows.foreach(r => assert(r.getDouble(3) > 0))
    // α = 0.3 keeps ordering: more tokens → weight >= (ties possible
    // after 6dp rounding)
    val byTokens = rows.sortBy(_.getLong(2))
    byTokens.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(3) + 1e-9,
        s"weight not monotone: $a vs $b")
      case _ =>
    }
    // and flattens the raw proportions: the largest source's weight is
    // strictly below its raw token share (that's the up-sampling point)
    val tot = rows.map(_.getLong(2)).sum.toDouble
    val top = byTokens.last
    assert(top.getDouble(3) < top.getLong(2) / tot,
      s"α-mix failed to down-weight the dominant source: $top")
  }

  test("q_contain_attrib: ranks contiguous, ordered by integer intersection, scores recompute") {
    val rows = q("q_contain_attrib").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (bench, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).sameElements(1 to rs.length),
        s"bench $bench ranks not 1..k")
      val inters = sorted.map(_.getLong(3))
      assert(inters.sameElements(inters.sorted.reverse),
        s"bench $bench not ordered by inter_n desc")
      assert(inters.forall(_ >= 2))
    }
    // recompute one containment driver-side from raw text
    val r = rows.head
    def grams3(id: Long): Set[String] = {
      val w = graft.engine.Tables.t(spark, sf, "documents")
        .filter(col("doc_id") === id).collect()(0)
        .getAs[String]("text").split(" ")
      w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val (gb, gt) = (grams3(r.getLong(0)), grams3(r.getLong(2)))
    assert(r.getLong(3) == gb.intersect(gt).size.toLong, "inter_n mismatch")
    assert(r.getLong(4) == gb.size.toLong, "n_bench mismatch")
  }

  test("q_mix_sample: argmax source keeps everything, others thin to ~thr/1e9") {
    val rows = q("q_mix_sample").collect()
    val thr = rows.map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(thr.values.max == 1000000000L,
      "downsample-only contract: most up-weighted source must keep all")
    val perSource = graft.engine.Tables.t(spark, sf, "documents")
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = rows.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    thr.foreach { case (src, t) =>
      val (n, k) = (perSource(src), kept.getOrElse(src, 0L))
      if (t == 1000000000L) assert(k == n, s"$src lost docs despite rate 1")
      else {
        val p = t.toDouble / 1e9
        val sd = math.sqrt(n * p * (1 - p))
        assert(math.abs(k - n * p) <= 5 * sd + 1,
          s"$src kept $k of $n, expected ~${n * p} ± ${5 * sd}")
      }
    }
    // the coin is the documented md5 derivation
    rows.take(20).foreach { r =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mix:${r.getLong(0)}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      assert(r.getLong(2) == java.lang.Long.parseLong(hex, 16) % 1000000000L)
      assert(r.getLong(2) < r.getLong(3))
    }
  }

  test("q_dedup_url: canon URLs are clean, groups partition the corpus, kept doc is real") {
    val rows = q("q_dedup_url").collect()
    assert(rows.nonEmpty)
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(3)).sum == total,
      "n_dups must sum to the corpus: every doc lands in exactly one canon group")
    assert(rows.exists(_.getLong(3) > 1), "fixture must actually contain URL dups")
    val keptIds = rows.map(_.getLong(1))
    assert(keptIds.distinct.length == keptIds.length, "one kept doc per group")
    rows.foreach { r =>
      val u = r.getString(0)
      assert(u == u.toLowerCase && !u.contains("#") && !u.contains("utm_"),
        s"canonicalization left noise: $u")
      assert(!u.endsWith("/"), s"trailing slash survived: $u")
      assert(!(u.startsWith("https://") && u.contains(":443")),
        s"default https port survived: $u")
      assert(u.startsWith("http"), u)
    }
    // kept_n_chars is the kept doc's true n_chars (decode round-trip)
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(chars(r.getLong(1)) == r.getLong(2),
      s"ordinal decode broke for doc ${r.getLong(1)}"))
  }

  test("q_dedup_url: fixture stays inside the keep-best packing bounds") {
    // the (1e6 - n_chars)*1e10 + doc_id ordinal decodes correctly only
    // while n_chars < 1_000_000 and doc_id < 1e10 (comment at the
    // packing site); both engines would agree even on a violation, so
    // the oracle can't catch one — this pin can (ADVICE r11)
    val m = spark.read.parquet(s"$sf/documents.parquet")
      .agg(max(col("n_chars")), max(col("doc_id")), min(col("n_chars")),
        min(col("doc_id"))).head()
    assert(m.getLong(0) < 1000000L,
      s"max n_chars ${m.getLong(0)} exceeds the 1e6 packing bound")
    assert(m.getLong(1) < 10000000000L,
      s"max doc_id ${m.getLong(1)} exceeds the 1e10 packing bound")
    assert(m.getLong(2) >= 0L && m.getLong(3) >= 0L,
      "packing assumes non-negative n_chars and doc_id")
  }

  test("q_dedup_span: first-occurrence-wins matches a driver-side replay") {
    val rows = q("q_dedup_span").collect().map(r => r.getLong(0) -> r).toMap
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen = scala.collection.mutable.HashSet[String]()
    var dropped = 0L
    corpus.foreach { case (id, text) =>
      val chunks = text.split(" ").grouped(8).map(_.mkString(" ")).toArray
      val kept = chunks.filter { c =>
        if (seen.add(c)) true else { dropped += 1; false }
      }
      val r = rows(id)
      assert(r.getLong(1) == chunks.length, s"doc $id n_chunks")
      assert(r.getString(3) == kept.mkString(" "), s"doc $id reassembly diverged")
    }
    assert(rows.values.map(_.getLong(2)).sum == dropped,
      "global dropped-span count must match the replay")
    assert(dropped > 0, "fixture must actually contain duplicate spans")
  }

  test("q_quality_classifier: token counts match the corpus, keep == sign(score)") {
    val rows = q("q_quality_classifier").collect()
    val nWords = graft.engine.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == nWords.size, "one score row per doc")
    rows.foreach { r =>
      assert(r.getLong(1) == nWords(r.getLong(0)), s"doc ${r.getLong(0)} token count")
      assert((r.getInt(3) == 1) == (r.getLong(2) > 0), "keep must be sign(score_sum)")
    }
    assert(rows.exists(_.getInt(3) == 1) && rows.exists(_.getInt(3) == 0),
      "hashed weights must separate the corpus into both classes")
    // the bucket weight is the documented md5 derivation (spot check)
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val doc0 = graft.engine.Tables.t(spark, sf, "documents")
      .filter(col("doc_id") === 0).select(col("text")).collect()(0).getString(0)
    val expected = doc0.split(" ").map(t => h60(s"qw:${h60(s"qc:$t") % 4096}") % 2001 - 1000).sum
    assert(rows.find(_.getLong(0) == 0L).get.getLong(2) == expected,
      "driver-side md5 twin disagrees with the plan's score for doc 0")
  }

  test("q_boilerplate_lines: threshold semantics match a driver-side replay") {
    val rows = q("q_boilerplate_lines").collect().map(r => r.getLong(0) -> r).toMap
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def linesOf(src: String, text: String): Array[String] =
      Array(s"nav home about contact login search $src menu") ++
        text.split(" ").grouped(8).map(_.mkString(" ")) ++
        Array(s"copyright footer $src all rights reserved terms privacy")
    // document frequency per (source, line) over distinct docs
    val df = scala.collection.mutable.HashMap[(String, String), Set[Long]]()
    corpus.foreach { case (id, src, text) =>
      linesOf(src, text).foreach { l =>
        df((src, l)) = df.getOrElse((src, l), Set.empty) + id
      }
    }
    var droppedTotal = 0L
    corpus.foreach { case (id, src, text) =>
      val ls = linesOf(src, text)
      val kept = ls.filter(l => df((src, l)).size < 3)
      droppedTotal += ls.length - kept.length
      val r = rows(id)
      assert(r.getLong(1) == ls.length, s"doc $id n_lines")
      assert(r.getLong(2) == ls.length - kept.length, s"doc $id n_dropped")
      assert(r.getString(3) == kept.mkString(" "), s"doc $id reassembly diverged")
      // header and footer must ALWAYS be boilerplate (every source has >= 3 docs)
      assert(!r.getString(3).contains("nav home about") &&
        !r.getString(3).contains("copyright footer"), s"doc $id kept boilerplate")
    }
    assert(droppedTotal >= 2L * corpus.length,
      "at least header+footer must drop from every doc")
    // organic cross-doc chunks must exist below the threshold and SURVIVE
    // (the boundary is exercised, not vacuous): df == 2 lines are kept
    val organicDup = df.collect { case ((s2, l), ids)
      if ids.size == 2 && !l.startsWith("nav home") && !l.startsWith("copyright") => (s2, l) }
    assert(rows.values.exists(r => organicDup.exists { case (_, l) =>
      r.getString(3).contains(l) }) || organicDup.isEmpty,
      "df=2 organic lines must survive the df>=3 threshold")
  }

  test("q_pack_nextfit: driver next-fit replay; budget + contiguity invariants") {
    val budget = 256L
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split(" ").length.toLong))
    val expected = corpus.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      var bin = 0L; var used = 0L; var first = true
      ds.sortBy(_._2).toSeq.map { case (_, id, n) =>
        if (!first && used + n > budget) { bin += 1; used = 0 }
        first = false; used += n
        (src, bin, id, n)
      }
    }
    val expBins = expected.groupBy(t => (t._1, t._2)).map { case (k, ts) =>
      k -> (ts.size.toLong, ts.map(_._4).sum,
        ts.map(_._3).min, ts.map(_._3).max)
    }
    val rows = q("q_pack_nextfit").collect()
    assert(rows.length == expBins.size, "bin count")
    rows.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      val (nd, toks, fd, ld) = expBins(k)
      assert(r.getLong(2) == nd && r.getLong(3) == toks, s"bin $k stats")
      assert(r.getLong(5) == fd && r.getLong(6) == ld, s"bin $k doc range")
      assert(r.getLong(4) == math.max(0L, budget - toks), s"bin $k padding")
      // budget invariant: only a single oversized doc may exceed it
      assert(toks <= budget || nd == 1, s"bin $k over budget with $nd docs")
    }
    // doc-boundary preservation: every doc appears exactly once
    assert(expected.map(_._3).distinct.length == corpus.length)
    // contiguity: bins partition each source's doc_id order into runs
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(6) < b.getLong(5),
          s"$src bins ${a.getLong(1)}/${b.getLong(1)} overlap")
        case _ =>
      }
    }
  }

  test("q_importance_dsir: driver replay of the hashed-LM log-ratio scoring") {
    def h60(x: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val feats = corpus.flatMap { case (id, src, text) =>
      val w = text.split(" ")
      if (w.length < 2) Array.empty[(Long, String, Long)]
      else w.sliding(2).map(p => (id, src, h60("ds:" + p.mkString(" ")) % 4096)).toArray
    }
    val t = feats.map(_._2).min
    val ct = feats.filter(_._2 == t).groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val cr = feats.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val nt = ct.values.sum; val nr = cr.values.sum
    val lr: Map[Long, BigDecimal] = cr.map { case (b, c) =>
      val x = ((ct.getOrElse(b, 0L) + 1).toDouble / (nt + 4096)) /
        ((c + 1).toDouble / (nr + 4096))
      b -> BigDecimal(math.log(x)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val rows = q("q_importance_dsir").collect().map(r => r.getLong(0) -> r).toMap
    corpus.foreach { case (id, _, text) =>
      val fs = feats.filter(_._1 == id)
      val r = rows(id)
      assert(r.getLong(1) == fs.length, s"doc $id n_feats")
      val score = fs.map(f => lr(f._3)).sum
      assert(math.abs(r.getDouble(2) -
        score.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"doc $id dsir_score")
      val keep = if (fs.nonEmpty && score * 100 > BigDecimal(-92L * fs.length)) 1 else 0
      assert(r.getInt(3) == keep, s"doc $id keep")
    }
    val keeps = rows.values.map(_.getInt(3)).toSeq
    assert(keeps.contains(0) && keeps.contains(1),
      "the θ = -0.92 mean-log-ratio cut must split the fixture")
  }

  test("q_repetition_filter: dup-char fractions match a driver replay; threshold splits") {
    val rows = q("q_repetition_filter").collect().map(r => r.getLong(0) -> r).toMap
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def fracs(text: String, n: Int): (Long, Long) = {
      val w = text.split(" ")
      if (w.length < n) (0L, 0L)
      else {
        val counts = w.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
        val dup = counts.collect { case (g, c) if c > 1 => c.toLong * g.length }.sum
        val tot = counts.map { case (g, c) => c.toLong * g.length }.sum
        (dup, tot)
      }
    }
    corpus.foreach { case (id, text) =>
      val (d2, t2) = fracs(text, 2); val (d3, t3) = fracs(text, 3)
      val r = rows(id)
      val e2 = if (t2 > 0) math.rint(d2.toDouble / t2 * 1e6) / 1e6 else 0.0
      val e3 = if (t3 > 0) math.rint(d3.toDouble / t3 * 1e6) / 1e6 else 0.0
      assert(math.abs(r.getDouble(1) - e2) < 1e-9, s"doc $id dup2_frac")
      assert(math.abs(r.getDouble(2) - e3) < 1e-9, s"doc $id dup3_frac")
      val keep = if (d2 * 25 <= t2 * 2 && d3 * 100 <= t3) 1 else 0
      assert(r.getInt(3) == keep, s"doc $id keep flag")
    }
    // the thresholds must split the fixture — both classes populated
    val keeps = rows.values.map(_.getInt(3)).toSeq
    assert(keeps.contains(0) && keeps.contains(1),
      "repetition thresholds must reject some docs and keep others")
  }

  test("q_dedup_winnow: full winnowing replay (selection, cap, pairs)") {
    def h60(x: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // driver-side winnowing: k=4-word grams, window w=4, packed-min select
    val fps = corpus.flatMap { case (id, text) =>
      val w = text.split(" ")
      if (w.length < 4) Array.empty[(Long, Long)]
      else {
        val khp = (0 to w.length - 4).map { p =>
          (h60(w.slice(p, p + 4).mkString(" ")) % 1099511627776L) * 1048576L + p
        }
        val sel = (0 to khp.length - 4).map(i => khp.slice(i, i + 4).min).distinct
        // winnowing guarantee: every window of 4 gram positions is covered
        (0 to khp.length - 4).foreach { i =>
          assert(sel.exists(s => khp.slice(i, i + 4).contains(s)),
            s"doc $id window $i has no selected fingerprint")
        }
        sel.map(s => (id, s / 1048576L)).distinct.toArray
      }
    }
    val byH = fps.groupBy(_._2).filter(_._2.length <= 8)
    val pairs = byH.values.flatMap { docs =>
      val ids = docs.map(_._1).distinct.sorted
      for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2).toMap
    val got = q("q_dedup_winnow").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == pairs, s"pair sets diverge: got ${got.size}, replay ${pairs.size}")
    assert(got.nonEmpty, "fixture must produce winnowing candidate pairs")
  }
}
