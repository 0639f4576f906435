package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-day absorb→purge→compact soak for the text-LSH and
  * embedding-LSH standing indexes (VERDICT r14 #7 — the gram family
  * has its day-0/day-1/compact cycle timed in CompactBench; this runs
  * the FULL lifecycle for the other two families and times every
  * step): build a throwaway index, absorb three disjoint crawl days
  * (id % 40 = 0 / 10 / 20 — all inside the batch space, disjoint from
  * the % 10 ≠ 0 corpus), snapshot a day-4 probe (% 40 = 30, never
  * absorbed), PURGE a retention slice (% 30 = 3 text / % 30 = 7
  * embedding — tombstone sidecars, round 15), snapshot the purged
  * probe, compact every bucketed table WITH TOMBSTONE FOLDING, and
  * re-probe: the fold must not move a verdict by a bit, the sidecars
  * must be gone, and the purged rows physically absent. One JSON line
  * per family with absorb walls, purge wall, file fan-in folded,
  * fold-compaction wall, and probe row counts before/after purge.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<fixture> runMain graft.SoakBench
  */
object SoakBench {
  private def round2(v: Double): Double = math.rint(v * 100) / 100

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val days = Seq(0, 10, 20)

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def files(t: String): Long = spark.table(t).inputFiles.length.toLong

    // ---- text-LSH family -------------------------------------------
    locally {
      val bk = graft.engine.Layout.bucketsFor(s"$sfDir/documents.parquet")
      val (t, buildW) = timed(operators.Retrieval.buildLshIndex(
        spark, sfDir, "_soak", _.filter(col("doc_id") % 10 =!= 0)))
      val (sigT, vecT, _, _) = t
      val absorbW = days.map { dy =>
        timed(operators.Retrieval.absorbLshBatch(spark, sfDir, t, bk,
          _.filter(col("doc_id") % 40 === dy)))._2
      }
      def probe() = operators.Retrieval.lshIndexProbe(spark, sfDir, t,
        col("doc_id") % 40 === 30).collect().map(_.toString).toSeq
      val before = probe()
      // retention purge: tombstone sidecars (sig + vec + manifest)
      val purgeIds = graft.engine.Tables.t(spark, sfDir, "documents")
        .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 30 === 3)
        .select(col("doc_id"))
      val (_, purgeW) = timed(
        operators.Retrieval.purgeLshIndex(spark, t, purgeIds))
      val purged = probe()
      val fb = (files(sigT), files(vecT))
      val (folds, compW) = timed(Seq(
        graft.engine.Layout.compactBucketed(spark, sigT, "bb", bk,
          foldTombstonesOn = Some("corpus_id")),
        graft.engine.Layout.compactBucketed(spark, vecT, "corpus_id", bk,
          foldTombstonesOn = Some("corpus_id"))))
      val after = probe()
      require(purged == after,
        s"text probe diverged across the fold: ${purged.size} vs ${after.size}")
      require(!spark.catalog.tableExists(sigT + "_tomb") &&
        spark.table(vecT).filter(col("corpus_id") % 30 === 3).count() == 0,
        "fold left tombstones or purged rows behind")
      println(s"""{"scenario":"soak_text_lsh","sf":"$sfDir","buckets":$bk,""" +
        s""""build_sec":${round2(buildW)},""" +
        s""""absorb_sec":[${absorbW.map(round2).mkString(",")}],""" +
        s""""purge_sec":${round2(purgeW)},""" +
        s""""sig_files":[${fb._1},${folds(0)._2}],""" +
        s""""vec_files":[${fb._2},${folds(1)._2}],""" +
        s""""fold_compact_sec":${round2(compW)},""" +
        s""""probe_rows":[${before.size},${purged.size}],""" +
        s""""post_fold_identical":true}""")
    }

    // ---- embedding-LSH family --------------------------------------
    locally {
      val bk = graft.engine.Layout.bucketsFor(s"$sfDir/embeddings.parquet")
      val (t, buildW) = timed(operators.Pipeline.buildEmbIndex(
        spark, sfDir, "_soak", col("vec_id") % 10 =!= 0))
      val (sigT, vecT, _) = t
      val absorbW = days.map { dy =>
        timed(operators.Pipeline.absorbEmbBatch(spark, sfDir, t, bk,
          col("vec_id") % 40 === dy))._2
      }
      def probe() = operators.Pipeline.embIndexProbeOn(spark, t,
        graft.engine.Tables.t(spark, sfDir, "embeddings")
          .filter(col("vec_id") % 40 === 30),
        s"$sfDir/embeddings.parquet").collect().map(_.toString).toSeq
      val before = probe()
      val purgeIds = graft.engine.Tables.t(spark, sfDir, "embeddings")
        .filter(col("vec_id") % 10 =!= 0 && col("vec_id") % 30 === 7)
        .select(col("vec_id"))
      val (_, purgeW) = timed(
        operators.Pipeline.purgeEmbIndex(spark, t, purgeIds))
      val purged = probe()
      val fb = (files(sigT), files(vecT))
      val (folds, compW) = timed(Seq(
        graft.engine.Layout.compactBucketed(spark, sigT, "tb", bk,
          foldTombstonesOn = Some("corpus_id")),
        graft.engine.Layout.compactBucketed(spark, vecT, "corpus_id", bk,
          foldTombstonesOn = Some("corpus_id"))))
      val after = probe()
      require(purged == after,
        s"emb probe diverged across the fold: ${purged.size} vs ${after.size}")
      require(!spark.catalog.tableExists(sigT + "_tomb") &&
        spark.table(vecT).filter(col("corpus_id") % 30 === 7).count() == 0,
        "fold left tombstones or purged rows behind")
      println(s"""{"scenario":"soak_emb_lsh","sf":"$sfDir","buckets":$bk,""" +
        s""""build_sec":${round2(buildW)},""" +
        s""""absorb_sec":[${absorbW.map(round2).mkString(",")}],""" +
        s""""purge_sec":${round2(purgeW)},""" +
        s""""sig_files":[${fb._1},${folds(0)._2}],""" +
        s""""vec_files":[${fb._2},${folds(1)._2}],""" +
        s""""fold_compact_sec":${round2(compW)},""" +
        s""""probe_rows":[${before.size},${purged.size}],""" +
        s""""post_fold_identical":true}""")
    }
    spark.stop()
  }
}
