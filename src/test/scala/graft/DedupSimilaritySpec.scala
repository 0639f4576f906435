package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.engine.Tables
import graft.operators.Multimodal

/** Ground-truth checks for the non-SQL-expressible operators (sketches,
  * LSH, decode stub) that the DuckDB oracle can't hash-match. */
class DedupSimilaritySpec extends SparkTestBase {

  test("dot_d matches an independent driver-side dot product") {
    GraftFunctions.register(spark)
    val rows = Tables.t(spark, sf, "embeddings").limit(5)
      .select(col("vec_id"), col("embedding"),
        GraftFunctions.dot_d(col("embedding"), col("embedding")).as("d"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val expect = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      assert(r.getDouble(2) == expect, s"vec ${r.getLong(0)}")
    }
  }

  test("ANN results are a subset of brute-force ranking with exact cosines") {
    val ann = q("q_similarity_ann").collect()
    assert(ann.nonEmpty)
    val brute = q("q_similarity_topk")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // full brute-force map (not just top-10) for cosine cross-check
    GraftFunctions.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"),
        sqrt(GraftFunctions.dot_d(col("embedding"), col("embedding"))).as("q_nrm"))
    val all = e.crossJoin(broadcast(qv)).filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        (GraftFunctions.dot_d(col("embedding"), col("q_emb")) /
          (sqrt(GraftFunctions.dot_d(col("embedding"), col("embedding"))) * col("q_nrm")))
          .as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach { r =>
      assert(all(r.getLong(0)) == r.getDouble(1),
        s"ANN cosine mismatch for vec ${r.getLong(0)}")
    }
    // LSH candidates can't beat the true max
    val annBest = ann.map(_.getDouble(1)).max
    assert(annBest <= brute.values.max + 1e-15)
  }

  test("minhash estimates stay in [0,1] with ordered pairs") {
    q("q_dedup_minhash").collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val est = r.getDouble(2)
      assert(est >= 0.5 && est <= 1.0)
    }
  }

  test("simhash near-pairs are ordered with hamming <= 4") {
    q("q_dedup_simhash").collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) <= 4 && r.getInt(2) >= 0)
    }
  }

  test("connectedComponents matches driver-side union-find on minhash pairs") {
    import graft.operators.Pipeline
    val pairs = q("q_dedup_minhash").select(col("da"), col("db")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Pipeline.connectedComponents(
        q("q_dedup_minhash").select(col("da"), col("db")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ground truth: classic union-find over the collected pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(x => x -> find(x)).toMap
    assert(clusters.keySet == truth.keySet)
    clusters.foreach { case (node, cid) =>
      assert(cid == truth(node), s"node $node: spark=$cid truth=${truth(node)}")
    }
    if (pairs.nonEmpty) assert(clusters.values.exists(c => clusters.count(_._2 == c) > 1))
  }

  test("multimodal decode is deterministic and partition-invariant") {
    import spark.implicits._
    val payloads = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[Multimodal.Payload]
    val once = Multimodal.decodeFeatures(payloads.repartition(1))
      .collect().sortBy(_.doc_id)
    val again = Multimodal.decodeFeatures(payloads.repartition(7))
      .collect().sortBy(_.doc_id)
    assert(once.length == again.length && once.length > 0)
    once.zip(again).foreach { case (a, b) =>
      assert(a.doc_id == b.doc_id && a.width == b.width &&
        a.features.sameElements(b.features))
    }
  }
}
