package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{QueryPack, Tables}

/** Multimodal column plumbing (north star): opaque binary payloads +
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The decode step is a STUB — image/audio codecs are not available in
  * this container — but everything Spark-side is real: binary column
  * handling, case-class encoders, partition-parallel mapPartitions
  * batch shape, and a deterministic fake "decoder" (seeded by a
  * content hash) so results are reproducible and testable. Swapping
  * `fakeDecode` for a JNI/ffmpeg/opencv call changes nothing in the
  * plan shape.
  *
  * Scale notes: decode is embarrassingly parallel per partition; the
  * binary column never shuffles (feature extraction happens before any
  * wide op), and feature vectors (fixed 8 floats here) are the only
  * thing that flows downstream.
  */
object Multimodal extends QueryPack {

  case class Payload(doc_id: Long, payload: Array[Byte])
  case class Features(doc_id: Long, n_bytes: Int, fmt: String,
      width: Int, height: Int, features: Array[Float])

  /** STUB decoder: deterministic pseudo-features from a 64-bit FNV-1a
    * content hash. Replace with a real codec at deployment; signature
    * and batch shape stay identical. */
  private[operators] def fakeDecode(p: Payload): Features = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < p.payload.length) {
      h ^= (p.payload(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    def f(k: Int): Float = {
      val v = h * (2654435761L + 2 * k) + k
      ((v >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
    Features(p.doc_id, p.payload.length, "fake/v1",
      64 + (math.abs(h) % 512).toInt, 64 + (math.abs(h >> 9) % 512).toInt,
      Array.tabulate(8)(f))
  }

  def decodeFeatures(ds: Dataset[Payload]): Dataset[Features] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(fakeDecode))
  }

  override def queries: Map[String, Q] = Map(
    // Binary payload → per-partition decode → feature stats. Rows-only
    // check (decoder is engine-specific); determinism asserted in tests.
    "q_multimodal_decode" -> ((s, d) => {
      import s.implicits._
      val payloads = Tables.t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[Payload]
      decodeFeatures(payloads).toDF()
        .select(col("doc_id"), col("n_bytes"), col("fmt"),
          col("width"), col("height"),
          round(element_at(col("features"), 1).cast("double"), 6).as("f0"))
        .orderBy(col("doc_id"))
    })
  )

  override def oracle: Map[String, String] = Map()
}
