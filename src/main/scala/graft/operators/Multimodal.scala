package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{QueryPack, Tables}

/** Binary media container sniffing — pure-JVM magic-byte + header
  * parsing, no external codecs. Formats: PNG (IHDR), JPEG (SOFn scan),
  * GIF (logical screen descriptor), WAV (RIFF fmt chunk). Anything
  * else is "unknown" with zeroed dimensions.
  *
  * This is real decoding of the container header (the part that needs
  * no codec library); pixel/sample payload decoding stays a stub — see
  * Multimodal.fakeFeatures.
  */
object MediaCodec {

  final case class Meta(fmt: String, width: Int, height: Int,
      sampleRate: Int, channels: Int)

  private val Unknown = Meta("unknown", 0, 0, 0, 0)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def u32be(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def u32le(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  private def startsWith(b: Array[Byte], sig: Int*): Boolean =
    b.length >= sig.length && sig.indices.forall(i => u8(b, i) == sig(i))

  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    if (b.length >= i + n) new String(b, i, n, "US-ASCII") else ""

  /** PNG: 8-byte signature, then the IHDR chunk (must be first):
    * length(4) "IHDR" width(4 BE) height(4 BE). */
  private def png(b: Array[Byte]): Meta =
    if (b.length >= 24 && ascii(b, 12, 4) == "IHDR")
      Meta("image/png", u32be(b, 16).toInt, u32be(b, 20).toInt, 0, 0)
    else Unknown

  /** JPEG: walk FF-prefixed segments from SOI to the first SOF0/1/2
    * frame header: FF Cn len(2) precision(1) height(2 BE) width(2 BE). */
  private def jpeg(b: Array[Byte]): Meta = {
    var i = 2
    while (i + 9 < b.length && u8(b, i) == 0xff) {
      val marker = u8(b, i + 1)
      if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
        return Meta("image/jpeg", u16be(b, i + 7), u16be(b, i + 5), 0, 0)
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
      else i += 2 + u16be(b, i + 2)
    }
    Unknown
  }

  /** GIF87a/89a: width(2 LE) height(2 LE) at offset 6. */
  private def gif(b: Array[Byte]): Meta =
    if (b.length >= 10) Meta("image/gif", u16le(b, 6), u16le(b, 8), 0, 0)
    else Unknown

  /** WAV: RIFF....WAVE then chunk walk to "fmt ": channels(2 LE at +2)
    * sampleRate(4 LE at +4) within the chunk body. Chunk sizes are
    * attacker-controlled bytes: kept as Long and bounds-checked so a
    * corrupt size can never step backwards (infinite loop) or overflow
    * to a negative index (crash) — sniff() must return "unknown" for
    * junk, not hang the task. */
  private def wav(b: Array[Byte]): Meta = {
    var i = 12L
    while (i + 8 <= b.length) {
      val ii = i.toInt
      val id = ascii(b, ii, 4)
      val sz = u32le(b, ii + 4)
      if (id == "fmt " && i + 16 <= b.length)
        return Meta("audio/wav", 0, 0, u32le(b, ii + 12).toInt, u16le(b, ii + 10))
      i += 8 + sz + (sz & 1) // word-aligned; sz unsigned via Long
    }
    Unknown
  }

  /** Sniff container format + header metadata from leading bytes. */
  def sniff(b: Array[Byte]): Meta =
    if (b == null || b.length < 10) Unknown
    else if (startsWith(b, 0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)) png(b)
    else if (startsWith(b, 0xff, 0xd8, 0xff)) jpeg(b)
    else if (ascii(b, 0, 6) == "GIF87a" || ascii(b, 0, 6) == "GIF89a") gif(b)
    else if (ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WAVE") wav(b)
    else Unknown

  // ---- header writers (test-fixture synthesis; the parsers above are
  // the product surface, these make payloads the parsers must survive)

  def pngHeader(w: Int, h: Int): Array[Byte] = {
    val o = java.nio.ByteBuffer.allocate(33)
    o.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    o.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
    o.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    o.putInt(0) // CRC not validated by the sniffer
    o.array()
  }

  def jpegHeader(w: Int, h: Int): Array[Byte] = {
    val o = java.nio.ByteBuffer.allocate(15)
    o.put(Array(0xff, 0xd8).map(_.toByte))                      // SOI
    o.put(Array(0xff, 0xc0).map(_.toByte)).putShort(11.toShort) // SOF0, len
    o.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    o.put(1.toByte)                                             // 1 component
    o.put(1.toByte).put(0x11.toByte).put(0.toByte)              // comp spec
    o.array()
  }

  def gifHeader(w: Int, h: Int): Array[Byte] = {
    val o = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    o.put("GIF89a".getBytes("US-ASCII")).putShort(w.toShort).putShort(h.toShort)
    o.array()
  }

  def wavHeader(sampleRate: Int, channels: Int): Array[Byte] = {
    val o = java.nio.ByteBuffer.allocate(28).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    o.put("RIFF".getBytes("US-ASCII")).putInt(20)
    o.put("WAVE".getBytes("US-ASCII"))
    o.put("fmt ".getBytes("US-ASCII")).putInt(8)
    o.putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
    o.array()
  }
}

/** REAL pixel codec — javax.imageio (ships with JDK 17, works
  * headless): PNG encode/decode round-trips losslessly, so pixel
  * features and perceptual hashes computed here are genuine, not
  * stubbed. Used by q_image_features / q_image_dedup_phash; the
  * MediaCodec header sniffing above stays the no-dependency path for
  * formats ImageIO can't decode (WAV).
  */
/** REAL audio codec — WAV PCM16 is decodable with no library at all:
  * the RIFF walk finds the data chunk, samples are little-endian
  * int16. Features are genuine DSP statistics (RMS energy,
  * zero-crossing rate, duration), ground-truthed in MultimodalSpec
  * against synthesized sines with known analytic values. */
object AudioCodec {

  final case class Wav(ok: Boolean, sampleRate: Int, nSamples: Int,
      rms: Double, zcr: Double)

  private val NotWav = Wav(ok = false, 0, 0, 0, 0)

  /** Mono PCM16 WAV of a sine at `freqHz` with amplitude `amp`
    * (0..1) plus deterministic low-level seed noise. */
  def synthWav(sampleRate: Int, nSamples: Int, freqHz: Double,
      amp: Double, seed: Long): Array[Byte] = {
    val dataBytes = nSamples * 2
    val o = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    o.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
    o.put("WAVE".getBytes("US-ASCII"))
    o.put("fmt ".getBytes("US-ASCII")).putInt(16)
    o.putShort(1).putShort(1).putInt(sampleRate)
    o.putInt(sampleRate * 2).putShort(2).putShort(16)
    o.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var h = seed
    var i = 0
    while (i < nSamples) {
      h = h * 6364136223846793005L + 1442695040888963407L
      val noise = ((h >> 40) & 0xff) - 128 // ±128 of 32767: -48 dB floor
      val s = amp * math.sin(2 * math.Pi * freqHz * i / sampleRate) * 32767.0
      o.putShort(math.max(-32768, math.min(32767, s.toInt + noise.toInt)).toShort)
      i += 1
    }
    o.array()
  }

  /** Decode mono PCM16 samples from a WAV payload and compute RMS
    * (0..1 of full scale) and zero-crossing rate (crossings per
    * sample). Non-WAV / non-PCM16 payloads → ok=false. */
  def decodeWav(payload: Array[Byte]): Wav = {
    val meta = MediaCodec.sniff(payload)
    if (meta.fmt != "audio/wav" || meta.channels != 1) return NotWav
    // RIFF chunk walk to "data" (same bounds discipline as the sniffer)
    var i = 12L
    var dataOff = -1L; var dataLen = 0L
    while (dataOff < 0 && i + 8 <= payload.length) {
      val ii = i.toInt
      val id = new String(payload, ii, 4, "US-ASCII")
      val sz = (payload(ii + 4) & 0xffL) | ((payload(ii + 5) & 0xffL) << 8) |
        ((payload(ii + 6) & 0xffL) << 16) | ((payload(ii + 7) & 0xffL) << 24)
      if (id == "data") { dataOff = i + 8; dataLen = sz }
      i += 8 + sz + (sz & 1)
    }
    if (dataOff < 0 || dataOff + dataLen > payload.length) return NotWav
    val n = (dataLen / 2).toInt
    if (n == 0) return NotWav
    var sumSq = 0.0
    var crossings = 0L
    var prevSign = 0
    var k = 0
    while (k < n) {
      val off = (dataOff + 2L * k).toInt
      val s = ((payload(off) & 0xff) | (payload(off + 1) << 8)).toShort.toInt
      sumSq += (s / 32768.0) * (s / 32768.0)
      val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
      if (prevSign != 0 && sign != 0 && sign != prevSign) crossings += 1
      if (sign != 0) prevSign = sign
      k += 1
    }
    Wav(ok = true, meta.sampleRate, n,
      math.sqrt(sumSq / n), crossings.toDouble / n)
  }
}

object ImageCodec {
  locally {
    System.setProperty("java.awt.headless", "true")
    // default is a temp-FILE cache per read/write — pure overhead for
    // tiny in-memory byte arrays (one create+delete syscall pair per
    // image, once per row at corpus scale)
    javax.imageio.ImageIO.setUseCache(false)
  }

  private val W = 16

  /** FNV-1a over bytes (shared with Multimodal.fakeFeatures). */
  private[operators] def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Deterministic 16×16 RGB image: pixels from an LCG chain seeded by
    * the seed bytes; `variant` paints one 2×2 block a variant-derived
    * color. Same seed + different variants ⇒ images differing in ≤8 of
    * 256 pixels (planted near-dups); different seeds ⇒ unrelated
    * images. Output is REAL PNG bytes (ImageIO round-trips exactly). */
  def synthPng(seed: Array[Byte], variant: Int): Array[Byte] = {
    var h = fnv1a(seed)
    val img = new java.awt.image.BufferedImage(W, W,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < W) {
      var x = 0
      while (x < W) {
        h = h * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((h >>> 40) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bx = (variant % 7) * 2; val by = ((variant / 7) % 7) * 2
    val c = (variant * 2654435761L & 0xffffff).toInt
    var dy = 0
    while (dy < 2) {
      var dx = 0
      while (dx < 2) { img.setRGB(bx + dx, by + dy, c); dx += 1 }
      dy += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // write returns false when no PNG writer took the image — fail the
    // task loudly rather than hand decodePx an empty array
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "no ImageIO PNG writer available")
    bos.toByteArray
  }

  final case class Px(ok: Boolean, w: Int, h: Int,
      meanR: Double, meanG: Double, meanB: Double, phash: Long)

  private val NotImage = Px(ok = false, 0, 0, 0, 0, 0, 0L)

  /** Decode any ImageIO-supported payload and compute channel means +
    * a 56-bit difference perceptual hash: average-pool the integer
    * grayscale to 8×8 cells, bit (r,c) = cell(r,c+1) >= cell(r,c).
    * All-integer arithmetic (bit-deterministic), and STRICTLY LOCAL —
    * a small pixel perturbation moves one cell and flips at most its
    * two adjacent comparisons, unlike a mean-threshold aHash where any
    * change shifts the global mean and can flip every marginal bit
    * (measured: planted 2×2-block edits cost ≤4 dHash bits but up to
    * 7+ aHash bits). */
  def decodePx(payload: Array[Byte]): Px = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      // NonFatal only: an OOM/VM error must fail the task (and retry),
      // not silently become a NotImage row
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return NotImage
    val (w, h) = (img.getWidth, img.getHeight)
    if (w == 0 || h == 0) return NotImage
    var (sr, sg, sb) = (0L, 0L, 0L)
    val cells = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b
        val cell = math.min(7, y * 8 / h) * 8 + math.min(7, x * 8 / w)
        cells(cell) += (299L * r + 587L * g + 114L * b) / 1000L
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val avg = Array.tabulate(64)(i => if (counts(i) == 0) 0L else cells(i) / counts(i))
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 7) {
        if (avg(r * 8 + c + 1) >= avg(r * 8 + c)) hash |= (1L << (r * 7 + c))
        c += 1
      }
      r += 1
    }
    Px(ok = true, w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, hash)
  }
}

/** Multimodal column plumbing (north star): opaque binary payloads +
  * typed metadata, decoded/feature-extracted per partition.
  *
  * Header decode is REAL (MediaCodec, pure JVM) and pixel decode is
  * REAL for ImageIO-supported formats (ImageCodec: PNG pixels, channel
  * means, perceptual dHash — q_image_features / q_image_dedup_phash).
  * Only the generic 8-float `fakeFeatures` vector of
  * q_multimodal_decode remains a labeled stand-in for a learned
  * embedding model; swapping it for a JNI/ffmpeg/onnx call changes
  * nothing in the plan shape.
  *
  * Scale notes: decode is embarrassingly parallel per partition; the
  * binary column never shuffles (feature extraction happens before any
  * wide op), and only header metadata + fixed-width features flow
  * downstream.
  */
object Multimodal extends QueryPack {

  case class Payload(doc_id: Long, payload: Array[Byte])
  case class Features(doc_id: Long, n_bytes: Int, fmt: String,
      width: Int, height: Int, sample_rate: Int, channels: Int,
      features: Array[Float])

  /** STUB feature extractor: deterministic pseudo-features from a
    * 64-bit FNV-1a content hash. Replace with a real codec at
    * deployment; signature and batch shape stay identical. */
  private[operators] def fakeFeatures(payload: Array[Byte]): Array[Float] = {
    val hf = ImageCodec.fnv1a(payload)
    Array.tabulate(8) { k =>
      val v = hf * (2654435761L + 2 * k) + k
      ((v >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
  }

  private[operators] def decode(p: Payload): Features = {
    val m = MediaCodec.sniff(p.payload)
    Features(p.doc_id, p.payload.length, m.fmt, m.width, m.height,
      m.sampleRate, m.channels, fakeFeatures(p.payload))
  }

  def decodeFeatures(ds: Dataset[Payload]): Dataset[Features] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decode))
  }

  /** Deterministic media fixture per doc: real container headers
    * (format by doc_id % 4, dimensions derived from doc_id) prepended
    * to the document bytes. This is test-harness payload synthesis —
    * the decode path above is what a user's real image/audio columns
    * would hit. */
  private[operators] def mediaPayload(docId: Long, text: Array[Byte]): Array[Byte] = {
    val w = (docId % 512 + 1).toInt
    val h = (docId % 384 + 1).toInt
    val header = (docId % 4) match {
      case 0 => MediaCodec.pngHeader(w, h)
      case 1 => MediaCodec.jpegHeader(w, h)
      case 2 => MediaCodec.gifHeader(w, h)
      case _ => MediaCodec.wavHeader(8000 + (docId % 40000).toInt, 1 + (docId % 2).toInt)
    }
    header ++ text
  }

  override def queries: Map[String, Q] = Map(
    // Binary payload → per-partition header decode + feature stats.
    // Rows-only check (binary synthesis is engine-specific); header
    // fields are ground-truthed against the doc_id formula and real
    // image literals in MultimodalSpec.
    "q_multimodal_decode" -> ((s, d) => {
      import s.implicits._
      val payloads = Tables.t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[Payload]
        .mapPartitions(_.map(p => Payload(p.doc_id, mediaPayload(p.doc_id, p.payload))))
      decodeFeatures(payloads).toDF()
        .select(col("doc_id"), col("n_bytes"), col("fmt"),
          col("width"), col("height"), col("sample_rate"), col("channels"),
          round(element_at(col("features"), 1).cast("double"), 6).as("f0"))
        .orderBy(col("doc_id"))
    }),

    // REAL pixel features through the real codec: every doc gets a
    // deterministic PNG (docs sharing doc_id/3 share a base image with
    // small per-doc perturbations — planted near-dup structure), the
    // pipeline decodes actual pixels via ImageIO and emits channel
    // means + the 56-bit difference hash. Rows-only (binary synthesis
    // is engine-specific); codec round-trip, determinism and
    // planted-pair recall are ground-truthed in MultimodalSpec.
    "q_image_features" -> ((s, d) =>
      imageFeatures(s, d).orderBy(col("doc_id"))),

    // REAL audio features: per-doc synthesized PCM16 WAV (sine at a
    // doc-derived frequency + seeded noise floor), decoded sample-by-
    // sample with no codec library, emitting RMS energy, zero-crossing
    // rate, and the ZCR-estimated frequency. Rows-only; analytic
    // ground truth (rms ≈ amp/√2, est_freq ≈ true freq) in
    // MultimodalSpec.
    "q_audio_features" -> ((s, d) => {
      import s.implicits._
      Tables.t(s, d, "documents")
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions(_.map { id =>
          val sr = 8000
          val freq = 200.0 + (id % 20) * 100.0 // 200..2100 Hz < Nyquist
          val w = AudioCodec.decodeWav(
            AudioCodec.synthWav(sr, 1600, freq, 0.5, id))
          (id, w.sampleRate, w.nSamples, w.rms, w.zcr, w.zcr * sr / 2.0)
        })
        .toDF("doc_id", "sample_rate", "n_samples", "rms", "zcr", "est_freq_hz")
        .select(col("doc_id"), col("sample_rate"), col("n_samples"),
          round(col("rms"), 6).as("rms"), round(col("zcr"), 6).as("zcr"),
          round(col("est_freq_hz"), 2).as("est_freq_hz"))
        .orderBy(col("doc_id"))
    }),

    // Image near-dup by perceptual hash: band the 56-bit dHash into
    // 7×8-bit keys, candidates join on band equality (bucketed — the
    // same LSH shape as the text dedup family, never all-pairs), then
    // exact hamming confirms IN the join condition (hot-bucket pairs
    // die during enumeration — the q_dedup_simhash_lsh lesson). Seven
    // bands make the hamming ≤ 6 threshold pigeonhole-EXACT: any pair
    // within threshold has ≥1 undisturbed band. Failed decodes (px_w
    // = 0, phash = 0) are excluded before banding — they would
    // otherwise all collide pairwise at hamming 0.
    "q_image_dedup_phash" -> ((s, d) => {
      val feats = imageFeatures(s, d)
        .filter(col("px_w") > 0)
        .select(col("doc_id"), col("phash")).cache()
      val banded = feats.select(col("doc_id"), col("phash"),
        explode(expr(
          "transform(sequence(0, 6), b -> struct(b AS band, shiftright(phash, b*8) & 255 AS v))"))
          .as("bv"))
        .select(col("doc_id"), col("phash"),
          col("bv.band").as("band"), col("bv.v").as("v"))
      val a = banded.select(col("doc_id").as("da"), col("phash").as("a_hash"),
        col("band"), col("v"))
      val b = banded.select(col("doc_id").as("db"), col("phash").as("b_hash"),
        col("band"), col("v"))
      a.join(b, a("band") === b("band") && a("v") === b("v") &&
          col("da") < col("db") && expr("bit_count(a_hash ^ b_hash)") <= 6)
        .select(col("da"), col("db"),
          expr("bit_count(a_hash ^ b_hash)").as("hamming"))
        .distinct()
        .orderBy(col("da"), col("db"))
    })
  )

  /** Shared UNSORTED per-doc image features (the dedup join must not
    * inherit q_image_features' presentation orderBy — a corpus-wide
    * sort the banded equi-join would pay for and never use). */
  private def imageFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.t(s, d, "documents")
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val seed = java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.ByteBuffer.allocate(8).putLong(id / 3).array())
        val px = ImageCodec.decodePx(
          ImageCodec.synthPng(seed, (id % 3).toInt * 9 + 1))
        (id, px.w, px.h, px.meanR, px.meanG, px.meanB, px.phash)
      })
      .toDF("doc_id", "px_w", "px_h", "mean_r", "mean_g", "mean_b", "phash")
      .select(col("doc_id"), col("px_w"), col("px_h"),
        round(col("mean_r"), 4).as("mean_r"),
        round(col("mean_g"), 4).as("mean_g"),
        round(col("mean_b"), 4).as("mean_b"), col("phash"))
  }

  override def oracle: Map[String, String] = Map()
}
