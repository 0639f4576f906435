package graft

import graft.operators.{MediaCodec, Multimodal}

/** Header-decode ground truth: real image literals + the synthesized
  * fixture formula, against the pure-JVM MediaCodec sniffer. */
class MultimodalSpec extends SparkTestBase {

  // A real 1×1 PNG (the canonical 67-byte file, base64) — an actual
  // image produced by an encoder, not a hand-built header.
  private val realPng = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")

  test("sniff parses a real PNG literal") {
    val m = MediaCodec.sniff(realPng)
    assert(m.fmt == "image/png" && m.width == 1 && m.height == 1, m)
  }

  test("sniff parses synthesized PNG/JPEG/GIF/WAV headers round-trip") {
    assert(MediaCodec.sniff(MediaCodec.pngHeader(640, 480)) ==
      MediaCodec.Meta("image/png", 640, 480, 0, 0))
    assert(MediaCodec.sniff(MediaCodec.jpegHeader(123, 77) ++ Array[Byte](1, 2, 3)) ==
      MediaCodec.Meta("image/jpeg", 123, 77, 0, 0))
    assert(MediaCodec.sniff(MediaCodec.gifHeader(320, 200)) ==
      MediaCodec.Meta("image/gif", 320, 200, 0, 0))
    assert(MediaCodec.sniff(MediaCodec.wavHeader(44100, 2)) ==
      MediaCodec.Meta("audio/wav", 0, 0, 44100, 2))
  }

  test("jpeg sniffer walks past intermediate segments to SOFn") {
    // SOI + APP0 segment (16 bytes) + DQT-like segment, then SOF2
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16) ++ Array.fill[Byte](14)(0)
    val dqt = Array[Byte](0xff.toByte, 0xdb.toByte, 0, 4, 9, 9)
    val sof2 = MediaCodec.jpegHeader(300, 150).drop(2) // strip SOI
      .updated(1, 0xc2.toByte)
    val bytes = Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ dqt ++ sof2
    val m = MediaCodec.sniff(bytes)
    assert(m.fmt == "image/jpeg" && m.width == 300 && m.height == 150, m)
  }

  test("corrupt RIFF chunk sizes terminate as unknown (no loop, no crash)") {
    def riff(chunkId: String, size: Long): Array[Byte] = {
      val o = java.nio.ByteBuffer.allocate(20).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      o.put("RIFF".getBytes("US-ASCII")).putInt(12)
      o.put("WAVE".getBytes("US-ASCII"))
      o.put(chunkId.getBytes("US-ASCII")).putInt(size.toInt)
      o.array()
    }
    // 0xFFFFFFF8: as a signed int the old walker stepped 8+(-8)=0 — hang
    assert(MediaCodec.sniff(riff("JUNK", 0xFFFFFFF8L)).fmt == "unknown")
    // 0x80000000: negative step — index crash
    assert(MediaCodec.sniff(riff("JUNK", 0x80000000L)).fmt == "unknown")
    assert(MediaCodec.sniff(riff("JUNK", 0L) ++ Array.fill[Byte](4)(0)).fmt == "unknown")
  }

  test("sniff rejects junk and truncated input") {
    assert(MediaCodec.sniff(null).fmt == "unknown")
    assert(MediaCodec.sniff("hello world!!!".getBytes).fmt == "unknown")
    assert(MediaCodec.sniff(realPng.take(10)).fmt == "unknown")
    // PNG signature but a non-IHDR first chunk
    val bad = realPng.clone(); bad(13) = 'X'.toByte
    assert(MediaCodec.sniff(bad).fmt == "unknown")
  }

  test("sniff never hangs or throws on arbitrary bytes (fuzz)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // plain random bytes + adversarial variants: valid magic prefixes
    // followed by random garbage (the header parsers' worst case)
    val magics = Seq(
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      Array(0xff, 0xd8, 0xff).map(_.toByte),
      "GIF89a".getBytes("US-ASCII"),
      "RIFF0000WAVE".getBytes("US-ASCII").patch(4, Array[Byte](0, 1, 0, 0), 4),
      Array.empty[Byte])
    val gen = for {
      magic <- Gen.oneOf(magics)
      n <- Gen.chooseNum(0, 200)
      tail <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield magic ++ tail.toArray
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(gen) { bytes =>
        val m = MediaCodec.sniff(bytes) // must return, not hang/throw
        m.fmt != null && m.width >= Int.MinValue
      })
    assert(res.passed, res.status.toString)
  }

  test("q_multimodal_decode: real payloads match the doc_id formula, features are real content stats") {
    val rows = q("q_multimodal_decode").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (fmt, w, h, sr, ch) =
        (r.getString(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))
      val f0 = r.getDouble(7)
      val (ew, eh) = ((id % 24 + 8).toInt, (id % 18 + 8).toInt)
      (id % 4) match {
        case 0 => assert(fmt == "image/png" && w == ew && h == eh, s"doc $id")
        case 1 => assert(fmt == "image/jpeg" && w == ew && h == eh, s"doc $id")
        case 2 => assert(fmt == "image/gif" && w == ew && h == eh, s"doc $id")
        case _ => assert(fmt == "audio/wav" &&
          sr == 8000 + (id % 8) * 1000 && ch == 1, s"doc $id")
      }
      // f0 is a REAL content statistic: for audio it is the overall
      // RMS of the decoded sine (analytic value amp/√2); for images
      // the first centered-profile component, bounded by its norm
      if (id % 4 == 3)
        assert(math.abs(f0 - 0.5 / math.sqrt(2.0)) < 0.01, s"doc $id rms $f0")
      else assert(f0 >= -1.0 && f0 <= 1.0, s"doc $id f0 $f0")
    }
  }

  test("contentFeatures dispatches on real decoded content per modality") {
    // image: 16-dim unit-norm centered profile
    val png = operators.ImageCodec.synthPng(Array[Byte](3, 1, 4), 1)
    val fi = operators.Multimodal.contentFeatures(png)
    assert(fi.length == 16)
    assert(math.abs(fi.map(x => x.toDouble * x).sum - 1.0) < 1e-3)
    // audio: 8-dim [rms, zcr, 4-seg envelope, duration, rate]; a
    // constant-amplitude sine has a flat envelope equal to its RMS
    val wav = operators.AudioCodec.synthWav(8000, 1600, 440.0, 0.5, 11L)
    val fa = operators.Multimodal.contentFeatures(wav)
    assert(fa.length == 8)
    assert(math.abs(fa(0) - 0.5 / math.sqrt(2.0)) < 0.01)
    (2 to 5).foreach(i => assert(math.abs(fa(i) - fa(0)) < 0.005, s"seg $i"))
    assert(math.abs(fa(6) - 0.2) < 1e-4) // 1600 samples @ 8 kHz
    // undecodable: EMPTY (absence ≠ a black image)
    assert(operators.Multimodal.contentFeatures("plain text".getBytes).isEmpty)
  }

  test("decode of a real PNG payload in the Spark path") {
    import spark.implicits._
    val ds = Seq(Multimodal.Payload(1L, realPng)).toDS()
    val f = Multimodal.decodeFeatures(ds).collect().head
    assert(f.fmt == "image/png" && f.width == 1 && f.height == 1 &&
      f.n_bytes == realPng.length)
  }

  // --- real pixel codec (ImageCodec / round-4) ---

  test("ImageCodec PNG encode→decode round-trips deterministically") {
    val seed = Array[Byte](1, 2, 3, 4)
    val png1 = operators.ImageCodec.synthPng(seed, 5)
    val png2 = operators.ImageCodec.synthPng(seed, 5)
    assert(png1.sameElements(png2), "PNG encoding must be deterministic")
    // real PNG: MediaCodec's independent header sniffer agrees
    val meta = operators.MediaCodec.sniff(png1)
    assert(meta.fmt == "image/png" && meta.width == 16 && meta.height == 16)
    val px = operators.ImageCodec.decodePx(png1)
    assert(px.ok && px.w == 16 && px.h == 16)
    assert(px.meanR > 0 && px.meanR < 255 &&
      px.meanG > 0 && px.meanG < 255 && px.meanB > 0 && px.meanB < 255)
    assert(operators.ImageCodec.decodePx(png2).phash == px.phash)
  }

  test("planted near-dups have tiny dHash distance, unrelated images a large one") {
    val seedA = Array[Byte](9, 9, 9); val seedB = Array[Byte](7, 7, 7)
    def ah(seed: Array[Byte], v: Int) =
      operators.ImageCodec.decodePx(operators.ImageCodec.synthPng(seed, v)).phash
    val near = java.lang.Long.bitCount(ah(seedA, 1) ^ ah(seedA, 10))
    val far = java.lang.Long.bitCount(ah(seedA, 1) ^ ah(seedB, 1))
    assert(near <= 6, s"planted near-dup hamming $near")
    assert(far > 6, s"unrelated hamming $far should exceed the threshold")
  }

  test("q_image_dedup_phash finds every planted doc_id/3 group pair") {
    val rows = q("q_image_dedup_phash").collect()
    val found = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = for {
      g <- ids.groupBy(_ / 3).values.toSeq
      pair <- g.sorted.toSeq.combinations(2).toSeq
    } yield (pair(0), pair(1))
    expected.foreach { p =>
      assert(found.contains(p), s"planted near-dup pair $p missed")
    }
    // hamming column is consistent with the threshold
    rows.foreach(r => assert(r.getInt(2) >= 0 && r.getInt(2) <= 6))
  }

  test("q_image_features: every doc decoded across PNG/JPEG/GIF, group-consistent hashes") {
    val rows = q("q_image_features").collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length.toLong == total)
    rows.foreach { r =>
      val expectFmt = ((r.getLong(0) / 3) % 3) match {
        case 0 => "png"; case 1 => "jpg"; case _ => "gif"
      }
      assert(r.getString(1) == expectFmt)
      assert(r.getInt(2) == 16 && r.getInt(3) == 16)
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 255)
    }
    // same doc_id/3 group => near-identical images => close hashes.
    // Formats are constant within a group; lossless png/gif-decoded
    // pixels keep the planted bound tight (measured max 4), JPEG's
    // lossy block artifacts widen it (measured max 7, bound 10).
    rows.groupBy(_.getLong(0) / 3).values.foreach { g =>
      val bound = if (g.head.getString(1) == "jpg") 10 else 6
      val hs = g.map(_.getLong(7))
      for (a <- hs; b <- hs)
        assert(java.lang.Long.bitCount(a ^ b) <= bound,
          s"group hashes too far apart (${g.head.getString(1)}): $a vs $b")
    }
  }

  test("ImageCodec JPEG and GIF encode→decode: deterministic, real pixels, correct dims") {
    val seed = Array[Byte](5, 6, 7)
    for (fmt <- Seq("jpg", "gif")) {
      val b1 = operators.ImageCodec.synthImage(seed, 3, 16, 16, fmt)
      val b2 = operators.ImageCodec.synthImage(seed, 3, 16, 16, fmt)
      assert(b1.sameElements(b2), s"$fmt encoding must be deterministic")
      // the independent header sniffer agrees on format and dims
      val m = MediaCodec.sniff(b1)
      assert(m.fmt == s"image/${if (fmt == "jpg") "jpeg" else fmt}" &&
        m.width == 16 && m.height == 16, s"$fmt: $m")
      val px = operators.ImageCodec.decodePx(b1)
      assert(px.ok && px.w == 16 && px.h == 16, s"$fmt decode")
      assert(px.meanR > 0 && px.meanR < 255, s"$fmt pixels")
      // non-square dims survive the round trip
      val rect = operators.ImageCodec.decodePx(
        operators.ImageCodec.synthImage(seed, 3, 31, 9, fmt))
      assert(rect.ok && rect.w == 31 && rect.h == 9, s"$fmt rect")
    }
  }

  test("q_embed_real: full planted recall, no false positives at the cosine gate") {
    val rows = q("q_embed_real").collect()
    val found = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = (for {
      g <- ids.groupBy(_ / 3).values.toSeq
      pair <- g.sorted.toSeq.combinations(2).toSeq
    } yield (pair(0), pair(1))).toSet
    // planted near-dups (≤8 perturbed pixels of 256): measured
    // embedding cosine ≥ 0.944, sign signatures differ in ≤4 of 16
    // bits with zero 4-band misses — every planted pair must surface
    expected.foreach { p =>
      assert(found.contains(p), s"planted near-dup pair $p missed")
    }
    // the gate itself: every emitted pair really is cosine ≥ 0.9
    // (unrelated-image cosine measured ≤ 0.844 — the gap is real)
    rows.foreach(r => assert(r.getDouble(2) >= 0.9 && r.getDouble(2) <= 1.0))
  }
  // --- real audio codec (AudioCodec / round-4) ---

  test("AudioCodec sine round-trip matches analytic RMS and frequency") {
    val sr = 8000
    val wav = operators.AudioCodec.synthWav(sr, 4000, 440.0, 0.5, seed = 7L)
    // independent header sniffer agrees it is a real mono WAV
    val meta = operators.MediaCodec.sniff(wav)
    assert(meta.fmt == "audio/wav" && meta.sampleRate == sr && meta.channels == 1)
    val w = operators.AudioCodec.decodeWav(wav)
    assert(w.ok && w.nSamples == 4000 && w.sampleRate == sr)
    // sine RMS = amp/sqrt(2) = 0.35355; noise floor is -48 dB
    assert(math.abs(w.rms - 0.5 / math.sqrt(2.0)) < 0.01, s"rms ${w.rms}")
    // ZCR of a sine = 2f/sr
    val estFreq = w.zcr * sr / 2.0
    assert(math.abs(estFreq - 440.0) < 25.0, s"est freq $estFreq")
  }

  test("AudioCodec rejects junk and non-WAV payloads") {
    assert(!operators.AudioCodec.decodeWav("not audio at all".getBytes).ok)
    assert(!operators.AudioCodec.decodeWav(realPng).ok)
    // header with no data chunk
    assert(!operators.AudioCodec.decodeWav(operators.MediaCodec.wavHeader(8000, 1)).ok)
  }

  test("q_audio_features: every doc decoded with sane DSP stats") {
    val rows = q("q_audio_features").collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length.toLong == total)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 8000 && r.getInt(2) == 1600)
      assert(math.abs(r.getDouble(3) - 0.5 / math.sqrt(2.0)) < 0.01, s"doc $id rms")
      val trueFreq = 200.0 + (id % 20) * 100.0
      assert(math.abs(r.getDouble(5) - trueFreq) < 60.0,
        s"doc $id est ${r.getDouble(5)} vs $trueFreq")
    }
  }

  test("animated GIF codec: frame count round-trips, frames differ, deterministic") {
    val seed = java.security.MessageDigest.getInstance("MD5")
      .digest("clip".getBytes("UTF-8"))
    val gif = operators.ImageCodec.synthAnimatedGif(seed, 6, 16, 16)
    // GIF89a magic and determinism at the byte level
    assert(new String(gif.take(6), "US-ASCII") == "GIF89a")
    assert(java.util.Arrays.equals(gif,
      operators.ImageCodec.synthAnimatedGif(seed, 6, 16, 16)))
    val means = operators.ImageCodec.decodeFrameMeans(gif)
    assert(means.length == 6, s"decoded ${means.length} of 6 frames")
    means.foreach(m => assert(m > 0 && m < 255))
    // consecutive frames perturb different blocks with different
    // deltas — at least one sampled pair of frames must differ
    assert(means.distinct.length > 1, "all frames identical")
    // junk in, zero frames out
    assert(operators.ImageCodec.decodeFrameMeans("junk".getBytes).isEmpty)
  }

  test("area-average resize: solid color preserved, quadrant geometry, deterministic") {
    // solid-color 16x16 PNG -> every 2x2 cell is exactly that color
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val solid = operators.ImageCodec.resizeRgb(bos.toByteArray, 2, 2)
    assert(solid.toSeq == Seq(0x336699, 0x336699, 0x336699, 0x336699))
    // quadrant image: each 8x8 quadrant its own color -> 2x2 resize
    // recovers the quadrant colors in row-major order
    val q = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    for (y <- 0 until 16; x <- 0 until 16)
      q.setRGB(x, y, colors((y / 8) * 2 + (x / 8)))
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(q, "png", bos2)
    assert(operators.ImageCodec.resizeRgb(bos2.toByteArray, 2, 2).toSeq == colors)
    // junk rejected
    assert(operators.ImageCodec.resizeRgb("junk".getBytes, 2, 2) == null)
    // upscale rejected loudly (empty cells would silently render black)
    intercept[IllegalArgumentException] {
      operators.ImageCodec.resizeRgb(bos.toByteArray, 32, 32)
    }
  }

  test("q_image_resize: one thumbnail per doc, shared-seed groups share thumbnails") {
    val rows = q("q_image_resize").collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length.toLong == total)
    rows.foreach { r =>
      assert(r.getInt(1) == 16)
      assert(r.getDouble(2) > 0 && r.getDouble(2) < 255)
    }
    // same doc_id/3 group + same variant formula -> near-identical
    // thumbnails; at minimum the group's gray means must be close
    rows.groupBy(r => r.getLong(0) / 3).foreach { case (g, rs) =>
      val grays = rs.map(_.getDouble(2))
      assert(grays.max - grays.min < 3.0, s"group $g spread ${grays.max - grays.min}")
    }
  }

  test("q_frame_sample: stride-2 sampling of every clip, counts from the formula") {
    val rows = q("q_frame_sample").collect()
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = ids.map(id => id -> ((id % 5).toInt + 4)).toMap
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet == expected.keySet)
    byDoc.foreach { case (id, rs) =>
      val nf = expected(id)
      assert(rs.forall(_.getInt(1) == nf), s"doc $id n_frames")
      val idxs = rs.map(_.getInt(2)).sorted
      assert(idxs.sameElements(0 until nf by 2), s"doc $id sampled $idxs")
      rs.foreach(r => assert(r.getDouble(3) > 0 && r.getDouble(3) < 255))
    }
  }

  // ---- fixture-installer cross-process contract (VERDICT r8 #6) ----
  // The in-flight rename race needs two JVMs and is argued in the
  // mediaBase scaladoc (pid-suffixed tmp + atomic rename + _SUCCESS
  // re-check); what IS observable single-JVM is the filesystem
  // protocol another process relies on: a COMPLETE tree (_SUCCESS)
  // is reused untouched, a _SUCCESS-less debris tree is replaced.

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def freshDocsDir(tag: String): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_media_$tag").toFile
    spark.read.parquet(s"$sf/documents.parquet").limit(20).coalesce(1)
      .write.parquet(new java.io.File(dir, "documents.parquet").getAbsolutePath)
    dir
  }

  private def fixtureDirFor(docsDir: java.io.File): java.io.File =
    new java.io.File(sys.props("java.io.tmpdir"),
      "graft_media_" + md5hex(docsDir.getAbsolutePath))

  private def copyTree(src: java.io.File, dst: java.io.File): Unit = {
    dst.mkdirs()
    src.listFiles().foreach { f =>
      val t = new java.io.File(dst, f.getName)
      if (f.isDirectory) copyTree(f, t)
      else java.nio.file.Files.copy(f.toPath, t.toPath)
    }
  }

  test("media installer reuses a complete (_SUCCESS) tree from another process untouched") {
    val dirA = freshDocsDir("a")
    val builtA = new java.io.File(Multimodal.mediaBase(spark, dirA.getAbsolutePath))
    assert(new java.io.File(builtA, "_SUCCESS").exists())
    // stage dirB whose fixture tree was "installed by another process"
    // (a copy of A's complete tree — same 20 docs) plus a sentinel
    val dirB = freshDocsDir("b")
    val fixB = fixtureDirFor(dirB)
    copyTree(builtA, fixB)
    val sentinel = new java.io.File(fixB, "sentinel_from_other_process")
    assert(sentinel.createNewFile())
    val builtB = new java.io.File(Multimodal.mediaBase(spark, dirB.getAbsolutePath))
    assert(builtB.getAbsolutePath == fixB.getAbsolutePath)
    assert(sentinel.exists(), "complete tree must be reused as-is, not rebuilt")
    assert(spark.read.parquet(builtB.getAbsolutePath).count() == 20)
  }

  test("media installer replaces a _SUCCESS-less debris tree") {
    val dirC = freshDocsDir("c")
    val fixC = fixtureDirFor(dirC)
    fixC.mkdirs()
    val debris = new java.io.File(fixC, "debris_of_killed_run")
    assert(debris.createNewFile()) // no _SUCCESS => incomplete
    val builtC = new java.io.File(Multimodal.mediaBase(spark, dirC.getAbsolutePath))
    assert(builtC.getAbsolutePath == fixC.getAbsolutePath)
    assert(!debris.exists(), "debris must be removed by the install rename")
    assert(new java.io.File(builtC, "_SUCCESS").exists())
    assert(spark.read.parquet(builtC.getAbsolutePath).count() == 20)
  }
}
