package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{DecodedRow, MediaRow}

/** The multimodal plumbing around the stubbed codec: schema, partition
  * batching, deterministic fake decode, real histogram features, frame
  * sampling.
  */
class MultimodalSpec extends SparkTestBase {

  private lazy val media = Multimodal.mediaFrame(Tables.documents(spark, sf))

  test("media frame: binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("media").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val r = media.filter(col("doc_id") === 1).head()
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Long]("n_bytes") === r.getAs[Array[Byte]]("media").length.toLong)
  }

  test("decode runs per-partition and preserves row count and ids") {
    import spark.implicits._
    val ds = media.select(col("doc_id"), col("media_type"), col("media").as("bytes"))
      .as[MediaRow].repartition(5)
    val out = Multimodal.decodeAll(ds).cache()
    assert(out.count() === media.count())
    assert(out.select("doc_id").distinct().count() === media.count())
    assert(out.rdd.getNumPartitions === 5, "kernel must not reshuffle")
  }

  test("decode stub is deterministic and histogram features are a real distribution") {
    import spark.implicits._
    val ds = media.select(col("doc_id"), col("media_type"), col("media").as("bytes"))
      .as[MediaRow]
    val a = Multimodal.decodeAll(ds).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeAll(ds.repartition(7)).collect().sortBy(_.doc_id)
    assert(a.map(r => (r.doc_id, r.width, r.height)).toSeq ===
      b.map(r => (r.doc_id, r.width, r.height)).toSeq)
    a.take(20).foreach { r: DecodedRow =>
      assert(r.features.length === 16)
      assert(math.abs(r.features.sum - 1.0) < 1e-9, s"histogram not normalized: ${r.features.sum}")
      assert(r.width >= 1 && r.height >= 1)
      assert(r.channels === (if (r.media_type == "audio") 1 else 3))
    }
  }

  test("frame sampling chunks video payloads without losing bytes") {
    val frames = Multimodal.frameSample(media, 4).cache()
    val videos = media.filter(col("media_type") === "video")
    // every video doc contributes >=1 and <=4 frames
    val perDoc = frames.groupBy("doc_id").count().collect()
    assert(perDoc.length === videos.count())
    perDoc.foreach(r => assert(r.getLong(1) >= 1 && r.getLong(1) <= 4))
    // byte conservation: sum of frame bytes == original payload bytes
    val reassembled = frames.groupBy("doc_id")
      .agg(sum(octet_length(col("frame_bytes"))).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    videos.select(col("doc_id"), octet_length(col("media")).cast("long").as("n"))
      .collect().foreach { r =>
        assert(reassembled(r.getLong(0)) === r.getLong(1),
          s"doc ${r.getLong(0)} lost bytes in frame sampling")
      }
  }

  test("resize produces fixed-length payloads, deterministically, endpoints preserved") {
    import spark.implicits._
    val ds = media.select(col("doc_id"), col("media_type"), col("media").as("bytes"))
      .as[Multimodal.MediaRow]
    val out = Multimodal.resizeAll(ds, 64).collect().sortBy(_.doc_id)
    assert(out.length === media.count())
    out.foreach { r =>
      assert(r.bytes.length === 64, s"doc ${r.doc_id}: wrong target length")
    }
    // nearest-neighbor keeps the first byte; repartitioning changes nothing
    val orig = ds.collect().map(r => r.doc_id -> r.bytes).toMap
    out.foreach(r => assert(r.bytes(0) === orig(r.doc_id)(0)))
    val again = Multimodal.resizeAll(ds.repartition(7), 64).collect().sortBy(_.doc_id)
    assert(out.zip(again).forall { case (a, b) => a.bytes.sameElements(b.bytes) })
  }

  // ---- real codecs (q156/q157): parsers must handle containers the
  // ---- encoder did NOT produce, and reject what they can't decode

  test("WAV: known 2-frame stereo fixture decodes to hand-computed facts") {
    import graft.multimodal.WavCodec
    // frames: (L=1000, R=-1000), (L=32767, R=-32768)
    val bytes = WavCodec.encode(44100, 2, Array[Short](1000, -1000, 32767, -32768))
    val w = WavCodec.decode(bytes)
    assert(w.sampleRate === 44100L && w.channels === 2L && w.bits === 16L)
    assert(w.nFrames === 2L)
    assert(w.durationMs === 2L * 1000 / 44100) // 0 ms — integer floor
    assert(w.peakAbs === 32768L)
    assert(w.sumSq === 1000L * 1000 * 2 + 32767L * 32767 + 32768L * 32768)
    assert(w.sumAbs === 1000L + 1000 + 32767 + 32768)
    assert(bytes.length === 44 + 8)
  }

  test("WAV: chunk walk survives a foreign LIST chunk before data (incl. odd size)") {
    import graft.multimodal.WavCodec
    import java.nio.{ByteBuffer, ByteOrder}
    val plain = WavCodec.encode(8000, 1, Array[Short](5, -7, 9))
    for (junkLen <- Seq(6, 7)) { // even and ODD payload (RIFF pads to even)
      val junk = new Array[Byte](junkLen + (junkLen & 1))
      val bb = ByteBuffer.allocate(plain.length + 8 + junk.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(plain, 0, 12)                        // RIFF..WAVE
      bb.put("LIST".getBytes("US-ASCII")).putInt(junkLen).put(junk)
      bb.put(plain, 12, plain.length - 12)        // fmt + data as-is
      val w = WavCodec.decode(bb.array())
      assert(w.nFrames === 3L && w.peakAbs === 9L && w.sumAbs === 21L,
        s"junkLen=$junkLen: chunk walk broke")
    }
  }

  test("WAV: non-RIFF, non-PCM, and non-16-bit containers are rejected") {
    import graft.multimodal.WavCodec
    import java.nio.{ByteBuffer, ByteOrder}
    val good = WavCodec.encode(8000, 1, Array[Short](1, 2))
    intercept[IllegalArgumentException](WavCodec.decode("nope".getBytes ++ good.drop(4)))
    val fmtCode = ByteBuffer.wrap(good.clone()).order(ByteOrder.LITTLE_ENDIAN)
    fmtCode.putShort(20, 7.toShort)               // audio format: μ-law
    intercept[IllegalArgumentException](WavCodec.decode(fmtCode.array()))
    val bits = ByteBuffer.wrap(good.clone()).order(ByteOrder.LITTLE_ENDIAN)
    bits.putShort(34, 8.toShort)                  // bits per sample: 8
    intercept[IllegalArgumentException](WavCodec.decode(bits.array()))
  }

  test("BMP: padded odd-width image round-trips exact channel sums") {
    import graft.multimodal.BmpCodec
    // width 5 → row 15 bytes → stride 16 (1 pad byte/row): exercises padding
    val w = 5; val h = 3
    def px(x: Int, y: Int) = (x + 10 * y, x + 10 * y + 1, x + 10 * y + 2)
    val bytes = BmpCodec.encode(w, h, px)
    val info = BmpCodec.decode(bytes)
    assert(info.width === w.toLong && info.height === h.toLong && info.bpp === 24L)
    assert(info.fileBytes === 54L + 16 * h)
    val base = (for (x <- 0 until w; y <- 0 until h) yield x + 10 * y).sum.toLong
    assert(info.sumB === base)
    assert(info.sumG === base + w * h)
    assert(info.sumR === base + 2L * w * h)
  }

  test("BMP: parser honors a non-standard pixel-array offset from the header") {
    import graft.multimodal.BmpCodec
    import java.nio.{ByteBuffer, ByteOrder}
    val plain = BmpCodec.encode(2, 2, (x, y) => (x, y, x + y))
    // splice 8 junk bytes between headers and pixels, patch the offset
    val out = ByteBuffer.allocate(plain.length + 8).order(ByteOrder.LITTLE_ENDIAN)
    out.put(plain, 0, 54).put(new Array[Byte](8)).put(plain, 54, plain.length - 54)
    out.putInt(10, 54 + 8)                        // bfOffBits
    val moved = BmpCodec.decode(out.array())
    val orig = BmpCodec.decode(plain)
    assert(moved.sumB === orig.sumB && moved.sumG === orig.sumG && moved.sumR === orig.sumR)
    assert(moved.width === 2L && moved.height === 2L)
  }

  test("PNG: round-trip restores exact channel sums through deflate + Sub filter") {
    import graft.multimodal.PngCodec
    // width 4, height 3: rows 0,2 filter None, row 1 filter Sub — the
    // Sub row's pixels INCREASE left-to-right, so unreconstructed sums
    // would be wrong by a large margin
    val w = 4; val h = 3
    def px(x: Int, y: Int) = (40 * x + y, 40 * x + y + 1, 40 * x + y + 2)
    val info = PngCodec.decode(PngCodec.encode(w, h, px))
    assert(info.width === w.toLong && info.height === h.toLong)
    assert(info.bitDepth === 8L && info.colorType === 2L)
    assert(info.payloadLen === h.toLong * (1 + 3 * w))
    assert(info.chunksCrcOk === 3L)
    val base = (for (x <- 0 until w; y <- 0 until h) yield 40 * x + y).sum.toLong
    assert(info.sumR === base)
    assert(info.sumG === base + w * h)
    assert(info.sumB === base + 2L * w * h)
  }

  test("PNG: Sub filter wraps mod 256 and reconstructs byte-exactly") {
    import graft.multimodal.PngCodec
    // deltas beyond ±127 force the mod-256 wrap in the filtered bytes
    val info = PngCodec.decode(PngCodec.encode(3, 2,
      (x, y) => (200 * x % 256, (255 - 130 * x) % 256, (3 + 90 * x + y) % 256)))
    val expR = (0 until 3).map(x => 200 * x % 256).sum.toLong * 2
    assert(info.sumR === expR)
  }

  test("PNG: decoder concatenates split IDAT chunks (real-world layout)") {
    import graft.multimodal.PngCodec
    import java.nio.ByteBuffer
    import java.util.zip.CRC32
    val plain = PngCodec.encode(6, 4, (x, y) => (x, y, x + y))
    // locate the single IDAT chunk (PNG is big-endian)
    val bb = ByteBuffer.wrap(plain); bb.position(8)
    var idatOff = -1; var idatLen = -1
    while (idatLen < 0) {
      val off = bb.position(); val len = bb.getInt()
      val tb = new Array[Byte](4); bb.get(tb)
      if (new String(tb, "US-ASCII") == "IDAT") { idatOff = off; idatLen = len }
      else bb.position(bb.position() + len + 4)
    }
    val data = java.util.Arrays.copyOfRange(plain, idatOff + 8, idatOff + 8 + idatLen)
    val cut = idatLen / 2
    def idatChunk(d: Array[Byte]): Array[Byte] = {
      val out = ByteBuffer.allocate(12 + d.length)
      out.putInt(d.length).put("IDAT".getBytes("US-ASCII")).put(d)
      val crc = new CRC32
      crc.update("IDAT".getBytes("US-ASCII")); crc.update(d)
      out.putInt(crc.getValue.toInt).array()
    }
    val split = plain.take(idatOff) ++
      idatChunk(data.take(cut)) ++ idatChunk(data.drop(cut)) ++
      plain.drop(idatOff + 12 + idatLen)
    val a = PngCodec.decode(split); val b = PngCodec.decode(plain)
    assert(a.sumR === b.sumR && a.sumG === b.sumG && a.sumB === b.sumB)
    assert(a.chunksCrcOk === 4L) // IHDR + 2×IDAT + IEND all verified
  }

  test("PNG: corrupted payload byte and wrong signature are rejected by CRC/signature checks") {
    import graft.multimodal.PngCodec
    val good = PngCodec.encode(5, 5, (x, y) => (x * y, x, y))
    val flipped = good.clone()
    flipped(8 + 12 + 13 + 8 + 4) = (flipped(8 + 12 + 13 + 8 + 4) ^ 0x40).toByte // inside IDAT data
    intercept[IllegalArgumentException](PngCodec.decode(flipped))
    intercept[IllegalArgumentException](PngCodec.decode(good.drop(1)))
  }

  // ---- perceptual near-dup (q197/q198): decoded-pixel/sample access,
  // ---- fingerprint math, planted twins, and banding losslessness

  test("BMP decodePixels returns the exact top-down grid across padding and bottom-up rows") {
    import graft.multimodal.BmpCodec
    // width 5 → 15-byte rows padded to 16: the padding path is exercised
    val bytes = BmpCodec.encode(5, 3, (x, y) => (x + 10 * y, 100 + x, 200 + y))
    val img = BmpCodec.decodePixels(bytes)
    assert(img.width === 5 && img.height === 3)
    for (y <- 0 until 3; x <- 0 until 5) {
      val p = img.px(y * 5 + x)
      assert((p & 0xff) === x + 10 * y, s"b at ($x,$y)")
      assert(((p >> 8) & 0xff) === 100 + x, s"g at ($x,$y)")
      assert(((p >> 16) & 0xff) === 200 + y, s"r at ($x,$y)")
    }
  }

  test("WAV decodeSamples returns the exact PCM16 payload including negatives") {
    import graft.multimodal.WavCodec
    val samples = Array[Short](0, 1, -1, 32767, -32768, 1001, -999)
    assert(WavCodec.decodeSamples(WavCodec.encode(8000, 1, samples)).sameElements(samples))
  }

  test("dHash: a 1-pixel perturbation at a sampled cell moves hamming by at most 2; other docs are far") {
    import graft.multimodal.{BmpCodec, PerceptualHash => P}
    def img(seed: Long, perturb: Boolean) = BmpCodec.decodePixels(
      BmpCodec.encode(P.ImgW, P.ImgH, (x, y) => {
        var v = P.grayAt(seed, x, y)
        if (perturb && x == P.PerturbX && y == P.PerturbY) v = (v + 128) % 256
        (v, v, v)
      }))
    val base = P.dHash(img(0L, perturb = false))
    val near = P.dHash(img(0L, perturb = true))
    assert(java.lang.Long.bitCount(base ^ near) <= 2, "perturbed twin drifted > 2 bits")
    val other = P.dHash(img(1L, perturb = false))
    assert(java.lang.Long.bitCount(base ^ other) > 3, "unrelated docs too close")
  }

  test("q197/q198 pair sets equal a plain-Scala brute force over all pairs (banding is lossless)") {
    import graft.multimodal.{BmpCodec, PerceptualHash => P, WavCodec}
    import graft.queries.MultimodalQ
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    def imgSig(docId: Long): Long = {
      val twin = docId % P.ImgTwinMod == P.ImgTwinOff
      val seed = if (twin) docId - P.ImgTwinOff else docId
      P.dHash(BmpCodec.decodePixels(BmpCodec.encode(P.ImgW, P.ImgH, (x, y) => {
        var v = P.grayAt(seed, x, y)
        if (twin && x == P.PerturbX && y == P.PerturbY) v = (v + 128) % 256
        (v, v, v)
      })))
    }
    def wavSig(docId: Long): Long = {
      val twin = docId % P.WavTwinMod == P.WavTwinOff
      val seed = if (twin) docId - P.WavTwinOff else docId
      val s0 = Array.tabulate(P.FpSamples)(k => P.sampleAt(seed, k).toShort)
      if (twin) s0(P.PerturbK) = (s0(P.PerturbK) + 1).toShort
      P.audioFp(WavCodec.decodeSamples(WavCodec.encode(8000, 1, s0)))
    }
    def brute(sig: Map[Long, Long]): Set[(Long, Long, Long)] =
      (for {
        i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
        h = java.lang.Long.bitCount(sig(ids(i)) ^ sig(ids(j))).toLong
        if h <= graft.functions.HashConsts.SimHashMaxHamming
      } yield (ids(i), ids(j), h)).toSet
    val imgSigs = ids.map(d => d -> imgSig(d)).toMap
    val wavSigs = ids.map(d => d -> wavSig(d)).toMap
    val gotImg = MultimodalQ.q197ImageNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming"))).toSet
    val gotWav = MultimodalQ.q198AudioNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming"))).toSet
    assert(gotImg === brute(imgSigs), "q197 pair set != brute force")
    assert(gotWav === brute(wavSigs), "q198 pair set != brute force")
    // planted twins present (the corpus guarantees base 0 exists), and a
    // genuine negative absent
    assert(gotImg.exists(p => p._1 === 0L && p._2 === P.ImgTwinOff && p._3 <= 2))
    assert(gotWav.exists(p => p._1 === 0L && p._2 === P.WavTwinOff && p._3 <= 2))
    assert(!gotImg.exists(p => p._1 === 0L && p._2 === 1L))
    assert(!gotWav.exists(p => p._1 === 0L && p._2 === 1L))
  }

  test("q200 pair set equals a plain-Scala brute force over aligned frame hashes (>= k-frames vote)") {
    import graft.multimodal.{BmpCodec, PerceptualHash => P}
    import graft.queries.MultimodalQ
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    def frameSig(docId: Long, f: Int): Long = {
      val twin = docId % P.VidTwinMod == P.VidTwinOff
      val seed = if (twin) docId - P.VidTwinOff else docId
      P.dHash(BmpCodec.decodePixels(BmpCodec.encode(P.FrameW, P.FrameH, (x, y) => {
        var v = P.vidGrayAt(seed, f, x, y)
        if (twin && f == P.VidPerturbF && x == P.VidPerturbX && y == P.VidPerturbY)
          v = (v + 128) % 256
        (v, v, v)
      })))
    }
    val sigs = ids.map(d => d -> Array.tabulate(P.VidFrames)(frameSig(d, _))).toMap
    val maxH = graft.functions.HashConsts.SimHashMaxHamming
    val brute = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      hs = (0 until P.VidFrames)
        .map(f => java.lang.Long.bitCount(sigs(ids(i))(f) ^ sigs(ids(j))(f)).toLong)
        .filter(_ <= maxH)
      if hs.size >= P.VidMinFrames
    } yield (ids(i), ids(j), hs.size.toLong, hs.sum)).toSet
    val got = MultimodalQ.q200VideoNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("frames_matched"), r.getAs[Long]("total_hamming"))).toSet
    assert(got === brute, "q200 pair set != brute force")
    // planted twin (0, 11): 5 exact frames + 1 perturbed (<= 2 bits)
    val twin = got.find(p => p._1 === 0L && p._2 === P.VidTwinOff)
    assert(twin.exists(p => p._3 === P.VidFrames.toLong && p._4 <= 2L),
      s"planted video twin missing or degraded: $twin")
    assert(!got.exists(p => p._1 === 0L && p._2 === 1L))
  }

  test("q197 verified pair set is invariant across banding ladder rungs (4 vs 8 blocks)") {
    import org.apache.spark.sql.functions.col
    import graft.multimodal.{BmpCodec, PerceptualHash => P}
    import spark.implicits._
    val sigs = Tables.documents(spark, sf).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { docId =>
        val twin = docId % P.ImgTwinMod == P.ImgTwinOff
        val seed = if (twin) docId - P.ImgTwinOff else docId
        (docId, P.dHash(BmpCodec.decodePixels(BmpCodec.encode(P.ImgW, P.ImgH, (x, y) => {
          var v = P.grayAt(seed, x, y)
          if (twin && x == P.PerturbX && y == P.PerturbY) v = (v + 128) % 256
          (v, v, v)
        }))))
      }).toDF("doc_id", "sig").cache()
    def pairs(blocks: Int) = graft.queries.Dedup.hammingBandPairs(sigs, blocks)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(4) === pairs(8), "wider rung lost or invented verified pairs")
    sigs.unpersist()
  }

  test("hammingBandPairs alignCols folds the frame into the join key: misaligned twins are never candidates") {
    import spark.implicits._
    // identical signatures on DIFFERENT frames (a misaligned candidate in
    // the r17 candidate-then-filter form) plus an aligned twin pair
    val sigs = Seq(
      (1L, 0, 0x0f0f0f0f0f0fL), (2L, 1, 0x0f0f0f0f0f0fL), // same sig, frames 0 vs 1
      (3L, 2, 0x123456789abL), (4L, 2, 0x123456789abL)    // same sig, same frame
    ).toDF("doc_id", "f", "sig")
    val aligned = graft.queries.Dedup.hammingBandPairs(sigs, 4, Seq("f"))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(aligned === Set((3L, 4L)),
      "frame-keyed band join must pair only same-frame signatures")
    // the unaligned machine WOULD have produced the misaligned candidate —
    // the pruning is real, not vacuous
    val unaligned = graft.queries.Dedup.hammingBandPairs(sigs.drop("f"), 4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unaligned === Set((1L, 2L), (3L, 4L)))
  }

  test("WAV decodeSamples rejects non-PCM16 containers loudly (8-bit fmt chunk)") {
    import graft.multimodal.WavCodec
    // a valid PCM16 container with the fmt chunk's bits-per-sample field
    // patched to 8: decode paths must fail the fmt parse, never silently
    // reinterpret the payload as PCM16 (r17 ADVICE #1, pinned)
    val bytes = WavCodec.encode(8000, 1, Array[Short](1, 2, 3, 4))
    // fmt chunk layout: "RIFF"(4) size(4) "WAVE"(4) "fmt "(4) size(4)
    // format(2) channels(2) rate(4) byterate(4) align(2) bits(2) → offset 34
    val bad = bytes.clone()
    bad(34) = 8.toByte; bad(35) = 0.toByte
    val e = intercept[IllegalArgumentException](WavCodec.decodeSamples(bad))
    assert(e.getMessage.contains("PCM16"), s"wrong failure: ${e.getMessage}")
    // sanity: the unpatched container still decodes
    assert(WavCodec.decodeSamples(bytes).sameElements(Array[Short](1, 2, 3, 4)))
  }
}
