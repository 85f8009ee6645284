package graft.multimodal

import graft.functions.HashConsts.SimHashBits
import graft.multimodal.BmpCodec.BmpImage

/** Perceptual fingerprints over DECODED media — the operators a multimodal
  * training-data pipeline runs first (r16 verdict asks #1/#2): a 48-bit
  * image difference-hash (dHash) computed from pixels read back out of a
  * genuine BMP container, and a 48-bit acoustic fingerprint (per-window
  * energy-delta signs, the Haitsma–Kalker shape) computed from PCM16
  * samples read back out of a genuine WAV container. Both signatures are
  * [[SimHashBits]] wide ON PURPOSE: the near-dup join downstream is
  * exactly q24's occupancy-adaptive Hamming block-permutation band join
  * ([[graft.functions.HashConsts.simHashTableMasks]]) — one banding
  * machine for text, image, and audio near-dup.
  *
  * Everything here is exact integer arithmetic so the DuckDB oracle can
  * re-derive every signature from the synthesis formula alone: the
  * shared mixer [[mix]] keeps all intermediates < 2^63 (DuckDB raises on
  * BIGINT overflow, so the bounds are load-bearing for oracle parity),
  * and the SQL renderers at the bottom emit the IDENTICAL arithmetic
  * from the same constants — one definition per side, zero drift.
  *
  * Corpus synthesis (the testdata carries no real media — q156/q157/q162
  * idiom): each document's media derives from a SEED; a deterministic
  * subset of documents are "twins" whose media is their base document's
  * media with a single-element perturbation (one pixel / one sample), so
  * the corpus contains planted near-duplicates whose detection the
  * oracle predicts exactly. The perturbation touches one sampled grid
  * cell (one window), flipping ≤ 2 of 48 signature bits — within the
  * hamming ≤ 3 contract the 4-band pigeonhole makes lossless.
  */
object PerceptualHash {

  // ---- image (q197): 21×16 synth grid → 7×8 sample grid → 48-bit dHash
  val ImgW: Int = 21
  val ImgH: Int = 16
  val GridCols: Int = 7
  val GridRows: Int = 8
  require((GridCols - 1) * GridRows == SimHashBits,
    "dHash width must equal the shared banding width")
  /** doc_id % ImgTwinMod == ImgTwinOff ⇒ the doc is a planted image twin
    * of seed doc_id − ImgTwinOff. */
  val ImgTwinMod: Long = 17L
  val ImgTwinOff: Long = 5L
  /** The twin's single perturbed pixel — (9, 8) is exactly the sampled
    * cell (i=3, j=4), so the perturbation provably lands in the hash. */
  val PerturbX: Int = 9
  val PerturbY: Int = 8

  // ---- audio (q198): 49 windows × 16 PCM16 samples → 48-bit fingerprint
  val FpWindows: Int = 49
  val FpWinLen: Int = 16
  val FpSamples: Int = FpWindows * FpWinLen
  require(FpWindows - 1 == SimHashBits,
    "fingerprint width must equal the shared banding width")
  val WavTwinMod: Long = 19L
  val WavTwinOff: Long = 7L
  /** The twin's single perturbed sample (+1, inside window 18). */
  val PerturbK: Int = 300

  // ---- video (q200): frame-sampled dHash sequence -------------------
  /** Frames per synthesized "video" and per-frame geometry: 14×8 frames
    * sample to the same 7×8 grid (x step 2, y step 1), so each frame
    * carries a full 48-bit dHash and the SAME banding machine serves
    * frame-level candidates. */
  val VidFrames: Int = 6
  val FrameW: Int = 14
  val FrameH: Int = 8
  require(FrameW % GridCols == 0 && FrameH % GridRows == 0,
    "frame geometry must sample exactly onto the dHash grid")
  val VidTwinMod: Long = 23L
  val VidTwinOff: Long = 11L
  /** The twin's single perturbed pixel lives in ONE frame: (f=2, 4, 3)
    * — a sampled cell, so ≤ 2 bits of that frame's hash flip and the
    * other [[VidFrames]]−1 frames stay identical. */
  val VidPerturbF: Int = 2
  val VidPerturbX: Int = 4
  val VidPerturbY: Int = 3
  /** Aligned-frame matches required before two videos count as near-dups
    * (4 of 6: tolerant to a corrupted/re-encoded frame or two, strict
    * enough that random 48-bit hashes can never assemble a pair). */
  val VidMinFrames: Int = 4

  /** Synthesized gray value of pixel (x, y) in frame f: the image
    * formula with the frame index folded into the seed lane (doc seeds
    * and frame indices stay distinct mod 2^20 at every shipped corpus
    * size). */
  def vidGrayAt(seed: Long, f: Int, x: Int, y: Int): Int =
    (mix(((seed * 7 + f) % 1048576L) * 2654435761L + x * 8191L + y * 524287L) % 256L).toInt

  // ---- the shared integer mixer ------------------------------------
  /** Three xorshift/multiply rounds over a non-negative input < 2^52.
    * Bounds (both engines 64-bit signed): u < 2^52 ⇒ v1 < 2^31 ⇒
    * v2 < 2^31·179426549 < 2^59 ⇒ m2 < 2^31 ⇒ v4 < 2^31·2654435761 <
    * 2^63. Empirically strong enough that 48 comparison bits behave
    * independently across seeds: at 5000 documents the ONLY hamming ≤ 3
    * pairs are the planted twins (MultimodalSpec pins the fixture-scale
    * version of this).
    */
  def mix(u: Long): Long = {
    val v1 = (u ^ (u >> 21)) % 2147483648L
    val v2 = v1 * 179426549L
    val v3 = v2 ^ (v2 >> 17)
    val m2 = v3 % 2147483648L
    val v4 = m2 * 2654435761L
    v4 ^ (v4 >> 13)
  }

  /** Synthesized gray value of pixel (x, y) for a seed: 0..255. */
  def grayAt(seed: Long, x: Int, y: Int): Int =
    (mix((seed % 1048576L) * 2654435761L + x * 8191L + y * 524287L) % 256L).toInt

  /** Synthesized PCM16 sample k for a seed: −1024..1023. */
  def sampleAt(seed: Long, k: Int): Int =
    (mix((seed % 1048576L) * 2654435761L + k * 39916801L) % 2048L - 1024L).toInt

  // ---- fingerprints over DECODED media ------------------------------
  /** 48-bit dHash of a decoded pixel grid: integer-mean luminance,
    * nearest-neighbor downsample to GridCols × GridRows, bit j·6+i set
    * iff gray(i+1, j) > gray(i, j) — the standard difference-hash, sized
    * to the shared 48-bit banding. Pure integer ops on the decoded
    * array; works on any [[BmpCodec.BmpImage]], not just synthesized
    * ones.
    */
  def dHash(img: BmpImage): Long = {
    def grayGrid(i: Int, j: Int): Int = {
      val x = i * img.width / GridCols
      val y = j * img.height / GridRows
      val p = img.px(y * img.width + x)
      (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
    }
    var sig = 0L
    var j = 0
    while (j < GridRows) {
      var i = 0
      while (i < GridCols - 1) {
        if (grayGrid(i + 1, j) > grayGrid(i, j))
          sig |= 1L << (j * (GridCols - 1) + i)
        i += 1
      }
      j += 1
    }
    sig
  }

  /** 48-bit acoustic fingerprint of decoded PCM16 samples: cut into
    * [[FpWindows]] equal windows, exact integer energy Σs² per window,
    * bit t set iff energy(t+1) > energy(t) — the energy-delta-sign
    * fingerprint (Haitsma–Kalker 2002 shape, single band).
    */
  def audioFp(samples: Array[Short]): Long = {
    require(samples.length == FpSamples,
      s"fingerprint expects $FpSamples samples, got ${samples.length}")
    val e = new Array[Long](FpWindows)
    var w = 0
    while (w < FpWindows) {
      var acc = 0L
      var u = 0
      while (u < FpWinLen) {
        val s = samples(w * FpWinLen + u).toLong
        acc += s * s
        u += 1
      }
      e(w) = acc
      w += 1
    }
    var sig = 0L
    var t = 0
    while (t < FpWindows - 1) {
      if (e(t + 1) > e(t)) sig |= 1L << t
      t += 1
    }
    sig
  }

  // ---- DuckDB renderers (one constant set, two engines) --------------
  /** SQL for [[mix]] over a non-negative BIGINT expression. The input is
    * substituted textually, so pass a parenthesized or atomic expression.
    */
  def mixSql(u: String): String = {
    val v1 = s"(xor($u, ($u) >> 21) % 2147483648)"
    val v2 = s"($v1 * 179426549)"
    val v3 = s"xor($v2, $v2 >> 17)"
    val m2 = s"($v3 % 2147483648)"
    val v4 = s"($m2 * 2654435761)"
    s"xor($v4, $v4 >> 13)"
  }

  /** SQL for [[grayAt]] (expressions for seed/x/y). */
  def graySql(seed: String, x: String, y: String): String =
    s"(${mixSql(s"(($seed) % 1048576) * 2654435761 + ($x) * 8191 + ($y) * 524287")} % 256)"

  /** SQL for [[sampleAt]] (expressions for seed/k). */
  def sampSql(seed: String, k: String): String =
    s"(${mixSql(s"(($seed) % 1048576) * 2654435761 + ($k) * 39916801")} % 2048 - 1024)"

  /** SQL for [[vidGrayAt]] (expressions for seed/f/x/y). */
  def vidGraySql(seed: String, f: String, x: String, y: String): String =
    s"(${mixSql(s"((($seed) * 7 + ($f)) % 1048576) * 2654435761 + ($x) * 8191 + ($y) * 524287")} % 256)"
}
