package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY.md §2.4 LLM-pipeline row): media as
  * opaque `binary` columns plus typed metadata, with decode / feature
  * extraction / frame sampling as partition-local kernels.
  *
  * Container reality: no image/audio codecs ship in this sandbox, so the
  * decode kernel is STUBBED — [[DecodeStub.decode]] produces a
  * deterministic fake (dimensions from a content hash) where a production
  * build would call the codec. Everything around the stub is real and
  * load-bearing at scale:
  *   - media rides in a `binary` column, so it partitions/shuffles/spills
  *     like any other column and the scan can still prune *other* columns;
  *   - kernels run via `mapPartitions` on typed Datasets — one JVM-side
  *     batch per partition, the Scala analogue of Python's `mapInPandas`
  *     (same batching shape: iterator-in, iterator-out, no per-row setup);
  *   - byte-level features (histogram) ARE computed for real, as the
  *     stand-in embedding.
  *
  * Since the testdata carries no real media, bytes are derived from
  * `documents.text` (UTF-8) — the plumbing is type-identical to real
  * image/audio payloads.
  */
object Multimodal {

  /** A media row: payload + the typed metadata curation pipelines key on. */
  case class MediaRow(doc_id: Long, media_type: String, bytes: Array[Byte])

  /** Decoded media: stub dimensions + a real byte-histogram feature. */
  case class DecodedRow(doc_id: Long, media_type: String, n_bytes: Long,
                        width: Int, height: Int, channels: Int,
                        features: Array[Double])

  /** documents → media frame: binary payload column + metadata. The
    * media_type assignment is deterministic (doc_id mod 3) so tests and
    * oracles reproduce it.
    */
  def mediaFrame(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("media_type"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        md5(col("text")).as("content_md5")).as("meta"))

  /** The stubbed codec: a production implementation would decode the
    * container format here (JPEG/OPUS/H.264); the sandbox has no codecs,
    * so dimensions derive deterministically from content bytes. The
    * 16-bin byte histogram is computed for real and normalized to sum 1 —
    * the stand-in for an embedding model's output.
    */
  object DecodeStub {
    def decode(r: MediaRow): DecodedRow = {
      // --- STUB: replace with real codec dispatch on media_type ---
      val h = java.util.Arrays.hashCode(r.bytes).toLong & 0x7fffffffL
      val width = (h % 1920 + 1).toInt
      val height = (h / 1920 % 1080 + 1).toInt
      val channels = if (r.media_type == "audio") 1 else 3
      // --- real computation: 16-bin byte histogram, L1-normalized ---
      val hist = new Array[Double](16)
      var i = 0
      while (i < r.bytes.length) {
        hist((r.bytes(i) & 0xff) >> 4) += 1.0
        i += 1
      }
      val n = math.max(r.bytes.length, 1)
      var b = 0
      while (b < 16) { hist(b) /= n; b += 1 }
      DecodedRow(r.doc_id, r.media_type, r.bytes.length.toLong,
        width, height, channels, hist)
    }
  }

  /** Partition-parallel decode: iterator-in/iterator-out per partition —
    * per-partition (not per-row) kernel setup cost, exactly how a real
    * codec or model handle would be amortized.
    */
  def decodeAll(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(DecodeStub.decode))
  }

  /** A resized payload: original length kept for audit. */
  case class ResizedRow(doc_id: Long, media_type: String,
                        orig_len: Long, bytes: Array[Byte])

  /** Resize: nearest-neighbor resampling of the payload to a fixed
    * target length — the per-axis primitive image/audio resize performs
    * (real pixel resize applies it per row/column after decode; the
    * sandbox's stub payloads are 1-D, so it applies once). Runs as the
    * same partition-local typed kernel as [[decodeAll]]: iterator in,
    * iterator out, no shuffle, output size fixed per row — the shape
    * that makes a downstream fixed-size model batch packable.
    */
  def resizeAll(media: Dataset[MediaRow], targetLen: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    require(targetLen > 0, "targetLen must be positive")
    media.mapPartitions(_.map { r =>
      val n = r.bytes.length
      val out = new Array[Byte](targetLen)
      if (n > 0) {
        var i = 0
        while (i < targetLen) {
          out(i) = r.bytes((i.toLong * n / targetLen).toInt)
          i += 1
        }
      }
      ResizedRow(r.doc_id, r.media_type, n.toLong, out)
    })
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * `frames` equal chunks (one row per frame). Pure expression — the
    * generator (posexplode) multiplies rows without a shuffle, and the
    * chunk slicing happens where the data lives.
    */
  def frameSample(media: DataFrame, frames: Int): DataFrame = {
    val total = octet_length(col("media"))
    // ceil division; Column./ is double division, so truncate explicitly
    val per = ((total + frames - 1) / frames).cast("int")
    media
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("media"), per.as("chunk"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(frames - 1)),
          i => col("media").substr(i * col("chunk") + 1, col("chunk")))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
      .filter(octet_length(col("frame_bytes")) > 0)
  }
}
