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
}
