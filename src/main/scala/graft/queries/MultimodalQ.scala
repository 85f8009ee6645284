package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.multimodal.Multimodal

/** Oracle-checked slice of the multimodal plumbing: the binary media
  * column + typed metadata (everything up to, but not including, the
  * stubbed codec — which is pinned by MultimodalSpec instead, since a
  * fake decode has no SQL equivalent worth asserting).
  */
object MultimodalQ {

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
}
