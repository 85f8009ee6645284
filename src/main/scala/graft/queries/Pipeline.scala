package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._
import graft.pipeline.CustomerPipeline

/** Oracle-checked registration of the reference-parity pipeline semantics
  * (SURVEY.md §2.1–2.3): the full produce→consume hop — named projection,
  * decimal→double cast, JSON encode, JSON decode, DECIMAL(10,2) re-round —
  * run over a customer-shaped frame derived from the testdata `customer`
  * table.
  *
  * The oracle mirrors the *semantics*, not the JSON encoding: the wire hop
  * is value-preserving on doubles (Jackson prints shortest round-trip
  * form), so the SQL equivalent is the decimal cast chain. The JSON
  * encode/decode inverse itself is proven in PipelineSpec property tests.
  */
object Pipeline {

  def q29PipelineRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = customer(s, dir).select(
      col("c_custkey").cast("int").as("id"),
      col("c_name").as("nombre"),
      upper(col("c_mktsegment")).as("apellido"),
      concat(col("c_name"), lit(" Calle 123")).as("direccion"),
      lpad(col("c_custkey").cast("string"), 10, "0").as("telefono"),
      col("c_acctbal").cast(DecimalType(10, 2)).as("caja_ahorro_pesos"),
      // stays at 2dp: Spark casts double→decimal via the double's shortest
      // string repr while DuckDB rounds differently at 3dp near-ties, so
      // the oracle-checked path only exercises exactly-representable 2dp
      // values; the >2dp HALF_UP re-round is pinned by PipelineSpec.
      (col("c_acctbal") + 0.25).cast(DecimalType(10, 2)).as("caja_ahorro_dolares"))
    CustomerPipeline.roundTrip(src)
      .select(col("id"), col("nombre"), col("apellido"), col("direccion"), col("telefono"),
        col("caja_ahorro_pesos").cast("double").as("caja_ahorro_pesos"),
        col("caja_ahorro_dolares").cast("double").as("caja_ahorro_dolares"))
      .orderBy(col("id"))
  }

  val q29Sql: String =
    """SELECT CAST(c_custkey AS INTEGER) AS id, c_name AS nombre,
      | upper(c_mktsegment) AS apellido,
      | c_name || ' Calle 123' AS direccion,
      | lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS telefono,
      | CAST(CAST(c_acctbal AS DECIMAL(10,2)) AS DOUBLE) AS caja_ahorro_pesos,
      | CAST(CAST(c_acctbal + 0.25 AS DECIMAL(10,2)) AS DOUBLE) AS caja_ahorro_dolares
      |FROM customer ORDER BY id""".stripMargin
}
