package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Thin connector adapters for the reference pipeline's three external
  * systems (MySQL via JDBC, Kafka, object storage). Interface-complete
  * per SURVEY.md §7 step 2: the sandbox has neither a broker nor a
  * database (and no spark-sql-kafka connector jar), so these are exercised
  * through the pure frame-shape functions in [[CustomerPipeline]] plus
  * MemoryStream tests; on a real cluster they are the production path.
  *
  * Scale deltas vs the reference, by design:
  *   - JDBC reads are range-partitioned (the reference fetchall()s the
  *     whole table into one process, dags/etl_dags.py:14).
  *   - JDBC writes are batched per partition (the reference commits per
  *     row, dags/etl_dags.py:47-49).
  *   - The consumer drains with Trigger.AvailableNow and checkpoints
  *     (the reference's consumer loop never terminates and replays raise
  *     duplicate-key errors, dags/etl_dags.py:46-49).
  */
object JdbcIO {

  /** Parallel range-partitioned scan (replaces SELECT * + fetchall).
    * Bounds are explicit — no guessed defaults: wrong bounds silently pile
    * all out-of-range rows into the first/last partition, defeating the
    * parallel scan this adapter exists for. Use the bound-free overload to
    * derive them from the table itself.
    */
  def read(spark: SparkSession, url: String, table: String,
           partitionColumn: String, numPartitions: Int,
           lowerBound: Long, upperBound: Long): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("numPartitions", numPartitions)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .load()

  /** Range-partitioned scan with bounds derived from
    * `SELECT min/max(partitionColumn)` — one cheap single-partition probe
    * (index-backed on a PK) before the parallel read, so partitions match
    * the table's actual key range. Falls back to an unpartitioned read for
    * an empty table.
    */
  def read(spark: SparkSession, url: String, table: String,
           partitionColumn: String = "id", numPartitions: Int = 32): DataFrame = {
    // Resolve the TABLE's stored name first and quote it via the url's
    // JdbcDialect, so a keyword-ish name ("order") can't break or inject
    // into the probe SQL below — previously the partition column was
    // dialect-quoted but the table was interpolated raw. Then resolve the
    // column's STORED case from the table schema (a metadata-only
    // SELECT ... WHERE 1=0 round trip): case-folding databases
    // (Derby/Oracle/DB2) store unquoted DDL columns uppercase, so quoting
    // the caller's spelling verbatim would name a column that doesn't
    // exist. Exact match wins over case-insensitive (a quoted-DDL table
    // can legally hold both "ID" and "id"). Bounds are read POSITIONALLY —
    // alias-uppercasing drivers return column "LO" for `AS lo`, so a
    // name-keyed getAs would throw (pinned by the Derby round-trip test).
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    val qtable = resolveTableRef(url, table, dialect)
    val unpartitioned = spark.read.format("jdbc")
      .option("url", url).option("dbtable", qtable).load()
    val names = unpartitioned.schema.fieldNames
    val resolved = names.find(_ == partitionColumn)
      .orElse(names.find(_.equalsIgnoreCase(partitionColumn)))
      .getOrElse(partitionColumn)
    val qcol = dialect.quoteIdentifier(resolved)
    val probe = spark.read.format("jdbc")
      .option("url", url)
      .option("query", s"SELECT MIN($qcol) AS lo, MAX($qcol) AS hi FROM $qtable")
      .load()
      .collect()(0)
    if (probe.isNullAt(0))
      unpartitioned // empty table: reuse the already-built relation
    else
      read(spark, url, qtable, resolved, numPartitions,
        probe.get(0).asInstanceOf[Number].longValue(),
        probe.get(1).asInstanceOf[Number].longValue())
  }

  /** Resolve a PLAIN-identifier table name to its stored spelling via JDBC
    * metadata (same case-folding problem as columns: unquoted DDL stores
    * uppercase on Derby/Oracle/DB2) and dialect-quote the result. Anything
    * that is not a plain identifier — already-quoted names,
    * schema-qualified `s.t`, `(subquery)` — passes through VERBATIM under
    * the standard Spark `dbtable` contract: the caller supplies a valid
    * SQL table reference and owns its quoting. Lookup failures (no
    * metadata permission, driverless url) also fall back to verbatim, so
    * this never makes a previously-working name stop resolving.
    */
  private def resolveTableRef(url: String, table: String,
      dialect: org.apache.spark.sql.jdbc.JdbcDialect): String = {
    if (!table.matches("[A-Za-z_][A-Za-z0-9_]*")) table
    else try {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        // Scope the lookup to the connection's CURRENT schema: an unqualified
        // name resolves there, so matching across all schemas could adopt a
        // different schema's stored spelling and quote a name that does not
        // exist where the query will actually look. A null/unsupported
        // current schema falls back to the unscoped listing (better a rare
        // cross-schema shadow than no resolution at all).
        val schema = try conn.getSchema catch { case _: Throwable => null }
        val rs = conn.getMetaData.getTables(null, schema, "%", Array("TABLE"))
        val names = scala.collection.mutable.ListBuffer.empty[String]
        while (rs.next()) names += rs.getString("TABLE_NAME")
        names.find(_ == table)
          .orElse(names.find(_.equalsIgnoreCase(table)))
          .map(dialect.quoteIdentifier)
          .getOrElse(table)
      } finally conn.close()
    } catch { case _: java.sql.SQLException => table }
  }

  /** Batched append (replaces per-row INSERT+commit). */
  def append(df: DataFrame, url: String, table: String, batchSize: Int = 10000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .mode("append")
      .save()
}

object KafkaIO {

  /** Batch read of a topic's full retained range. */
  def readBatch(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()

  /** Streaming read; `minPartitions` decouples Spark parallelism from the
    * topic's partition count (the reference runs 1 broker / default
    * partitions, docker-compose.yml:21-26).
    */
  def readStream(spark: SparkSession, bootstrap: String, topic: String,
                 minPartitions: Int = 32): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("minPartitions", minPartitions)
      .load()

  /** Batch produce of a (key, value) frame (K1 shape from
    * [[CustomerPipeline.toKafkaFrame]]).
    */
  def writeBatch(kafkaFrame: DataFrame, bootstrap: String, topic: String): Unit =
    kafkaFrame.write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()

  /** Drain-then-stop streaming writer: AvailableNow + checkpoint gives
    * "process the backlog exactly once, then exit" — the semantics the
    * reference's daily batch DAG wanted from its never-terminating
    * consumer (E2, SURVEY.md §3).
    */
  def drainTo(kafkaFrame: DataFrame, checkpoint: String)(
      batchFn: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    kafkaFrame.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, id: Long) => batchFn(df, id) }
}
