package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.CustomerPipeline

/** File-source coverage (SURVEY.md §2.1 S5): CSV and JSON round-trips
  * with explicit schemas (schema inference is a scale anti-pattern — it
  * costs an extra full scan — so the engine always supplies schemas).
  */
class SourcesSpec extends SparkTestBase {

  private lazy val customers = CustomerPipeline.generate(spark, 200, partitions = 4)

  test("CSV round-trip with explicit schema preserves every row") {
    val dir = Files.createTempDirectory("graft_csv").toString
    customers.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(CustomerPipeline.CustomerSchema)
      .option("header", "true").csv(dir)
    assert(back.orderBy("id").collect().toSeq === customers.orderBy("id").collect().toSeq)
  }

  test("JSON-lines round-trip with explicit schema preserves every row") {
    val dir = Files.createTempDirectory("graft_json").toString
    CustomerPipeline.exportJsonLines(customers, dir)
    val back = spark.read.schema(CustomerPipeline.CustomerSchema).json(dir)
    assert(back.orderBy("id").collect().toSeq === customers.orderBy("id").collect().toSeq)
  }

  test("JdbcIO: embedded-Derby round-trip — batched append, bound probe, partitioned read") {
    // Derby ships in /opt/spark/jars, so the JDBC read/append adapters run
    // for REAL here (they were interface-only through round 4). Derby also
    // uppercases result aliases (`AS lo` → column "LO"), which is exactly
    // the dialect quirk the positional bound-probe read exists for.
    val db = Files.createTempDirectory("graft_derby").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"name$i", i * 1.5))
      .toDF("id", "nombre", "saldo")
    graft.pipeline.JdbcIO.append(df, url, "clientes", batchSize = 16)
    val back = graft.pipeline.JdbcIO.read(spark, url, "clientes", "id", numPartitions = 4)
    // bounds from the probe really partition the scan
    assert(back.rdd.getNumPartitions === 4)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
    // append is append, not overwrite
    graft.pipeline.JdbcIO.append(df.limit(10), url, "clientes")
    assert(graft.pipeline.JdbcIO.read(spark, url, "clientes", "id").count() === 110)
    // empty table → NULL bound probe → unpartitioned fallback, no throw
    graft.pipeline.JdbcIO.append(df.limit(0), url, "vacia")
    assert(graft.pipeline.JdbcIO.read(spark, url, "vacia", "id").count() === 0)
  }

  test("ORC round-trip preserves rows and pushes filters to the scan") {
    // Second columnar format next to parquet: same declarative scan path,
    // so Catalyst pushdown and column pruning must work identically.
    val dir = Files.createTempDirectory("graft_orc").toString
    customers.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(CustomerPipeline.CustomerSchema).orc(dir)
    assert(back.orderBy("id").collect().toSeq === customers.orderBy("id").collect().toSeq)
    val filtered = back.filter(col("id") <= 50).select(col("id"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), LessThanOrEqual(id,50)]"),
      s"id predicate did not reach the ORC scan:\n$plan")
    assert(filtered.count() === 50)
  }

  test("JdbcIO: keyword-named table resolves through the bound probe (dialect-quoted)") {
    // "order" is an SQL reserved word: interpolating it raw into the probe
    // (`FROM order`) is a syntax error. The adapter must resolve the STORED
    // name from JDBC metadata and dialect-quote it in every statement —
    // including the dbtable relation and the min/max bound probe.
    val db = Files.createTempDirectory("graft_derby_kw").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    import spark.implicits._
    val df = (1 to 40).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    // DDL needs the caller-quoted form (Spark passes dbtable verbatim into
    // CREATE TABLE); the READ below must work from the bare name alone
    graft.pipeline.JdbcIO.append(df, url, "\"order\"")
    val back = graft.pipeline.JdbcIO.read(spark, url, "order", "id", numPartitions = 4)
    assert(back.rdd.getNumPartitions === 4, "bound probe did not partition the scan")
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("JdbcIO: name resolution is scoped to the current schema, not shadowed cross-schema") {
    // Another schema holds a quoted-DDL (lowercase) table of the same
    // name; the unqualified read must resolve the CURRENT schema's
    // case-folded table, not adopt the other schema's stored spelling
    // (which would dialect-quote to a name that doesn't resolve here).
    val db = Files.createTempDirectory("graft_derby_sch").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    import spark.implicits._
    val mine = (1 to 20).map(i => (i.toLong, "app")).toDF("id", "who")
    val theirs = (1 to 5).map(i => (i.toLong, "other")).toDF("id", "who")
    graft.pipeline.JdbcIO.append(mine, url, "shadowed") // APP.SHADOWED (case-folded)
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute("CREATE SCHEMA elsewhere")
    finally conn.close()
    graft.pipeline.JdbcIO.append(theirs, url, "elsewhere.\"shadowed\"")
    val back = graft.pipeline.JdbcIO.read(spark, url, "shadowed", "id", numPartitions = 2)
    assert(back.count() === 20, "resolved the wrong schema's table")
    assert(back.select("who").distinct().collect().map(_.getString(0)).toSeq === Seq("app"))
  }

  test("JSON read surfaces corrupt records instead of dropping them silently") {
    val dir = Files.createTempDirectory("graft_badjson").toString
    import spark.implicits._
    Seq("""{"id": 1, "nombre": "ok"}""", """{"id": oops not json""")
      .toDS().write.mode("overwrite").text(dir)
    val schema = "id INT, nombre STRING, _corrupt_record STRING"
    val read = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    assert(read.count() === 2)
    assert(read.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(read.filter(col("id") === 1 && col("nombre") === "ok").count() === 1)
  }
}
