package graft

import java.nio.file.Files
import java.sql.DriverManager
import java.util.Properties

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{Ddl, Jdbc}

/** JDBC sink integration (S3/S5/S7/S8/S9/X1) against an EMBEDDED database
  * (DuckDB via JDBC — speaks `ON CONFLICT` like the Postgres the
  * reference targets), so the statements execute for real instead of
  * only mirroring the reference SQL textually.
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // file-backed DB: Spark's JDBC writer and the helper statements open
  // separate connections, which must see one shared database
  private lazy val url = {
    Class.forName("org.duckdb.DuckDBDriver")
    s"jdbc:duckdb:${Files.createTempDirectory("jdbc").resolve("t.db")}"
  }
  // Anchor connection held for the whole suite: the embedded driver
  // shares one database instance per path while any connection is open;
  // without it, an instance shutdown (checkpoint) can race the next
  // test's fresh open and the new instance misses just-written tables.
  private lazy val anchor = DriverManager.getConnection(url)
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.duckdb.DuckDBDriver")
    p
  }

  private def query1(sql: String): Seq[(Int, String)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val buf = scala.collection.mutable.Buffer[(Int, String)]()
      while (rs.next()) buf += ((rs.getInt(1), rs.getString(2)))
      buf.toSeq
    } finally conn.close()
  }
  private def exec(sqls: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try sqls.foreach(conn.createStatement().execute) finally conn.close()
  }

  test("X1: liveness probe answers true on a live DB, false on a dead URL") {
    anchor // open the suite-lifetime connection first
    assert(Ddl.probe(url))
    assert(!Ddl.probe("jdbc:duckdb:/nonexistent/dir/x.db"))
  }

  test("S9: ensureSchema/ensureTable/ensureTableFor are idempotent DDL") {
    Ddl.ensureSchema(url, "staging")
    Ddl.ensureSchema(url, "staging") // second call: no-op, no throw
    Ddl.ensureTable(url, "staging.load_op", "operator_no INTEGER, operator_name TEXT")
    Ddl.ensureTable(url, "staging.load_op", "operator_no INTEGER, operator_name TEXT")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("v", StringType),
      StructField("amt", DecimalType(18, 2)), StructField("n", LongType)))
    Ddl.ensureTableFor(url, "typed_t", schema, pk = Seq("k"))
    Ddl.ensureTableFor(url, "typed_t", schema, pk = Seq("k"))
    exec("INSERT INTO staging.load_op VALUES (1, 'ACME')",
      "INSERT INTO typed_t VALUES (1, 'a', 10.50, 7)")
    assert(query1("SELECT operator_no, operator_name FROM staging.load_op") ===
      Seq((1, "ACME")))
  }

  test("S7+S5: writeMonthSlice is delete-then-append — re-running a month never double-counts") {
    import spark.implicits._
    Ddl.ensureTable(url, "fact_m", "k INTEGER, v TEXT, yyyymm INTEGER")
    val jan = Seq((1, "a", 202401), (2, "b", 202401)).toDF("k", "v", "yyyymm")
    val feb = Seq((3, "c", 202402)).toDF("k", "v", "yyyymm")
    Jdbc.writeMonthSlice(jan.coalesce(1), url, "fact_m", 202401, props)
    Jdbc.writeMonthSlice(feb.coalesce(1), url, "fact_m", 202402, props)
    // re-run January: the delete wipes exactly that slice first
    Jdbc.writeMonthSlice(jan.coalesce(1), url, "fact_m", 202401, props)
    val rows = query1("SELECT k, v FROM fact_m ORDER BY k")
    assert(rows === Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("S3: readMonthSlice pushes the month filter into the dbtable subquery") {
    val df = Jdbc.readMonthSlice(spark, url, "fact_m", "k, v, yyyymm", 202401, props)
    assert(df.columns.toSeq === Seq("k", "v", "yyyymm"))
    // the dialect may surface DuckDB INTEGER as int or long — compare as Int
    val got = df.orderBy("k").collect()
      .map(r => (r.getAs[Number]("k").intValue, r.getString(1))).toSeq
    assert(got === Seq((1, "a"), (2, "b")))
  }

  test("S8: upsertFromLoadTable — ON CONFLICT DO UPDATE vs DO NOTHING, executed") {
    exec(
      "CREATE TABLE dim_op (operator_no INTEGER PRIMARY KEY, operator_name TEXT)",
      "CREATE TABLE load_op (operator_no INTEGER, operator_name TEXT)",
      "INSERT INTO dim_op VALUES (1, 'OLD NAME'), (2, 'KEEP')",
      "INSERT INTO load_op VALUES (1, 'NEW NAME'), (3, 'FRESH')")
    Jdbc.upsertFromLoadTable(url, "dim_op", "load_op",
      cols = Seq("operator_no", "operator_name"), pk = Seq("operator_no"))
    assert(query1("SELECT operator_no, operator_name FROM dim_op ORDER BY 1") ===
      Seq((1, "NEW NAME"), (2, "KEEP"), (3, "FRESH")))

    // DO NOTHING: conflicting row does not overwrite
    exec("DELETE FROM load_op",
      "INSERT INTO load_op VALUES (2, 'SHOULD NOT WIN'), (4, 'NEW')")
    Jdbc.upsertFromLoadTable(url, "dim_op", "load_op",
      cols = Seq("operator_no", "operator_name"), pk = Seq("operator_no"),
      updateOnConflict = false)
    assert(query1("SELECT operator_no, operator_name FROM dim_op ORDER BY 1") ===
      Seq((1, "NEW NAME"), (2, "KEEP"), (3, "FRESH"), (4, "NEW")))
  }

  test("catalog twin: ensureManagedTable is idempotent") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", IntegerType), StructField("v", StringType)))
    Ddl.ensureManagedTable(spark, "graft_ddl_probe", schema)
    Ddl.ensureManagedTable(spark, "graft_ddl_probe", schema)
    assert(spark.catalog.tableExists("graft_ddl_probe"))
    assert(spark.table("graft_ddl_probe").schema.fieldNames.toSeq === Seq("k", "v"))
    spark.sql("DROP TABLE graft_ddl_probe")
  }
}
