package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** DDL-ensure and liveness helpers (S9 + X1).
  *
  * The reference creates its schemas and load tables if absent before
  * every run (model_curated.py:30-57 `CREATE SCHEMA/TABLE IF NOT EXISTS`)
  * and gates the DAG on a `SELECT 1` connectivity probe
  * (dags/pdq_etl_dag.py:72-78). Both come in two forms here:
  * the JDBC string form for database sinks, and a Spark-catalog twin for
  * lakehouse deployments where "table" means a managed/external table.
  */
object Ddl {

  /** X1 — liveness probe: `SELECT 1` round-trip. True iff the database
    * answered; any connect/execute failure is just `false` (the caller
    * gates, it doesn't need the stack).
    */
  def probe(url: String): Boolean =
    try {
      val conn = DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery("SELECT 1")
          rs.next() && rs.getInt(1) == 1
        } finally st.close()
      } finally conn.close()
    } catch { case _: Exception => false }

  /** S9 — `CREATE SCHEMA IF NOT EXISTS`. */
  def ensureSchema(url: String, schema: String): Unit =
    execute(url, s"CREATE SCHEMA IF NOT EXISTS $schema")

  /** S9 — `CREATE TABLE IF NOT EXISTS table (columnsDdl)`, e.g.
    * `ensureTable(url, "staging.load_op", "operator_no INTEGER, operator_name TEXT")`.
    */
  def ensureTable(url: String, table: String, columnsDdl: String): Unit =
    execute(url, s"CREATE TABLE IF NOT EXISTS $table ($columnsDdl)")

  /** S9 — ensure a table shaped like a Spark schema, deriving the column
    * DDL from the StructType (so the JDBC target always matches what the
    * frame will append). `pk` adds a PRIMARY KEY clause — required for
    * [[Jdbc.upsertFromLoadTable]]'s ON CONFLICT target.
    */
  def ensureTableFor(url: String, table: String, schema: StructType,
                     pk: Seq[String] = Nil): Unit = {
    val cols = schema.fields.map(f => s"${f.name} ${sqlType(f.dataType)}")
    val pkClause = if (pk.nonEmpty) s", PRIMARY KEY (${pk.mkString(", ")})" else ""
    ensureTable(url, table, cols.mkString(", ") + pkClause)
  }

  /** Portable ANSI-ish DDL types for the column set this pipeline uses. */
  private[sinks] def sqlType(dt: DataType): String = dt match {
    case StringType => "TEXT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE PRECISION"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case _: TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other =>
      throw new IllegalArgumentException(s"no JDBC DDL mapping for $other")
  }

  /** Catalog twin of [[ensureTable]] for lakehouse deployments: managed
    * parquet table, created only if absent (idempotent like the JDBC
    * form).
    */
  def ensureManagedTable(spark: SparkSession, name: String,
                         schema: StructType): Unit =
    if (!spark.catalog.tableExists(name)) {
      spark.sql(s"CREATE TABLE IF NOT EXISTS $name (${schema.toDDL}) USING parquet")
    }

  private def execute(url: String, sql: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(sql) finally st.close()
    } finally conn.close()
  }
}
