package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame

/** JDBC sink seams for database-backed deployments (S3/S5/S7/S8).
  *
  * The reference pushes month-delete and dimension-upsert out-of-band to
  * Postgres because Spark's JDBC sink can only append/overwrite
  * (transform_operator.py:16-31 "Spark JDBC doesn't support deletes";
  * model_curated.py:72-101 `ON CONFLICT` merges). These helpers keep that
  * split explicit: plan-level code stays pure DataFrame; the two
  * statements that must run inside the database are tiny driver-side
  * JDBC calls. (File/lakehouse deployments use [[Idempotent]]/[[Upsert]]
  * instead — same semantics, no out-of-band step.)
  *
  * Dialect envelope (what the tests actually prove): `JdbcSpec` EXECUTES
  * every helper against an embedded DuckDB, which shares the Postgres
  * syntax this module emits — `DELETE ... WHERE`, subquery `dbtable`
  * scans, and `INSERT ... ON CONFLICT (pk) DO UPDATE SET c =
  * EXCLUDED.c / DO NOTHING`. The reference's actual target is
  * Postgres 15 (model_curated.py:72-101; transform_operator.py:41-52),
  * and two behaviors sit OUTSIDE the tested envelope because no Postgres
  * server exists in this environment:
  *
  *  - multi-row `EXCLUDED.*` resolution when one statement carries
  *    several rows for the same key (Postgres raises
  *    `cardinality_violation`; DuckDB's semantics differ) — the
  *    load-table pattern used here avoids it only if the load table is
  *    unique per pk, which [[graft.ops.DedupeAgg]] upstream guarantees;
  *  - transaction/locking behavior under CONCURRENT writers (Postgres
  *    takes per-key locks inside `ON CONFLICT`; DuckDB is
  *    single-writer).
  *
  * Deployments pointing at real Postgres should gate on a smoke run of
  * these helpers; the statement text itself mirrors the reference SQL
  * 1:1.
  */
object Jdbc {

  /** S3 — month-slice JDBC scan with the filter pushed into the database
    * via a `dbtable` subquery, exactly like the reference's
    * `(SELECT ... WHERE yyyymm = n) x` pattern (transform_lease.py:52-59).
    * (Catalyst would also push a `.where` down; the subquery form keeps
    * server-side casts like `raw::text` expressible.)
    */
  def readMonthSlice(spark: org.apache.spark.sql.SparkSession, url: String,
                     table: String, cols: String, yyyymm: Int,
                     props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, s"(SELECT $cols FROM $table WHERE yyyymm = $yyyymm) x", props)

  /** S7 — idempotent month delete before an append
    * (transform_operator.py:16-31).
    */
  def deleteMonthSlice(url: String, table: String, yyyymm: Int): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.prepareStatement(s"DELETE FROM $table WHERE yyyymm = ?")
      try { st.setInt(1, yyyymm); st.executeUpdate() } finally st.close()
    } finally conn.close()
  }

  /** S7+S5 — delete-then-append month slice to a JDBC table: the
    * reference's idempotent write, as one call.
    */
  def writeMonthSlice(df: DataFrame, url: String, table: String, yyyymm: Int,
                      props: java.util.Properties = new java.util.Properties): Unit = {
    deleteMonthSlice(url, table, yyyymm)
    df.write.mode("append").jdbc(url, table, props)
  }

  /** S8 — SCD1 upsert from a load table (model_curated.py:72-101):
    * `INSERT ... SELECT ... ON CONFLICT (pk) DO UPDATE SET` (or
    * `DO NOTHING` when `updateOnConflict` is false).
    */
  def upsertFromLoadTable(url: String, target: String, load: String,
                          cols: Seq[String], pk: Seq[String],
                          updateOnConflict: Boolean = true): Unit = {
    val colList = cols.mkString(", ")
    val action =
      if (updateOnConflict) {
        val sets = cols.filterNot(pk.contains)
          .map(c => s"$c = EXCLUDED.$c").mkString(", ")
        s"DO UPDATE SET $sets"
      } else "DO NOTHING"
    val sql =
      s"""INSERT INTO $target ($colList)
         |SELECT $colList FROM $load
         |ON CONFLICT (${pk.mkString(", ")}) $action""".stripMargin
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(sql) finally st.close()
    } finally conn.close()
  }
}
