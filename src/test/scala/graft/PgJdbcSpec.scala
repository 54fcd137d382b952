package graft

import java.sql.{Connection, DriverManager}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.util.Try
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Jdbc

/** Executes the two behaviors `sinks/Jdbc.scala` documents as OUTSIDE the
  * embedded-DuckDB test envelope, against a real Postgres:
  *
  *  1. multi-row `EXCLUDED.*` resolution — one `INSERT ... ON CONFLICT DO
  *     UPDATE` statement carrying two rows for the same key must raise
  *     `cardinality_violation` (SQLSTATE 21000);
  *  2. concurrent upsert writers on the same key — Postgres takes per-key
  *     locks inside `ON CONFLICT`, so both writers succeed and exactly
  *     one row remains.
  *
  * GATED: runs only when `GRAFT_PG_URL` points at a reachable Postgres
  * (e.g. `jdbc:postgresql://localhost:5432/postgres?user=postgres&
  * password=pg` from `docker run -e POSTGRES_PASSWORD=pg -p 5432:5432
  * postgres:15`) AND the Postgres JDBC driver is on the test classpath.
  * Otherwise every test cancels via `assume` and the suite stays green —
  * this environment has neither network egress nor the driver jar, so in
  * CI here the suite reports all-canceled, by design.
  */
class PgJdbcSpec extends AnyFunSuite {

  private val urlOpt: Option[String] = sys.env.get("GRAFT_PG_URL")

  private def connect(): Option[Connection] = urlOpt.flatMap { url =>
    Try {
      Class.forName("org.postgresql.Driver")
      val c = DriverManager.getConnection(url)
      c.setAutoCommit(true)
      c
    }.toOption
  }

  /** Cancel (not fail) unless a live Postgres answers. */
  private def withPg(body: Connection => Unit): Unit = {
    assume(urlOpt.isDefined, "GRAFT_PG_URL not set — skipping Postgres envelope test")
    val conn = connect()
    assume(conn.isDefined, s"no Postgres reachable at ${urlOpt.get} (or driver missing)")
    val c = conn.get
    try body(c) finally c.close()
  }

  private def exec(c: Connection, sql: String): Unit = {
    val st = c.createStatement(); try st.execute(sql) finally st.close()
  }

  test("multi-hit ON CONFLICT DO UPDATE raises cardinality_violation (21000)") {
    withPg { c =>
      exec(c, "DROP TABLE IF EXISTS graft_pg_t, graft_pg_load")
      exec(c, "CREATE TABLE graft_pg_t (pk INT PRIMARY KEY, v TEXT)")
      exec(c, "CREATE TABLE graft_pg_load (pk INT, v TEXT)")
      // two rows for pk=1 in ONE statement: the documented out-of-envelope
      // case (DuckDB last-write-wins; Postgres must raise)
      exec(c, "INSERT INTO graft_pg_load VALUES (1, 'a'), (1, 'b')")
      val ex = intercept[java.sql.SQLException] {
        Jdbc.upsertFromLoadTable(urlOpt.get, "graft_pg_t", "graft_pg_load",
          cols = Seq("pk", "v"), pk = Seq("pk"))
      }
      assert(ex.getSQLState === "21000", s"expected cardinality_violation, got ${ex.getSQLState}: ${ex.getMessage}")
      // and the guarded pattern (deduped load table, as DedupeAgg
      // guarantees upstream) succeeds on the same target
      exec(c, "DELETE FROM graft_pg_load WHERE v = 'b'")
      Jdbc.upsertFromLoadTable(urlOpt.get, "graft_pg_t", "graft_pg_load",
        cols = Seq("pk", "v"), pk = Seq("pk"))
      val rs = c.createStatement().executeQuery("SELECT v FROM graft_pg_t WHERE pk = 1")
      assert(rs.next() && rs.getString(1) === "a")
    }
  }

  test("concurrent upsert writers on one key: per-key locks, one row survives") {
    withPg { c =>
      exec(c, "DROP TABLE IF EXISTS graft_pg_c, graft_pg_l1, graft_pg_l2")
      exec(c, "CREATE TABLE graft_pg_c (pk INT PRIMARY KEY, v TEXT)")
      exec(c, "CREATE TABLE graft_pg_l1 (pk INT, v TEXT)")
      exec(c, "CREATE TABLE graft_pg_l2 (pk INT, v TEXT)")
      exec(c, "INSERT INTO graft_pg_l1 SELECT g, 'w1' FROM generate_series(1, 500) g")
      exec(c, "INSERT INTO graft_pg_l2 SELECT g, 'w2' FROM generate_series(1, 500) g")

      val pool = Executors.newFixedThreadPool(2)
      val start = new CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      Seq("graft_pg_l1", "graft_pg_l2").foreach { load =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try Jdbc.upsertFromLoadTable(urlOpt.get, "graft_pg_c", load,
              cols = Seq("pk", "v"), pk = Seq("pk"))
            catch { case t: Throwable => errs.add(t) }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      assert(errs.isEmpty, s"concurrent upserts must both succeed: ${errs.peek()}")

      val rs = c.createStatement().executeQuery(
        "SELECT count(*), count(DISTINCT pk), count(DISTINCT v) FROM graft_pg_c")
      assert(rs.next())
      assert(rs.getLong(1) === 500L, "exactly one row per key")
      assert(rs.getLong(2) === 500L)
      // every row carries a winner value; per-row winner may vary but the
      // table must be internally consistent (no torn/duplicate keys)
      assert(rs.getLong(3) >= 1L && rs.getLong(3) <= 2L)
    }
  }

  test("month-slice delete+append round trip on Postgres") {
    withPg { c =>
      exec(c, "DROP TABLE IF EXISTS graft_pg_m")
      exec(c, "CREATE TABLE graft_pg_m (yyyymm INT, v TEXT)")
      exec(c, "INSERT INTO graft_pg_m VALUES (202401, 'old'), (202402, 'keep')")
      Jdbc.deleteMonthSlice(urlOpt.get, "graft_pg_m", 202401)
      val rs = c.createStatement().executeQuery(
        "SELECT count(*) FILTER (WHERE yyyymm = 202401), count(*) FILTER (WHERE yyyymm = 202402) FROM graft_pg_m")
      assert(rs.next() && rs.getLong(1) === 0L && rs.getLong(2) === 1L,
        "delete is slice-scoped: other months untouched")
    }
  }
}
