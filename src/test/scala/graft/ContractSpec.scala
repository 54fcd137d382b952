package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every query has an oracle and vice versa
  * (a query without an oracle silently downgrades to a rows-only check
  * in the driver's correctness gate), and names stay within the simple
  * identifier set the dump/compare pipeline assumes.
  */
class ContractSpec extends AnyFunSuite {

  // the IVF oracle embeds trained centroids, which need a data dir and a
  // session (graft.Verify sets the property in the driver flow)
  sys.props("graft.oracle.sfDir") = "/root/testdata/sf0.001"
  SparkTestSession.spark

  test("queries and oracleSql cover exactly the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // a query may opt OUT of the SQL oracle only by declaring itself
    // rows-only — forgetting the oracle entry must still fail here
    assert((q -- o -- SparkEntry.rowsOnlyQueries).isEmpty,
      s"queries missing an oracle: ${(q -- o -- SparkEntry.rowsOnlyQueries).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    // the declaration list itself must not rot
    assert((SparkEntry.rowsOnlyQueries -- q).isEmpty,
      s"rows-only declarations without a query: ${(SparkEntry.rowsOnlyQueries -- q).toSeq.sorted}")
    assert((SparkEntry.rowsOnlyQueries & o).isEmpty,
      s"rows-only queries that DO have an oracle: ${(SparkEntry.rowsOnlyQueries & o).toSeq.sorted}")
  }

  test("query names are filesystem/JSON-safe identifiers") {
    SparkEntry.queries.keys.foreach { n =>
      assert(n.matches("[a-z0-9_]+"), s"unsafe query name: '$n'")
    }
  }

  test("no contract query emits a wide decimal in its final schema") {
    // decimal(38,x) result columns canonicalize differently between the
    // driver's DuckDB-native and Spark-parquet hash paths (the r6
    // ks_price_drift / table_fingerprint_orders mismatches). Wide
    // decimals may be used INTERNALLY for exact arithmetic, but the
    // published schema must land on engine-stable types (BIGINT,
    // bounded decimal, double). Only schemas are asserted, but BUILDING
    // a query is not free of side effects: the roundtrip builders
    // (dsv/orc) eagerly write-and-read their fixture under /tmp.
    import org.apache.spark.sql.types.DecimalType
    val dir = "/root/testdata/sf0.001"
    def isWide(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case d: DecimalType => d.precision > 18
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        build(SparkTestSession.spark, dir).schema.fields
          .filter(f => isWide(f.dataType))
          .map(f => s"$name.${f.name}: ${f.dataType.simpleString}")
    }
    assert(offenders.isEmpty,
      s"wide decimal in contract schema (driver-hash trap): $offenders")
  }

  test("oracle SQL never carries the driver-breaking control characters unescaped") {
    // Verify.q escapes these; this guards against an oracle so exotic the
    // escape layer would need extending (e.g. unicode line separators)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.exists(c => c == ' ' || c == ' '),
        s"$name: unicode line separator in oracle SQL")
    }
  }
}
