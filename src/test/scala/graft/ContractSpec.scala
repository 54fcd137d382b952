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

  test("oracle SQL never carries the driver-breaking control characters unescaped") {
    // Verify.q escapes these; this guards against an oracle so exotic the
    // escape layer would need extending (e.g. unicode line separators)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.exists(c => c == ' ' || c == ' '),
        s"$name: unicode line separator in oracle SQL")
    }
  }
}
