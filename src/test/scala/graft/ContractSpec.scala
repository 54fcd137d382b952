package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every query has an oracle and vice versa
  * (a query without an oracle silently downgrades to a rows-only check
  * in the driver's correctness gate), and names stay within the simple
  * identifier set the dump/compare pipeline assumes.
  */
class ContractSpec extends AnyFunSuite {

  test("queries and oracleSql cover exactly the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
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
