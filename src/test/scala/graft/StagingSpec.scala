package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pdq.{Curated, Staging}

/** Raw → staging → curated semantics on reference-shaped fixtures
  * (FIXTURES.md §A) — JSON raw docs, volume-name variants, duplicate PK
  * groups, dedupe-agg invariants.
  */
class StagingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def opRaw(yyyymm: Int, json: String) = (yyyymm, json)

  test("operatorMonthly: strict cast, zero-fill, yyyymm preference") {
    val raw = Seq(
      opRaw(202401,
        """{"OPERATOR_NO":"123456","OPERATOR_NAME":"ACME OPERATING CO","CYCLE_YEAR":"2024","CYCLE_MONTH":"01","OPER_OIL_PROD_VOL":"1500.25","OPER_GAS_PROD_VOL":"32000","OPER_COND_PROD_VOL":"0","OPER_CSGD_PROD_VOL":"12.5"}"""),
      // null operator → 0 (P9); blank oil → 0.0 (P7); junk gas → null
      opRaw(202401,
        """{"OPERATOR_NAME":"NO KEY CO","CYCLE_YEAR":"2024","CYCLE_MONTH":"01","OPER_OIL_PROD_VOL":"","OPER_GAS_PROD_VOL":"junk"}"""),
      // negative operator rejected by strict cast → 0; month from cycle cols
      opRaw(202401,
        """{"OPERATOR_NO":"-7","OPERATOR_NAME":"NEG CO","CYCLE_YEAR":"2024","CYCLE_MONTH":"1"}""")
    ).toDF("yyyymm", "raw")
    val out = Staging.operatorMonthly(raw, month = Some(202401))
      .orderBy("operator_name").collect()
    assert(out.length === 3)
    val acme = out(0)
    assert(acme.getInt(0) === 123456 && acme.getString(1) === "ACME OPERATING CO")
    assert(acme.getInt(2) === 202401 && acme.getDouble(3) === 1500.25)
    val neg = out(1)
    assert(neg.getInt(0) === 0) // "-7" fails isdigit-style strict cast
    val noKey = out(2)
    assert(noKey.getInt(0) === 0 && noKey.getDouble(3) === 0.0 && noKey.isNullAt(4))
  }

  test("leaseWide + leaseMonthly: variant coalesce, lease_key, dedupe-agg") {
    val raw = Seq(
      // duplicate (08-11111, 202401) rows with LEASE_* variant names
      opRaw(202401,
        """{"OPERATOR_NO":"123456","DISTRICT_NO":"08","FIELD_NO":"54321","LEASE_NO":"11111","LEASE_NAME":"SMITH UNIT","CYCLE_YEAR":"2024","CYCLE_MONTH":"01","LEASE_OIL_PROD_VOL":"750.10","LEASE_GAS_PROD_VOL":"16000"}"""),
      opRaw(202401,
        """{"OPERATOR_NO":"123456","DISTRICT_NO":"08","FIELD_NO":"54321","LEASE_NO":"11111","LEASE_NAME":"SMITH UNIT","CYCLE_YEAR":"2024","CYCLE_MONTH":"01","OIL_PROD_VOL":"750.15","GAS_PROD_VOL":"16000"}"""),
      opRaw(202401,
        """{"OPERATOR_NO":"222","DISTRICT_NO":"02","FIELD_NO":"9","LEASE_NO":"22222","LEASE_NAME":"JONES","CYCLE_YEAR":"2024","CYCLE_MONTH":"01","OIL_PROD_VOL":"10"}""")
    ).toDF("yyyymm", "raw")
    val wide = Staging.leaseWide(raw).cache()
    assert(wide.count() === 3)
    // lease_key surrogate
    assert(wide.select("lease_key").as[String].collect().toSet === Set("8-11111", "2-22222"))
    // A3 diagnostic sees the duplicate group
    val dupes = Staging.duplicateGroups(wide, Seq("lease_key", "yyyymm")).collect()
    assert(dupes.length === 1 && dupes(0).getLong(2) === 2L)
    // A1 dedupe-agg: PK-unique, measures summed, attrs preserved
    val monthly = Staging.leaseMonthly(wide, deterministic = true)
      .orderBy("lease_key").collect()
    assert(monthly.length === 2)
    val smith = monthly.find(_.getString(0) == "8-11111").get
    assert(math.abs(smith.getDouble(7) - 1500.25) < 1e-9) // oil summed
    assert(smith.getDouble(8) === 32000.0)                // gas summed
    assert(smith.getString(6) === "SMITH UNIT")
    // invariant: total measure mass preserved by the dedupe-agg
    val totalWide = wide.agg(sum("oil_bbl")).as[Double].collect()(0)
    val totalMonthly = Staging.leaseMonthly(wide).agg(sum("oil_bbl")).as[Double].collect()(0)
    assert(math.abs(totalWide - totalMonthly) < 1e-9)
  }

  test("curated dims: dropDuplicates on natural keys (A6)") {
    val lease = Seq(
      (1, 8, 54321, 11111, "SMITH", "8-11111", 202401, 1.0, 2.0, 0.0, 0.0),
      (1, 8, 54321, 11111, "SMITH", "8-11111", 202402, 3.0, 4.0, 0.0, 0.0),
      (2, 2, 9, 22222, "JONES", "2-22222", 202401, 9.0, 9.0, 0.0, 0.0)
    ).toDF("operator_no", "district_no", "field_no", "lease_no", "lease_name",
      "lease_key", "yyyymm", "oil_bbl", "gas_mcf", "cond_bbl", "csgd_mcf")
    assert(Curated.dimDistrict(lease).count() === 2)
    assert(Curated.dimField(lease).count() === 2)
    assert(Curated.dimLease(lease).count() === 2)
    assert(Curated.factLeaseMonthly(lease).count() === 3)
  }
}
