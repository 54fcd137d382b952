package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HilbertKey

/** Hilbert key: the adjacency property that justifies the operator
  * (consecutive keys are Manhattan-adjacent cells — the locality Morton
  * lacks), bijectivity on a full grid, the input envelope, and SQL/
  * Column-API parity through codegen.
  */
class HilbertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("consecutive keys are ADJACENT cells on a full 32x32 grid; Morton's are not") {
    val n = 32
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong)
    val byD = cells.map { case (x, y) => (HilbertKey.index(x, y), x, y) }
      .sortBy(_._1)
    // bijection onto [0, n²)
    assert(byD.map(_._1) === (0L until (n.toLong * n)).toSeq)
    // every curve step moves exactly one cell horizontally or vertically
    byD.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) === 1L,
        s"jump from ($x1,$y1) to ($x2,$y2)")
    }
    // the same walk in Morton order takes long jumps — the defect this
    // operator exists to remove (e.g. z=31→32 jumps (7,3)→(0,4))
    val zByD = cells.map { case (x, y) => (graft.functions.ZOrderKey.interleave(x, y), x, y) }
      .sortBy(_._1)
    val zMaxStep = zByD.sliding(2).map { case Seq((_, x1, y1), (_, x2, y2)) =>
      math.abs(x2 - x1) + math.abs(y2 - y1)
    }.max
    assert(zMaxStep > 1L)
  }

  test("inputs outside [0, 2^31) throw instead of aliasing") {
    intercept[IllegalArgumentException](HilbertKey.index(-1L, 0L))
    intercept[IllegalArgumentException](HilbertKey.index(0L, 1L << 31))
    // the envelope edge is fine and lands inside [0, 2^62)
    val edge = HilbertKey.index(0x7FFFFFFFL, 0x7FFFFFFFL)
    assert(edge >= 0L && edge < (1L << 62))
  }

  test("SQL registration matches the Column API through codegen") {
    val df = Seq((3L, 5L), (1000000L, 999999L), (0L, 0L)).toDF("a", "b")
    val viaCol = df.select(HilbertKey.hilbertKey(col("a"), col("b")))
      .as[Long].collect().toSeq
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("hk_t")
    val viaSql = spark.sql("SELECT hilbert_key(a, b) FROM hk_t")
      .as[Long].collect().toSeq
    assert(viaCol === viaSql)
    assert(viaCol === Seq(HilbertKey.index(3L, 5L),
      HilbertKey.index(1000000L, 999999L), 0L))
    // bad types fail at analysis, not mid-job
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hilbert_key('x', 1L)").collect()
    }
  }
}
