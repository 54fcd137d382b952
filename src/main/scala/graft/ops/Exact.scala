package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** The exact-accumulation cast shared by the determinism-disciplined
  * aggregates ([[graft.llm.Calibration]], [[Eval]], [[Windows]],
  * [[Fingerprint]]): sums of long-grain products accumulate in
  * decimal(38,0) — order-independent and overflow-safe far past long
  * range — and only the final closed-form expression drops to double.
  * One definition so a precision change cannot drift per call site.
  */
object Exact {
  def d38(c: Column): Column = c.cast(DecimalType(38, 0))
}
