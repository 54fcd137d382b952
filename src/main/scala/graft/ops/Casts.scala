package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tolerant string→typed cast expression builders.
  *
  * Re-expresses the reference's cast semantics (SURVEY.md §2.2) as pure
  * Catalyst column expressions — no UDFs, so every cast stays inside
  * whole-stage codegen. The reference's two Spark jobs genuinely differ
  * here, so both variants are encoded:
  *
  *  - `toIntTolerant` — reference/spark_jobs/transform_lease.py:31-36 (P5):
  *    null/blank → null, else `cast("int")` (so "-5" → -5, "12.0" → null
  *    per Spark ANSI-off cast-of-decimal-string-to-int semantics... see
  *    note below).
  *  - `toIntStrict`   — reference/spark_jobs/transform_operator.py:76 (P6):
  *    Python `int(x) if x.strip().isdigit() else None` — digits only;
  *    rejects negatives, decimals, signs. Pure-column `rlike` replacement
  *    for the reference's Python UDF (removes the Python-worker round trip).
  *  - `toNumZero`     — transform_operator.py:78-82 / transform_lease.py:39-44
  *    (P7): null/blank → 0.0, else cast("double") (unparseable → null).
  *  - `normNull`      — dags/pdq_etl_dag.py:149-158 (P10): multi-token null
  *    normalization ("", NULL, null, NaN, nan, ± whitespace) + trim.
  *  - `yyyymm*`       — dags/pdq_etl_dag.py:80-140 / transform_*.py (P8):
  *    month-key derivation coalesce chain.
  */
object Casts {

  /** Null tokens the reference's extractor treats as SQL null (P10). */
  val NullTokens: Seq[String] = Seq("", "NULL", "null", "NaN", "nan")

  /** P10 — normalize null tokens to real null, trim everything else. */
  def normNull(c: Column): Column = {
    val t = trim(c)
    when(c.isNull || t.isin(NullTokens: _*), lit(null).cast("string"))
      .otherwise(t)
  }

  /** Apply [[normNull]] to every column of a frame (extract-time pass). */
  def normNullAll(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(df.columns.toIndexedSeq.map(n => normNull(col(n)).as(n)): _*)

  /** P5 — lease-job tolerant int: null/blank → null, else cast("int").
    * Spark's non-ANSI string→int cast nulls anything non-integral
    * (including "12.0"), and accepts "-5" → -5.
    */
  def toIntTolerant(c: Column): Column =
    when(c.isNull || trim(c) === "", lit(null).cast("int"))
      .otherwise(trim(c).try_cast("int"))

  /** P6 — operator-job strict int (digits only; no sign, no decimal point).
    * Behaviorally identical to the reference's Python
    * `int(x) if x.strip().isdigit() else None` for ASCII data.
    */
  def toIntStrict(c: Column): Column =
    when(c.rlike("^\\s*\\d+\\s*$"), trim(c).try_cast("int"))
      .otherwise(lit(null).cast("int"))

  /** P7 — measure cast: null/blank → 0.0, else cast("double")
    * (unparseable strings become null via cast semantics — faithfully
    * preserved, NOT coalesced to 0).
    */
  def toNumZero(c: Column): Column =
    when(c.isNull || trim(c) === "", lit(0.0))
      .otherwise(trim(c).try_cast("double"))

  /** P9 — key default: tolerant int cast with null → 0 fallback. */
  def keyDefault(c: Column): Column = coalesce(toIntTolerant(c), lit(0))

  /** P8 — yyyymm derivation coalesce chain over the source's naming
    * variants, replacing both the vectorized and row-wise reference paths
    * (dags/pdq_etl_dag.py:80-140) with one codegen'd expression.
    */
  def yyyymmFromVariants(
      yearMonth: Column,
      yearMonthNo: Column,
      yrMo: Column,
      year: Column,
      month: Column): Column =
    coalesce(
      toIntTolerant(yearMonth),
      toIntTolerant(yearMonthNo),
      toIntTolerant(yrMo),
      toIntTolerant(year) * 100 + toIntTolerant(month))

  /** P8 (job-side) — prefer a stored yyyymm, else CYCLE_YEAR*100+CYCLE_MONTH
    * (transform_operator.py:85-86, transform_lease.py:85-88).
    */
  def yyyymmOrDerived(stored: Column, year: Column, month: Column): Column =
    coalesce(toIntTolerant(stored), toIntTolerant(year) * 100 + toIntTolerant(month))

  /** yyyymm month key from a timestamp — the engine-native form of the
    * reference's integer month partition key (F6: y*100 + m).
    */
  def yyyymmOfTs(ts: Column): Column =
    (year(ts) * 100 + month(ts)).cast("int")

  /** P4 — extract-time validity filter: non-null month key, data floor
    * (reference drops pre-2000 rows, dags/pdq_etl_dag.py:212-218).
    */
  def validMonth(yyyymm: Column, floor: Int = 200001): Column =
    yyyymm.isNotNull && yyyymm >= floor
}
