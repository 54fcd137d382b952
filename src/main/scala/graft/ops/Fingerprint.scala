package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-invariant table fingerprints — the replica/migration
  * consistency check a 100 TB deployment actually runs: after a
  * backfill, an engine migration, or a cross-region copy, "are these
  * two tables byte-identical?" must not require sorting either side. A
  * commutative aggregate (count + SUM of per-row hashes + min/max) over
  * a canonical row rendering answers it in ONE map-only pass per table:
  * no shuffle beyond the final (or per-slice) aggregate, no row ever
  * leaves its partition, any row difference perturbs the sum.
  *
  * Per-row hash = first 60 bits of md5 over the null-tagged,
  * 0x01-separated rendering — 60 bits so the value parses as a positive
  * BIGINT in any engine (the DuckDB twin does
  * `('0x' || substr(md5(…),1,15))::BIGINT`). The sum accumulates in
  * DECIMAL(38,0) (2^60 × 10^9 rows ≈ 10^27 ≪ 10^38 — exact, where a
  * raw BIGINT sum would overflow differently per engine), then the
  * PUBLISHED `hash_sum` wraps the exact sum mod 2^63 into a BIGINT:
  * an int64-bounded fingerprint stays exact at any scale, and wide
  * decimals never reach a result schema (they canonicalize
  * differently across engines/drivers — the r6 hash-mismatch class).
  * Wrapping keeps the any-difference-perturbs-the-sum property: two
  * sums equal mod 2^63 with equal n_rows/min/max collide with
  * probability ~2^-63, the same order as the hash itself.
  *
  * Callers pass explicitly RENDERED columns (cast doubles to a decimal
  * grain, dates to strings) — canonical text is what makes fingerprints
  * comparable across engines, and only the caller knows each column's
  * stable rendering.
  */
object Fingerprint {

  /** First 60 md5 bits of a string column as a POSITIVE long — the
    * cross-engine hash idiom: 15 hex chars parse as a positive BIGINT
    * in any engine (the DuckDB side is
    * `('0x' || substr(md5(x),1,15))::BIGINT`; 16 chars would overflow
    * signed 64-bit). Shared by [[rowHash]] and
    * [[graft.ops.Sampling.reservoirKeyNano]] — the 60-bit bound is
    * load-bearing, keep it in one place.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 60-bit row hash over the canonical rendering of `cols`. Each value
    * is cast to string with nulls replaced by an unambiguous 0x00-tagged
    * marker BEFORE `concat_ws` (which silently skips nulls — a raw null
    * column would make ("a", null, "b") collide with ("a", "b", null)).
    */
  def rowHash(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "rowHash needs at least one column")
    val rendered = cols.map(c => coalesce(c.cast("string"), lit("\u0000null")))
    hash60(concat_ws("\u0001", rendered: _*))
  }

  /** 2^63 as an exact decimal literal — the wrap modulus for published
    * hash sums. Per-row hashes are non-negative, so `sum % 2^63` lands
    * in [0, 2^63) and casts to BIGINT losslessly on every engine
    * (DuckDB twin: `CAST(sum(h) % CAST('9223372036854775808' AS
    * HUGEINT) AS BIGINT)`).
    */
  private val TwoPow63: Column =
    lit(new java.math.BigDecimal("9223372036854775808"))

  /** One fingerprint row per `slice` value: `(slice, n_rows, hash_sum,
    * hash_min, hash_max)`. Slice at the table's natural increment
    * (month, ingest batch) so a mismatch pinpoints WHICH slice to
    * re-copy instead of failing the whole table.
    */
  def sliceFingerprints(df: DataFrame, slice: Column,
                        cols: Seq[Column]): DataFrame =
    df.select(slice.as("slice"), rowHash(cols).as("__h"))
      .groupBy(col("slice"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__h").cast(DecimalType(38, 0))).cast(DecimalType(38, 0))
          % TwoPow63).cast("long").as("hash_sum"),
        min(col("__h")).as("hash_min"),
        max(col("__h")).as("hash_max"))

  /** Whole-table fingerprint — [[sliceFingerprints]] degenerate to one
    * row (constant slice dropped).
    */
  def tableFingerprint(df: DataFrame, cols: Seq[Column]): DataFrame =
    sliceFingerprints(df, lit(0), cols).drop("slice")

  /** Compare two [[sliceFingerprints]] frames: full-outer join on
    * `slice`, keep slices that disagree on count or content (or exist
    * on one side only), tagged `only_a` / `only_b` / `content_diff`.
    * The repair driver re-copies exactly these slices.
    */
  def diffSlices(a: DataFrame, b: DataFrame): DataFrame = {
    val bb = b.select(col("slice"), col("n_rows").as("__b_n"),
      col("hash_sum").as("__b_sum"))
    a.select(col("slice"), col("n_rows").as("__a_n"),
        col("hash_sum").as("__a_sum"))
      .join(bb, Seq("slice"), "full_outer")
      .where(col("__a_n").isNull || col("__b_n").isNull ||
        col("__a_n") =!= col("__b_n") || col("__a_sum") =!= col("__b_sum"))
      .select(col("slice"),
        when(col("__a_n").isNull, lit("only_b"))
          .when(col("__b_n").isNull, lit("only_a"))
          .otherwise(lit("content_diff")).as("diff_kind"),
        col("__a_n").as("n_rows_a"), col("__b_n").as("n_rows_b"))
  }
}
