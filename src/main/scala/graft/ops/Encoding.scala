package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical feature encodings — the tabular-ML prep step every
  * training-data pipeline runs before a model sees a string column:
  * smoothed target (mean) encoding and frequency-rank dictionary
  * encoding. Both are single-aggregation shapes (category grain), so
  * they scale as any group-by-sum does; the encoded dimension table is
  * tiny and broadcast-joins back onto the fact side.
  *
  * Target encoding is computed as an EXACT RATIONAL in integer cents —
  * {{{ enc(c) = (S_c + α·μ) / (n_c + α)
  *            = (S_c·N + α·G) / (N·(n_c + α)) }}}
  * with S_c = Σ target cents in category, G = Σ all cents, N = total
  * rows, μ = G/N the global prior — one floored division at the end,
  * so the result is bit-identical on any engine (the [[Trend]] /
  * [[Stats]] integer-moments discipline; no double fixpoint to
  * disagree on). Bound: `S_c·N` must fit int64 — fine through
  * billions of rows of cent-scale targets per encoded slice; past
  * that, encode per partition-slice and merge (documented contract,
  * same as the fingerprint mod-2⁶³ choice).
  */
object Encoding {

  /** Smoothed target encoding at category grain.
    *
    * @param df fact frame
    * @param catCol categorical column to encode
    * @param centsCol integer (cents-scaled) target column
    * @param alpha smoothing pseudo-count pulling rare categories
    *        toward the global mean
    * @return (category, n, sum_cents, enc_cents): enc_cents =
    *         (S_c·N + α·G) div (N·(n_c + α))
    */
  def targetEncode(df: DataFrame, catCol: String, centsCol: String,
                   alpha: Long = 20L): DataFrame = {
    require(alpha >= 0, s"alpha=$alpha")
    val perCat = df.groupBy(col(catCol))
      .agg(count(lit(1)).as("n"), sum(col(centsCol)).as("sum_cents"))
    val totals = df.agg(count(lit(1)).as("__N"),
      sum(col(centsCol)).as("__G"))
    // 1-row totals broadcast — the only "cross join" shape allowed
    perCat.crossJoin(broadcast(totals))
      .select(col(catCol), col("n"), col("sum_cents"),
        expr(s"(sum_cents * __N + ${alpha}L * __G)" +
          s" div (__N * (n + ${alpha}L))").as("enc_cents"))
  }

  /** ANSI-SQL twin of [[targetEncode]]; `srcSql` must yield
    * (category, cents). Keep in lockstep.
    */
  def targetEncodeSql(srcSql: String, alpha: Long = 20L): String =
    s"""WITH src AS ($srcSql),
       |per_cat AS (
       |  SELECT category, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(cents) AS BIGINT) AS sum_cents
       |  FROM src GROUP BY 1
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS nn,
       |         CAST(sum(cents) AS BIGINT) AS g
       |  FROM src
       |)
       |SELECT category, n, sum_cents,
       |       (sum_cents * nn + $alpha * g) // (nn * (n + $alpha)) AS enc_cents
       |FROM per_cat CROSS JOIN tot ORDER BY category""".stripMargin

  /** Frequency-rank dictionary encoding: each category value gets a
    * dense integer code ordered by (count desc, value asc) — code 0 is
    * the most frequent value, ties broken lexically so the vocabulary
    * is deterministic and reproducible across builds (the property a
    * feature store needs to keep old models servable).
    *
    * The window runs at CATEGORY grain (post-aggregation), not row
    * grain — a single-task sort over |vocab| rows, never over the
    * fact table.
    */
  def dictEncode(df: DataFrame, catCol: String): DataFrame = {
    val counts = df.groupBy(col(catCol)).agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col(catCol).asc)
    counts.withColumn("code", row_number().over(w).cast("long") - 1L)
  }

  /** ANSI-SQL twin of [[dictEncode]]; `srcSql` must yield (category). */
  def dictEncodeSql(srcSql: String): String =
    s"""WITH src AS ($srcSql),
       |counts AS (
       |  SELECT category, CAST(count(*) AS BIGINT) AS n FROM src GROUP BY 1
       |)
       |SELECT category, n,
       |       CAST(row_number() OVER (ORDER BY n DESC, category) - 1 AS BIGINT) AS code
       |FROM counts ORDER BY category""".stripMargin
}
