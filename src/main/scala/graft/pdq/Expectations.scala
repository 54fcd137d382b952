package graft.pdq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite — the generalization of
  * the reference's hand-rolled DQ gates (`spark_jobs/model_curated
  * .py:132-160`'s negative-measure and duplicate-key checks, SURVEY §2.4
  * A4/A5) into a rule engine: a suite of named expectations evaluates in
  * ONE aggregation pass over the table, emitting a (rule, n_checked,
  * n_failed, passed) report row per rule.
  *
  * Execution shape: every row-wise rule compiles to a conditional-sum
  * aggregate and the whole suite shares a single scan + single
  * (partial-aggregating) reduce — adding a rule adds two counters to
  * the aggregation buffer, not a pass over 100 TB. `unique` is the one
  * non-row-wise rule; it rides the same scan as a `count_distinct`
  * (Spark plans the distinct via expand, still one scan).
  *
  * `passed` is computed, not declared — a failing expectation shows up
  * as `passed = false` with its exact failure count, which is what a
  * pipeline gate consumes ([[Pipeline]]'s abort-on-dq semantics).
  */
object Expectations {

  /** One expectation: `checked`/`failed` are AGGREGATE expressions
    * contributed to the suite's single pass.
    */
  final case class Expectation(name: String, checked: Column, failed: Column)

  def notNull(c: String): Expectation = Expectation(
    s"not_null:$c", count(lit(1)), sum(when(col(c).isNull, 1L).otherwise(0L)))

  /** Rows minus distinct key combos — 0 failed ⇔ the key is unique.
    * Rows with a null key component count as distinct combos (struct
    * equality), matching the reference's HAVING-count gate grain.
    */
  def unique(cols: Seq[String]): Expectation = Expectation(
    s"unique:${cols.mkString(",")}", count(lit(1)),
    count(lit(1)) - count_distinct(struct(cols.map(col): _*)))

  /** Null values do NOT fail membership/range/regex rules — pair with
    * [[notNull]] to assert presence; this keeps each rule's failure
    * count attributable to exactly one defect class.
    */
  def acceptedValues(c: String, values: Seq[String]): Expectation =
    Expectation(s"accepted_values:$c", count(lit(1)),
      sum(when(col(c).isNotNull && !col(c).isin(values: _*), 1L).otherwise(0L)))

  def inRange(c: String, lo: Double, hi: Double): Expectation =
    Expectation(s"in_range:$c", count(lit(1)),
      sum(when(col(c).isNotNull &&
        (col(c) < lo || col(c) > hi), 1L).otherwise(0L)))

  def matchesRegex(c: String, pattern: String): Expectation =
    Expectation(s"matches_regex:$c", count(lit(1)),
      sum(when(col(c).isNotNull && !col(c).rlike(pattern), 1L).otherwise(0L)))

  /** Evaluate the suite: one scan, one report row per rule. */
  def run(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "empty expectation suite")
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(r.checked.cast("long").as(s"__c$i"), r.failed.cast("long").as(s"__f$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"__c$i").as("n_checked"),
        col(s"__f$i").as("n_failed"))
    }: _*)
    one.select(explode(rows).as("__r"))
      .select(col("__r.rule").as("rule"),
        col("__r.n_checked").as("n_checked"),
        col("__r.n_failed").as("n_failed"),
        (col("__r.n_failed") === 0L).as("passed"))
      .orderBy(col("rule"))
  }
}
