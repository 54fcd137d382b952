package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document boilerplate-line removal (CCNet-style): a line that
  * appears in at least `minDocs` DISTINCT documents is site chrome /
  * license text / navigation — strip it from every document and
  * reassemble the rest in original order.
  *
  * Scale shape: one explode to line grain, one aggregation keyed on the
  * 128-bit line hash (count-distinct docs per line — the shuffle carries
  * hashes, not line text), one equi-join of lines against the common-line
  * set at hash grain, and one doc-grain reassembly aggregation. Nothing
  * is all-pairs, and no stage keys a shuffle on raw line text.
  */
object Boilerplate {

  /** Line key for commonality matching: md5 of the trimmed line, so the
    * count/join shuffles move 32 hex chars instead of arbitrary-length
    * text, and trailing-whitespace variants of one line match. Empty
    * (all-whitespace) lines are NEVER treated as boilerplate — stripping
    * them would silently delete paragraph structure.
    */
  def lineKey(line: Column): Column = md5(trim(line))

  /** Documents exploded to `(id, line_pos, line)` grain — `sep` is a
    * regex (default: newline).
    */
  def lineTable(df: DataFrame, idCol: String, textCol: String,
                sep: String = "\n"): DataFrame =
    df.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), sep)).as(Seq("line_pos", "line")))

  /** The common-line set: line keys present in ≥ `minDocs` distinct
    * documents (exact count-distinct at line-key grain; blank lines
    * excluded — see [[lineKey]]).
    */
  def commonLineKeys(lines: DataFrame, minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs=$minDocs")
    lines.where(trim(col("line")) =!= "")
      .groupBy(lineKey(col("line")).as("__lk"))
      .agg(countDistinct(col("__id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("__lk"))
  }

  /** Strip boilerplate lines from every document: lines whose key is in
    * [[commonLineKeys]] drop, the rest reassemble in `line_pos` order.
    * Returns `(idCol, n_lines, n_kept, textCol)` — a document whose
    * every line was boilerplate survives with empty text and
    * `n_kept = 0` (dropping the row is the caller's policy decision,
    * e.g. a min-length filter downstream).
    */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
                       minDocs: Int = 2, sep: String = "\n"): DataFrame = {
    val lines = lineTable(df, idCol, textCol, sep)
    val common = commonLineKeys(lines, minDocs)
    val kept = lines
      .join(common, lineKey(col("line")) === col("__lk"), "left_anti")
    val reassembled = kept
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("line_pos"), col("line")))),
            e => e.getField("line")),
          sep).as("__kept_text"))
    val counts = lines.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_lines"))
    counts.join(reassembled, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("__kept_text"), lit("")).as(textCol))
  }
}
