package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StringType
import graft.ops.Casts

/** `}`-delimited DSV reader (S1/S2 — reference dags/pdq_etl_dag.py:193-206).
  *
  * The reference reads the RRC PDQ `.dsv` exports with pandas in 1M-row
  * chunks, all columns as strings, literal quoting, and a null-token list.
  * Spark-first replacement: one partitioned CSV scan — chunking disappears
  * (Spark splits the file), and the multi-token null normalization the
  * pandas reader does via `na_values` becomes a post-read column pass
  * (Spark CSV supports a single `nullValue`, so the rest of the tokens are
  * normalized by [[graft.ops.Casts.normNull]]).
  */
object Dsv {

  /** Read a `}`-delimited file: header row, every column `StringType`,
    * quotes treated literally (pandas `quoting=3`), null tokens
    * `"", NULL, null, NaN, nan` → null, header names trimmed (S2).
    *
    * @param schemaCols optional declared column list. Binding is BY HEADER
    *        NAME, like the reference's pandas `read_csv` — an explicit
    *        Spark CSV schema would bind positionally and silently mislabel
    *        a file whose column order differs from the declaration
    *        (round-2 advice). Declared columns present in the header are
    *        selected in declared order; declared columns absent from the
    *        file come back as null columns (the tolerant-declared style
    *        the pipeline relies on for optional variant columns); file
    *        columns not declared are dropped.
    */
  def read(spark: SparkSession, path: String,
           schemaCols: Seq[String] = Nil): DataFrame = {
    val reader = spark.read
      .option("sep", "}")
      .option("header", "true")
      // pandas csv.QUOTE_NONE analog: \u0000 quote char disables quoting
      .option("quote", "\u0000")
      .option("mode", "PERMISSIVE")
    // No explicit schema: names come from the header (all columns land as
    // StringType since inference is off), then bind by name below.
    val base = reader.csv(path)
    // S2: trim header whitespace; P10: normalize null tokens + trim values.
    val trimmed = base.toDF(base.columns.toIndexedSeq.map(_.trim): _*)
    val bound =
      if (schemaCols.nonEmpty) {
        val present = trimmed.columns.toSet
        trimmed.select(schemaCols.map { c =>
          val name = c.trim
          if (present.contains(name)) col(name)
          else lit(null).cast(StringType).as(name)
        }: _*)
      } else trimmed
    Casts.normNullAll(bound)
  }

  /** Shape-reject audit: raw lines whose `}`-token count differs from the
    * header's. PERMISSIVE CSV silently pads short rows with nulls and
    * truncates long ones — correct for tolerant ingest ([[read]]), but an
    * export whose row shapes drift deserves a visible signal, and neither
    * mode surfaces it (`_corrupt_record` only marks unparseable rows,
    * which an all-string schema never has).
    *
    * A deliberate SECOND pass over the raw file (pure column expressions,
    * one `split` per line): run it as an audit next to the ingest when
    * shape drift matters, not unconditionally at 100 TB.
    *
    * `path` must be a SINGLE file: a directory/glob interleaves several
    * files whose first rows are all headers, and "the header" is no
    * longer well-defined (audit per file instead). The header is read
    * through the filesystem — `Dataset.head()` on a multi-split read
    * makes no first-line promise. No header-equality filter is needed:
    * the header (and any data line byte-equal to it) carries exactly the
    * header's token count, so the shape predicate can never emit it.
    *
    * @return (line, n_tokens) for each line with a token count ≠ the
    *         header's
    */
  def shapeRejects(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.getFileStatus(p).isFile,
      s"shapeRejects audits a single file; '$path' is not one — run it per file")
    val header = {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(p),
          java.nio.charset.StandardCharsets.UTF_8))
      try Option(in.readLine()).getOrElse("") finally in.close()
    }
    val nCols = header.split("\\}", -1).length
    spark.read.text(path)
      .select(col("value").as("line"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("value"), "\\}", -1))
          .as("n_tokens"))
      .where(col("n_tokens") =!= lit(nCols))
  }
}
