package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zone-map (block min/max) modeling — the data-skipping layer that
  * makes a 100 TB scan cheap: parquet row-groups and lake formats keep
  * per-block min/max per column, and a predicate prunes every block
  * whose [min, max] misses it. This op builds the zone maps a given
  * physical layout WOULD produce (fixed `blockRows` rows per block in
  * a chosen sort order, per partition) and scores how well a predicate
  * prunes — the planning tool behind "should we re-sort this table on
  * ship_date?" (cf. the Hilbert/Z-order layout ops, which optimize
  * exactly this skip rate in 2+ dims).
  *
  * Block assignment is a per-PARTITION row_number window (the layout
  * grain a writer actually controls); never a global sort. Zone stats
  * are a (partition, block)-grain aggregate; the skip score is an
  * aggregate over blocks — bounded by rows/blockRows, not rows.
  */
object ZoneMaps {

  /** Per-block zone map: (part, block, n_rows, v_min, v_max) for
    * blocks of `blockRows` rows in (`orderCol` asc, tiebreak) order
    * within each partition. Stats are taken over `statsCol` (default:
    * the order column itself) — passing a DIFFERENT stats column
    * models the cross-column question "how well does a layout sorted
    * on Y skip for predicates on X", which is exactly what separates
    * a good clustering key from a useless one.
    */
  def build(df: DataFrame, partCol: String, orderCol: String,
            tieCol: String, blockRows: Int,
            statsCol: Option[String] = None): DataFrame = {
    require(blockRows > 0, s"blockRows=$blockRows")
    val v = col(statsCol.getOrElse(orderCol))
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(orderCol).asc, col(tieCol).asc)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("block", expr(s"(__rn - 1L) div ${blockRows}L"))
      .groupBy(col(partCol).as("part"), col("block"))
      .agg(count(lit(1)).as("n_rows"),
        min(v).as("v_min"), max(v).as("v_max"))
  }

  /** Skip-rate scorecard for a closed-interval predicate
    * `lo <= v <= hi` against [[build]]'s zone maps: per partition, how
    * many blocks (and rows) the zone maps prune vs must-read. The
    * prune rule is the standard interval-overlap test — a block
    * survives iff `v_min <= hi AND v_max >= lo`.
    */
  def skipScore(zones: DataFrame, lo: Column, hi: Column): DataFrame =
    zones
      .withColumn("__read",
        when(col("v_min") <= hi && col("v_max") >= lo, 1L).otherwise(0L))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("__read")).as("blocks_read"),
        (count(lit(1)) - sum(col("__read"))).as("blocks_skipped"),
        sum(col("n_rows")).as("n_rows"),
        sum(when(col("__read") === 1L, col("n_rows")).otherwise(0L))
          .as("rows_read"))

  /** ANSI-SQL twin of [[build]] + [[skipScore]]; `srcSql` must yield
    * (part, v, tie); the predicate is `loSql <= v <= hiSql`.
    */
  def skipScoreSql(srcSql: String, blockRows: Int, loSql: String,
                   hiSql: String): String =
    s"""WITH src AS ($srcSql),
       |blk AS (
       |  SELECT part, v,
       |         (row_number() OVER (PARTITION BY part ORDER BY v, tie) - 1)
       |           // $blockRows AS block
       |  FROM src
       |), zones AS (
       |  SELECT part, block, CAST(count(*) AS BIGINT) AS n_rows,
       |         min(v) AS v_min, max(v) AS v_max
       |  FROM blk GROUP BY 1, 2
       |), scored AS (
       |  SELECT part, n_rows,
       |         CASE WHEN v_min <= ($hiSql) AND v_max >= ($loSql)
       |              THEN 1 ELSE 0 END AS read
       |  FROM zones
       |)
       |SELECT part, CAST(count(*) AS BIGINT) AS n_blocks,
       |       CAST(sum(read) AS BIGINT) AS blocks_read,
       |       CAST(count(*) - sum(read) AS BIGINT) AS blocks_skipped,
       |       CAST(sum(n_rows) AS BIGINT) AS n_rows,
       |       CAST(sum(CASE WHEN read = 1 THEN n_rows ELSE 0 END) AS BIGINT)
       |         AS rows_read
       |FROM scored GROUP BY 1 ORDER BY part""".stripMargin
}
