package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history — the versioned sibling of
  * the reference's SCD-1 `ON CONFLICT DO UPDATE` merge
  * (model_curated.py:72-101, [[Upsert.merge]]): instead of overwriting a
  * dimension row in place, every attribute change CLOSES the current
  * version (`valid_to` = the change's effective point) and opens a new
  * one, so facts can join the dimension AS OF any past time.
  *
  * History schema = snapshot columns + `valid_from`, `valid_to` (null =
  * still open), `is_current`. The effective point is any orderable
  * column type (int period key, date, timestamp) — it is only stored and
  * compared, never arithmetic'd.
  *
  * Merge semantics per key in the incoming snapshot:
  *  - new key → one open row `[effectiveAt, null)`;
  *  - attrs changed vs the CURRENT row (null-safe) → close current at
  *    `effectiveAt`, open a new row;
  *  - attrs unchanged → untouched.
  * Keys ABSENT from the snapshot are untouched (snapshots may be
  * partial); emit explicit deletion rows upstream if absence means
  * deletion.
  *
  * Scale shape: one key-grain full-outer join between the current slice
  * and the snapshot per merge, plus unions — closed history never
  * re-shuffles. Re-merging the same snapshot at the same point is a
  * no-op (unchanged rows), so replays are idempotent.
  */
object Scd2 {

  /** The history table for the FIRST snapshot: every row open. */
  def init(snapshot: DataFrame, effectiveAt: Column): DataFrame =
    snapshot
      .withColumn("valid_from", effectiveAt)
      // a typed NULL of effectiveAt's type (when() with no otherwise)
      .withColumn("valid_to", when(lit(false), effectiveAt))
      .withColumn("is_current", lit(true))

  /** Merge `snapshot` (keys + attrs, effective at `effectiveAt`) into
    * `history` (a frame shaped like [[init]]'s output).
    */
  def mergeSnapshot(history: DataFrame, snapshot: DataFrame,
                    keys: Seq[String], attrs: Seq[String],
                    effectiveAt: Column): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "keys and attrs required")
    val past = history.where(!col("is_current"))
    val cur = history.where(col("is_current"))
      .select(keys.map(col) ++
        attrs.map(c => col(c).as(s"__cur_$c")) :+
        col("valid_from").as("__cur_vf") :+ lit(true).as("__in_cur"): _*)
    val inc = snapshot
      .select(keys.map(col) ++ attrs.map(col) :+ lit(true).as("__in_inc"): _*)
    val j = cur.join(inc, keys, "full_outer")
    val unchanged = attrs.map(c => col(s"__cur_$c") <=> col(c)).reduce(_ && _)
    val inCur = coalesce(col("__in_cur"), lit(false))
    val inInc = coalesce(col("__in_inc"), lit(false))
    def shaped(attrOf: String => Column, vf: Column, vt: Column,
               open: Boolean)(rows: DataFrame): DataFrame =
      rows.select(keys.map(col) ++ attrs.map(c => attrOf(c).as(c)) :+
        vf.as("valid_from") :+ vt.as("valid_to") :+
        lit(open).as("is_current"): _*)
    val nullAt = when(lit(false), effectiveAt)
    // current rows that survive untouched: key absent from the snapshot,
    // or present with identical attributes
    val keep = shaped(c => col(s"__cur_$c"), col("__cur_vf"), nullAt,
      open = true)(j.where(inCur && (!inInc || unchanged)))
    // current rows closed by a change
    val closed = shaped(c => col(s"__cur_$c"), col("__cur_vf"), effectiveAt,
      open = false)(j.where(inCur && inInc && !unchanged))
    // newly opened versions: brand-new keys and changed keys
    val opened = shaped(c => col(c), effectiveAt, nullAt,
      open = true)(j.where(inInc && (!inCur || !unchanged)))
    past.select((keys ++ attrs).map(col) :+ col("valid_from") :+
        col("valid_to") :+ col("is_current"): _*)
      .unionByName(keep).unionByName(closed).unionByName(opened)
  }

  /** Fold a time-ordered sequence of `(snapshot, effectiveAt)` into
    * `history`, localCheckpointing every `checkpointEvery` merges.
    *
    * Each [[mergeSnapshot]] EMBEDS the previous history plan ~5 times
    * (past + cur + the three shaped branches over the same join), so an
    * unchecked N-snapshot fold builds a ~5^N-node logical tree: 4
    * merges are a few hundred nodes, 11 merges hang the ANALYZER before
    * a single task runs. The periodic eager checkpoint collapses
    * history to a LogicalRDD leaf, capping the tree at ~5^checkpointEvery
    * regardless of N: daily snapshots over a year fold in flat
    * per-merge cost. Results are identical to the raw fold
    * (checkpointing is semantically transparent); prior checkpoints are
    * released once superseded. Keep `checkpointEvery` small (≤4) — the
    * growth it caps is exponential, not linear.
    */
  def foldSnapshots(history: DataFrame, snaps: Seq[(DataFrame, Column)],
                    keys: Seq[String], attrs: Seq[String],
                    checkpointEvery: Int = 4): DataFrame = {
    require(checkpointEvery > 0, s"checkpointEvery=$checkpointEvery")
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    var lastCp: DataFrame = null
    val folded = snaps.zipWithIndex.foldLeft(history) {
      case (h, ((snap, at), i)) =>
        val merged = mergeSnapshot(h, snap, keys, attrs, at)
        if ((i + 1) % checkpointEvery == 0 && i + 1 < snaps.length) {
          val cp = merged.localCheckpoint(true)
          if (lastCp != null) CheckpointBridge.release(lastCp)
          lastCp = cp
          cp
        } else merged
    }
    folded
  }

  /** Batch derivation of the SAME history [[foldSnapshots]] builds, in
    * ONE key-grain shuffle instead of one full-outer join per snapshot.
    *
    * All snapshots are tagged with their effective point and unioned
    * into a tall (key, attrs, eff) frame; version opens are the rows
    * where the attr tuple IS DISTINCT FROM the key's previous present
    * snapshot (null-safe, first appearance always opens), and each
    * version closes at the key's next open (`lead` over the same
    * partitioning, so the second window reuses the first's
    * sort/exchange — no second shuffle). Equivalent to the fold for any
    * snapshot sequence with strictly increasing effective points per
    * key (the fold's own sensible-input envelope: two merges at the
    * SAME point produce a degenerate `[at, at)` version the batch form
    * deliberately collapses); partial snapshots behave identically —
    * an absent key simply contributes no row at that point, so its
    * open version persists, and a reappearance with unchanged attrs
    * opens nothing.
    *
    * Use this for backfills (N snapshots at once): the fold re-shuffles
    * the whole current slice per snapshot — O(N) key-grain shuffles and
    * a plan that needs periodic checkpoints — where this derivation is
    * one shuffle total regardless of N, the shape you want for a
    * 100-snapshot backfill at 100× data. Keep [[mergeSnapshot]] for
    * true incremental merges into an EXISTING history.
    */
  def fromSnapshots(snaps: Seq[(DataFrame, Column)],
                    keys: Seq[String], attrs: Seq[String]): DataFrame = {
    require(snaps.nonEmpty, "at least one snapshot required")
    require(keys.nonEmpty && attrs.nonEmpty, "keys and attrs required")
    val tall = snaps.map { case (snap, at) =>
      snap.select(keys.map(col) ++ attrs.map(col): _*)
        .withColumn("__eff", at)
    }.reduce(_ unionByName _)
    fromTall(tall, keys, attrs, "__eff")
  }

  /** [[fromSnapshots]] over an already-tall frame carrying its own
    * effective-point column `effCol` — skips the union when the
    * snapshots are slices of one source (e.g. a period-keyed aggregate).
    */
  def fromTall(tall: DataFrame, keys: Seq[String], attrs: Seq[String],
               effCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(effCol))
    // lag over a constant marker distinguishes "no previous row" from a
    // previous row whose lagged attr happens to be null
    val isFirst = lag(lit(1), 1).over(w).isNull
    val unchanged = attrs.map(c => col(c) <=> lag(col(c), 1).over(w))
      .reduce(_ && _)
    val opens = tall
      .withColumn("__open", isFirst || !unchanged)
      .where(col("__open"))
    // lead over the SAME (partition, order): the filter preserves the
    // first window's distribution and ordering, so Catalyst plans no
    // second exchange or sort
    opens.select(keys.map(col) ++ attrs.map(col) :+
        col(effCol).as("valid_from") :+
        lead(col(effCol), 1).over(w).as("valid_to"): _*)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Time-travel read: the version of each key valid at `at`. */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.where(col("valid_from") <= at &&
      (col("valid_to").isNull || at < col("valid_to")))
      .drop("valid_to", "is_current")
}
