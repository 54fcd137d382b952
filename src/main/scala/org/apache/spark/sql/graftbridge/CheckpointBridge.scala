package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Releases the block-store storage behind an eager `localCheckpoint`.
  *
  * `Dataset.localCheckpoint(eager = true)` materializes the frame into a
  * checkpointed RDD surfaced to the planner as a [[LogicalRDD]] leaf; the
  * blocks stay pinned until that RDD is garbage-collected. Iterative
  * algorithms that checkpoint once per round (connected components) would
  * otherwise accumulate one generation of blocks per iteration — at
  * corpus scale that's executor memory held for no reader. `Dataset
  * .unpersist` can't help (it only consults the `CacheManager`, which
  * never sees checkpoints), so this shim walks the analyzed plan and
  * unpersists the checkpointed RDD leaves directly.
  *
  * Only call on frames that will never be read again: a released
  * checkpoint cannot recompute (its lineage was truncated).
  */
object CheckpointBridge {

  /** Unpersist every RDD behind a [[LogicalRDD]] leaf of `df`'s plan. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
