package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing probe: `runMain graft.PlanProbe <query> [sfDir] [mode]`
  * where mode is `time` (default: noop-sink wall time, 2 runs) or `plan`
  * (formatted physical plan).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val query = if (args.nonEmpty) args(0) else "text_stats"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "time"
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (mode == "bnlj") {
      // sweep EVERY query: print each BroadcastNestedLoopJoin's
      // build-side root chain (dev aid for PlanShapeSpec's shape sweep)
      import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
      import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        val sp = SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
        sp.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
          val build = j.buildSide match {
            case BuildLeft => j.left
            case BuildRight => j.right
          }
          val chain = build.collect { case n => n.nodeName }.mkString(" <- ")
          println(s"[bnlj] $name :: $chain")
        }
      }
    } else if (mode == "plan") {
      println(SparkEntry.queries(query)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    } else {
      val fn = SparkEntry.queries(query)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        println(f"[probe] $query pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
