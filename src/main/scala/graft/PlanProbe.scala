package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = LlmQueries.queries("minhash_signatures_agg")(spark, "/root/testdata/sf0.01")
    println(df.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      l.contains("Aggregate") || l.contains("Sort")).mkString("\n"))
    spark.stop()
  }
}
