package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read a testdata table. `events.ts` is parquet TIMESTAMP(NANOS), which
    * Spark 4 cannot represent natively — read it as a nanos long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a
    * micros-precision timestamp (lossless for month/day/second grain).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Reference semantics are Spark 3.5 ANSI-off (malformed cast → null).
    spark.conf.set("spark.sql.ansi.enabled", "false")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        // Integer division that stays in LONG: `/` would promote to double,
        // and nanos epochs (~1.7e18) exceed double's 53-bit exact mantissa.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
