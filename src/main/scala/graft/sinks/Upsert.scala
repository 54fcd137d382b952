package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-write-wins upsert (S8).
  *
  * The reference merges dimension loads with Postgres
  * `INSERT ... ON CONFLICT (pk) DO UPDATE / DO NOTHING`
  * (model_curated.py:72-101). Plan-level equivalent: union existing rows
  * with incoming rows tagged by precedence, keep one row per key with
  * `row_number` — expressible entirely inside Catalyst, so it shuffles
  * once on the key and scales with partitions (no driver-side merge loop).
  */
object Upsert {

  /** Merge `incoming` into `existing` on `keys`.
    *
    * @param updateOnConflict true ≙ `DO UPDATE` (incoming wins),
    *                         false ≙ `DO NOTHING` (existing wins)
    */
  def merge(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
            updateOnConflict: Boolean = true): DataFrame = {
    val (loPri, hiPri) = if (updateOnConflict) (existing, incoming) else (incoming, existing)
    val tagged = loPri.withColumn("__pri", lit(0))
      .unionByName(hiPri.withColumn("__pri", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__pri").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__pri", "__rn")
  }
}
