package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Class-compactness diagnostics over a labeled embedding column — the
  * eval-side question "do my labels correspond to tight clusters?"
  * asked without any pairwise work.
  *
  * Per label, the within-class scatter uses the n-scaled identity
  *
  *   n·Σ‖e‖² − ‖Σe‖²  =  n²·(mean squared distance to the centroid)
  *
  * over floor-quantized integer elements (the [[graft.ops.Pca]] grid),
  * so no centroid division ever happens and every reported scatter is
  * an EXACT integer — bit-stable across engines and partitionings.
  *
  * Scale shape: one (label, dim)-grain aggregate over the exploded
  * elements (full map-side combine), then a label-grain rollup.
  * Nothing is pairwise; nothing collects.
  */
object Separability {

  def labelScatter(df: DataFrame, labelCol: String, vecCol: String)
    : DataFrame = {
    val q = df.select(col(labelCol).as("label"),
      posexplode(transform(col(vecCol),
        x => floor(x.cast("double") * 1e4).cast("long"))).as(Seq("__i", "__e")))
    val per = q.groupBy(col("label"), col("__i"))
      .agg(sum(col("__e")).as("__s"),
        sum(col("__e") * col("__e")).as("__ss"),
        count(lit(1)).as("__n"))
    per.groupBy(col("label"))
      .agg(max(col("__n")).as("n_rows"),
        sum(col("__ss")).as("__norm2"),
        sum(col("__s") * col("__s")).as("__sq"))
      .select(col("label"), col("n_rows"),
        (col("n_rows") * col("__norm2") - col("__sq")).as("within_n2"),
        round(col("__norm2").cast("double") / col("n_rows"), 6)
          .as("mean_norm2"))
      .orderBy(col("label"))
  }
}
