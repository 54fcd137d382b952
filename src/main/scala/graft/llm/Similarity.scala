package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`).
  *
  * - [[knnBrute]] — exact cosine top-k via a broadcast join of the query
  *   set against the corpus: O(|Q|·|C|) dot products but no shuffle of
  *   the corpus, so it scales to large corpora as long as the query set
  *   broadcasts. The baseline every ANN variant is checked against.
  * - [[knnBucketed]] — IVF-style: candidates restricted to the query's
  *   coarse partition (any int bucket column, e.g. a cluster/label id or
  *   an LSH sign-bucket from [[signBucket]]). The join keys on the
  *   bucket, so the per-query work drops by the bucket fan-out — the
  *   100 TB scale path.
  *
  * Dot products are explicit `zip_with` + left-fold `aggregate`
  * expressions in DOUBLE: element-order-sequential, hence deterministic
  * and reproducible in an oracle engine with the same fold order.
  */
object Similarity {

  /** Sequential-fold dot product of two float arrays, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (0 when either vector is all-zero). Evaluated by
    * the fused native [[graft.functions.HashExpressions.CosineSim]]
    * expression — same left-to-right double accumulation as the
    * declarative `dot/norm` form, so bits match.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.HashExpressions.cosineSim(a, b)

  /** Declarative formulation (executable spec for [[cosine]]). */
  def cosineDeclarative(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** LSH-style coarse bucket: sign bits of the first `bits` dimensions
    * packed into an int — a trivially deterministic space partitioner
    * for [[knnBucketed]] when no cluster id exists.
    */
  def signBucket(a: Column, bits: Int = 4): Column =
    (0 until bits).map { i =>
      when(element_at(a, i + 1) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Exact cosine top-k: for each query vector, the `k` nearest corpus
    * vectors. Ranking uses (rounded similarity desc, corpus id) so
    * results are total-order deterministic.
    *
    * @param queries (qidCol, vecCol) frame — must be small enough to
    *                broadcast (it is hinted).
    * @param corpus  (idCol, vecCol) frame.
    */
  def knnBrute(queries: DataFrame, corpus: DataFrame, qidCol: String,
               idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val sims = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine_sim"))
  }

  /** Deterministic Lloyd's k-means over an embedding column — the
    * trainer that turns [[knnBucketed]] into a real IVF index (coarse
    * quantizer = learned centroids instead of sign bits or labels).
    *
    * Execution shape at corpus scale:
    *  - ASSIGN is map-only: the k centroids are literals baked into one
    *    argmax-of-cosine expression (k native [[cosine]] calls per row —
    *    keep k ≤ a few hundred for this expression path);
    *  - RECOMPUTE is one shuffle at (bucket, dimension) grain:
    *    `posexplode` + avg, then a k×dims collect to the driver (KBs) to
    *    rebuild the literals for the next round — the corpus itself
    *    never leaves the executors;
    *  - init is the first k vectors by id — no RNG, so training is
    *    reproducible for a fixed data layout (the one caveat is the
    *    usual float-sum merge order inside avg).
    *
    * Empty clusters keep their previous centroid. Returns the learned
    * centroids in bucket order (0 until k).
    */
  /** Memo for trained centroids, keyed by a caller-chosen tag (usually
    * the data dir + hyperparameters). Exists so an oracle emitter can
    * reuse the EXACT floats a query trained — distributed float
    * averaging is deterministic for a fixed layout only up to partial-
    * sum merge order, so "train twice and hope" is not a contract.
    */
  private val centroidMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Float]]]()

  /** [[kMeansCentroids]] through the memo: at most one training per tag
    * per JVM; later callers (including [[graft.LlmQueries]]'s oracle
    * builder) get the same array instance.
    */
  def kMeansCentroidsCached(tag: String, corpus: => DataFrame, idCol: String,
                            vecCol: String, k: Int, iters: Int)
      : Array[Array[Float]] =
    centroidMemo.computeIfAbsent(tag,
      _ => kMeansCentroids(corpus, idCol, vecCol, k, iters))

  /** The memoized centroids for `tag`, if that training already ran. */
  def trainedCentroids(tag: String): Option[Array[Array[Float]]] =
    Option(centroidMemo.get(tag))

  def kMeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 5): Array[Array[Float]] = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters")
    var centroids = corpus.orderBy(col(idCol)).select(col(vecCol)).limit(k)
      .collect().map(_.getSeq[Float](0).toArray)
    require(centroids.length == k,
      s"corpus has only ${centroids.length} rows for k=$k centroids")
    (0 until iters).foreach { _ =>
      val assigned = corpus.select(col(vecCol).as("__v"))
        .withColumn("__bucket", nearestCentroid(col("__v"), centroids))
      val sums = assigned
        .select(col("__bucket"), posexplode(col("__v")).as(Seq("__d", "__x")))
        .groupBy(col("__bucket"), col("__d"))
        .agg(avg(col("__x")).as("__m"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat
      }
      centroids = next
    }
    centroids
  }

  /** Nearest-centroid id (argmax cosine; ties break to the LOWEST
    * centroid index) as a map-only expression over literal centroids.
    */
  def nearestCentroid(vec: Column, centroids: Array[Array[Float]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(
        cosine(vec, array(c.map(x => lit(x)): _*)).as("s"),
        lit(-i).as("ni"))
    }
    // greatest on (similarity, -index): highest similarity wins, ties to
    // the lowest index — a deterministic total order
    val best =
      if (scored.length == 1) scored.head else greatest(scored.toIndexedSeq: _*)
    (-best.getField("ni")).cast("int")
  }

  /** IVF top-k: train (or reuse) centroids, assign the corpus once, then
    * probe the `nProbes` centroids nearest to each query — candidates =
    * the union of those buckets, still an equi-join keyed on the bucket
    * (the corpus never shuffles; probes explode on the broadcast query
    * side, exactly like [[knnMultiProbe]]).
    */
  def knnIvf(queries: DataFrame, corpus: DataFrame, qidCol: String,
             idCol: String, vecCol: String, centroids: Array[Array[Float]],
             k: Int = 10, nProbes: Int = 1): DataFrame = {
    require(nProbes >= 1 && nProbes <= centroids.length,
      s"nProbes=$nProbes for ${centroids.length} centroids")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      nearestCentroid(col(vecCol), centroids).as("__probe"))
    // rank ALL centroids per query, keep the nProbes best: one struct
    // array sort on the broadcast side, no per-centroid join
    val ranked = array_sort(array(centroids.zipWithIndex.map { case (cen, i) =>
      struct(
        (-cosine(col("__qv"), array(cen.map(x => lit(x)): _*))).as("d"),
        lit(i).as("i"))
    }: _*))
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__probe",
        explode(slice(transform(ranked, e => e.getField("i")), 1, nProbes)))
    val sims = c.join(broadcast(q), Seq("__probe"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine_sim"))
  }

  /** Multi-probe sign-LSH top-k: like [[knnBucketed]] over [[signBucket]]
    * partitions, but each query ALSO probes the buckets reached by
    * flipping its least-confident sign bits (smallest |component| —
    * the dimensions where a near neighbor most plausibly landed on the
    * other side of the hyperplane). The standard LSH recall fix without
    * more tables: candidate volume grows by ×nProbes, not ×2^bits, and
    * the corpus still never shuffles (probes explode on the broadcast
    * query side only).
    *
    * Deterministic probe order: bits rank by (|component|, index)
    * ascending; probe j flips the j-th least-confident bit of the base
    * bucket. Probes are distinct single-bit flips, so a corpus row is
    * generated at most once per query — no candidate dedup pass.
    */
  def knnMultiProbe(queries: DataFrame, corpus: DataFrame, qidCol: String,
                    idCol: String, vecCol: String, k: Int = 10,
                    bits: Int = 4, nProbes: Int = 2): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits=$bits")
    require(nProbes >= 1 && nProbes <= bits + 1, s"nProbes=$nProbes bits=$bits")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      signBucket(col(vecCol), bits).as("__probe"))
    // per-bit confidence ranking, materialized as an attribute before any
    // further use (array_sort on the struct array is lexicographic:
    // weight, then index — a deterministic tiebreak)
    val ord = array_sort(array((0 until bits).map(i =>
      struct(abs(element_at(col("__qv"), i + 1)).as("w"), lit(i).as("i"))): _*))
    def pow2(idx: Column): Column =
      (0 until bits).foldLeft(lit(0)) { case (acc, i) =>
        when(idx === i, lit(1 << i)).otherwise(acc)
      }
    val q0 = queries.select(col(qidCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__base", signBucket(col("__qv"), bits))
      .withColumn("__ord", ord)
    val probes = col("__base") +: (1 until nProbes).map(j =>
      col("__base").bitwiseXOR(pow2(col("__ord").getItem(j - 1).getField("i"))))
    val q = q0.withColumn("__probe", explode(array(probes: _*)))
      .select(col("query_id"), col("__qv"), col("__probe"))
    val sims = c.join(broadcast(q), Seq("__probe"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine_sim"))
  }

  /** IVF-style bucketed top-k: like [[knnBrute]] but candidates must
    * share `bucketCol` with the query — the join keys on the bucket.
    */
  def knnBucketed(queries: DataFrame, corpus: DataFrame, qidCol: String,
                  idCol: String, vecCol: String, bucketCol: String,
                  k: Int = 10): DataFrame = {
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("__qv"),
      col(bucketCol).as("__bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      col(bucketCol).as("__bucket"))
    val sims = c.join(broadcast(q), Seq("__bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine_sim"))
  }
}
