package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store backend selection for the stateful streaming operators
  * ([[SessionizeStream]], [[StreamJoin]], [[DedupStream]],
  * [[MonthlySlices]]).
  *
  * Why this exists (the 100 TB rationale): the default
  * `HDFSBackedStateStoreProvider` keeps EVERY key of a state store
  * partition in an on-heap `HashMap`, with the previous version retained
  * for snapshot diffing — so executor heap bounds total state. At
  * 100 TB/day ingest, a dedup-within-watermark store or a wide
  * stream-stream join easily holds 10⁸–10⁹ keys per executor; on-heap
  * that is GC death, on RocksDB it is cold SST files on local disk with
  * a bounded block cache. `RocksDBStateStoreProvider` (ships with Spark,
  * `rocksdbjni` included) keeps state off-heap + on-disk, so state size
  * is bounded by DISK, and memory by the configured cache — the only
  * backend that survives state ≫ RAM.
  *
  * Changelog checkpointing is enabled by default here: without it every
  * commit uploads RocksDB SST snapshots to the checkpoint location; with
  * it only the per-batch changelog ships and snapshots upload in the
  * background maintenance thread — commit latency stays flat as state
  * grows (the snapshot upload cost moves off the critical path).
  *
  * Everything below is plain public Spark configuration
  * (`spark.sql.streaming.stateStore.*`) — this helper only bundles the
  * names, defaults, and a scoped setter so specs can run the same query
  * on both backends.
  */
object StateBackend {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Spark's default on-heap provider (state must fit in executor RAM —
    * fine for tests and small watermark windows, wrong at corpus scale).
    */
  val HdfsBackedProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksPrefix = "spark.sql.streaming.stateStore.rocksdb."

  /** Session configs selecting RocksDB with scale-sane defaults.
    *
    * @param boundedMemoryMB if > 0, cap TOTAL RocksDB memory (block
    *        cache + memtables, across every state store instance on the
    *        executor) at this many MB. Unbounded RocksDB memory on an
    *        executor hosting hundreds of store partitions is the classic
    *        OOM-outside-the-heap failure; production jobs should always
    *        set this to a slice of `spark.executor.memoryOverhead`.
    * @param changelogCheckpointing upload per-batch changelogs instead
    *        of SST snapshots on commit (snapshots move to background
    *        maintenance).
    */
  def rocksDbConfigs(boundedMemoryMB: Long = 0,
                     changelogCheckpointing: Boolean = true): Map[String, String] = {
    val base = Map(
      ProviderKey -> RocksDbProvider,
      s"${RocksPrefix}changelogCheckpointing.enabled" ->
        changelogCheckpointing.toString)
    if (boundedMemoryMB > 0) base ++ Map(
      s"${RocksPrefix}boundedMemoryUsage" -> "true",
      s"${RocksPrefix}maxMemoryUsageMB" -> boundedMemoryMB.toString)
    else base
  }

  /** Run `body` with the given state-store configs set on the session,
    * restoring the prior values afterwards. The provider class is read
    * at STREAM START from the session conf, so scoping the conf around
    * `query.start()` is sufficient; an already-running query keeps the
    * provider it started with (and a restarted checkpoint must keep its
    * original provider — Spark validates provider changes across
    * restarts via the state schema/metadata files).
    */
  def withStateBackend[A](spark: SparkSession, configs: Map[String, String])
                         (body: => A): A = {
    val prior = configs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    configs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** [[withStateBackend]] specialised to RocksDB with defaults. */
  def withRocksDb[A](spark: SparkSession, boundedMemoryMB: Long = 0)
                    (body: => A): A =
    withStateBackend(spark, rocksDbConfigs(boundedMemoryMB))(body)
}
