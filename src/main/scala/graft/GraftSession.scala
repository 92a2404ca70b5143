package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session bootstrap for running graft at cluster scale.
  *
  * Defaults encode the 100 TB posture the operators assume:
  *  - AQE on (runtime re-plan), with skew-join splitting and post-shuffle
  *    partition coalescing — the safety net for hot keys and for the
  *    static `shuffle.partitions` guess being wrong at any one stage.
  *  - `spark.sql.extensions=graft.GraftExtensions` so the native sketch
  *    functions (`graft_dot`, `graft_shingles`, `graft_minhash`,
  *    `graft_simhash`) resolve in plain SQL.
  *  - UTC session timezone (calendar ops must not depend on driver locale).
  *
  * Sizing guidance (cluster-tunable, not hardcoded):
  *  - `spark.sql.shuffle.partitions`: ~2-3× total executor cores, and at
  *    least (largest shuffled stage input / ~200 MB) partitions so a
  *    partition fits executor memory; AQE coalesces the excess.
  *  - `spark.sql.files.maxPartitionBytes`: 128-256 MB — scan parallelism
  *    tracks the input, independent of the shuffle setting.
  *  - Broadcast threshold: raise only with executor heap; every operator
  *    here already broadcasts its genuinely-small sides explicitly.
  */
object GraftSession {

  /** Apply graft's scale defaults to a builder (pre-session). */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // Apply AQE to plans feeding persisted frames too — iterative operators
    // (connected components) cache small intermediates whose shuffles should
    // coalesce instead of running at the static partition count each round.
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    // Streaming state lives OFF-HEAP in RocksDB: the stateful operators
    // here key state by entity/user (EventCharts.streaks,
    // mapGroupsWithState), whose cardinality at 100 TB is unbounded — the
    // default in-heap HDFSBackedStateStore OOMs an executor long before
    // the data does. Changelog checkpointing uploads per-batch deltas
    // instead of full SST snapshots, keeping commit latency flat as state
    // grows.
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")

  def builder(appName: String = "graft"): SparkSession.Builder =
    tune(SparkSession.builder().appName(appName))

  /** Local development/test session ([[builder]] + local master). For an
    * ALREADY-running session (e.g. a shared notebook), session-level confs
    * apply but `spark.sql.extensions` cannot retroactively — call
    * [[GraftExtensions.register]] on it instead. */
  def local(cores: Int): SparkSession = {
    val s = builder("graft-local")
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }
}
