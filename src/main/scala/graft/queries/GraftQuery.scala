package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark query over the TESTDATA tables
  * plus (when SQL-expressible) the equivalent ANSI SQL for the DuckDB
  * oracle. Column names are part of the contract — the driver's compare
  * sorts columns by name before hashing, so every computed column is
  * aliased identically on both sides.
  *
  * Float determinism rule: any aggregate over doubles is computed by
  * casting the per-row double expression to DECIMAL and summing exactly,
  * then casting the exact sum back to DOUBLE. Per-row IEEE-754 arithmetic
  * is identical across engines; only aggregation *order* differs, and
  * decimal sums are order-insensitive — so the result is bit-identical in
  * Spark and DuckDB regardless of partitioning.
  */
final case class GraftQuery(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object GraftQuery {
  def sql(doc: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(run, Some(oracle), doc)

  /** Run `body` with a temporarily reduced shuffle-partition count, then
    * restore. For queries whose state is tiny relative to the session
    * default (streaming state stores instantiate ONE RocksDB per shuffle
    * partition; iterative loops pay per-stage scheduling on near-empty
    * partitions). Results are partitioning-invariant by construction —
    * asserted by the invariance tests. */
  def withShufflePartitions[A](spark: SparkSession, n: Int)(body: => A): A =
    withConfs(spark, "spark.sql.shuffle.partitions" -> n.toString)(body)

  /** Run `body` with temporary session-conf overrides, then restore.
    * Streaming queries read these at start(), so scoping them here gives
    * per-query control over knobs that are otherwise session-global
    * (state-store provider, shuffle partitions). */
  def withConfs[A](spark: SparkSession, kvs: (String, String)*)(body: => A): A = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** In-memory (HDFS-backed) state store scoped to one streaming gate
    * query: the right backend when per-partition state is tiny (these
    * gates hold ≤ a few thousand keys TOTAL). RocksDB — the session
    * default, and what a 100 TB deployment with large keyed state uses —
    * pays a native-DB open + checkpoint per store per batch, which at
    * kilobytes of state is pure overhead (a stream-stream join opens FOUR
    * stores per partition). Sizing the backend to the state volume is the
    * production decision; q_stream_wordcount keeps RocksDB to exercise
    * that path in the gate. */
  def withTinyStateStreaming[A](spark: SparkSession, partitions: Int)(body: => A): A =
    withConfs(spark,
      "spark.sql.shuffle.partitions" -> partitions.toString,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    )(body)

  /** Non-SQL-expressible op — driver records a weaker rows-only check. */
  def rowsOnly(doc: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(run, None, doc)
}
