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
  def withShufflePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, old)
  }

  /** Non-SQL-expressible op — driver records a weaker rows-only check. */
  def rowsOnly(doc: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(run, None, doc)
}
