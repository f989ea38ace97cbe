package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Lifecycle contract of queries.Scratch — the round-5 bench-stability
  * mechanism. Gate-private localCheckpoint blocks must be freed
  * synchronously by release(); frames checkpointed OUTSIDE the tracker
  * (the memoized corpus caches) must survive it. */
class ScratchSpec extends AnyFunSuite with TestSession {

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("checkpoint tracks the materialized RDD and release frees it") {
    queries.Scratch.release(spark) // clean slate
    val before = persistedIds
    val df = queries.Scratch.checkpoint(
      spark.range(1000).select(col("id"), (col("id") * 2).as("x")))
    assert(df.count() == 1000)
    val added = persistedIds -- before
    assert(added.nonEmpty, "localCheckpoint should persist an RDD")
    assert(queries.Scratch.trackedCount >= 1)
    queries.Scratch.release(spark)
    assert(queries.Scratch.trackedCount == 0)
    assert((persistedIds & added).isEmpty,
      "release must synchronously unpersist tracked scratch blocks")
  }

  test("untracked checkpoints (shared caches) survive release") {
    queries.Scratch.release(spark)
    val before = persistedIds
    val shared = spark.range(100).select(col("id")).localCheckpoint()
    val sharedIds = persistedIds -- before
    assert(sharedIds.nonEmpty)
    // a tracked scratch frame alongside it
    queries.Scratch.checkpoint(spark.range(50).toDF())
    queries.Scratch.release(spark)
    assert((persistedIds & sharedIds) == sharedIds,
      "release must not touch frames checkpointed outside the tracker")
    assert(shared.count() == 100) // still materializable
  }

  test("released frames were private: a fresh gate invocation rebuilds") {
    // q_dedup_minhash builds a Scratch-tracked signature table; two
    // back-to-back runs with a release in between must both succeed and
    // agree — the release freed only per-invocation state.
    val q = SparkEntry.queries("q_dedup_minhash")
    val n1 = q(spark, sfDir).count()
    queries.Scratch.release(spark)
    val n2 = q(spark, sfDir).count()
    queries.Scratch.release(spark)
    assert(n1 == n2)
  }
}
