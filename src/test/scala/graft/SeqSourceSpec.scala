package graft

import graft.sources.{SeqBatch, SeqInputPartition, SeqOptions}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 custom source (reference S2, `SourceFunction.java:29-52` as a
  * V2 connector): batch + streaming reads, partition planning, admission
  * control, and restart recovery over one checkpoint. */
class SeqSourceSpec extends AnyFunSuite with TestSession {

  test("batch read: full range, exact and duplicate-free") {
    val df = spark.read.format("graft-seq")
      .option("start", "10").option("end", "1010")
      .option("numPartitions", "7").load()
    assert(df.count() == 1000)
    assert(df.distinct().count() == 1000)
    val mm = df.agg(
      org.apache.spark.sql.functions.min("id"),
      org.apache.spark.sql.functions.max("id")).head()
    assert(mm.getLong(0) == 10 && mm.getLong(1) == 1009)
  }

  test("slice planning: contiguous, complete, no empties") {
    val slices = SeqBatch.slices(0, 10, 4).map(_.asInstanceOf[SeqInputPartition])
    assert(slices.head.lo == 0 && slices.last.hi == 10)
    slices.sliding(2).foreach { case Array(a, b) => assert(a.hi == b.lo) }
    assert(SeqBatch.slices(0, 2, 8).length == 2) // n > range: empties dropped
    assert(SeqBatch.slices(5, 5, 4).isEmpty)     // empty range plans nothing
  }

  test("options: missing end / bad rate / bad keys fail at analysis time") {
    intercept[IllegalArgumentException] {
      SeqOptions.from(java.util.Map.of("rowsPerBatch", "5"))
    }
    intercept[IllegalArgumentException] {
      SeqOptions.from(java.util.Map.of("end", "10", "rowsPerBatch", "0"))
    }
    intercept[IllegalArgumentException] {
      SeqOptions.from(java.util.Map.of("end", "10", "keys", "0"))
    }
  }

  test("payload columns are pure functions of the index") {
    val r = spark.read.format("graft-seq")
      .option("start", "1001").option("end", "1002").option("keys", "10")
      .load().head()
    assert(r.getLong(0) == 1001L)
    // 2024-01-01T00:00:00Z + 1001 s
    assert(r.getTimestamp(1).getTime == 1704067200000L + 1001L * 1000L)
    assert(r.getLong(2) == 1001L % 10)              // key = id % keys
    assert(r.getDouble(3) == (1001L % 1000L) / 10.0) // value
  }

  test("column pruning reaches the scan: only required fields survive") {
    val df = spark.read.format("graft-seq").option("end", "10").load()
    val scan = df.select("key").queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) == Seq("key"),
      s"scan should emit only the pruned column, got ${scan.output}")
    assert(df.select("key").distinct().count() == 10)
  }

  test("streaming: restart resumes after last commit as the source head grows") {
    val name = s"seq-recovery-${System.nanoTime()}"
    val out = s"/tmp/graft-seq-spec/$name/out"
    val ckpt = s"/tmp/graft-seq-spec/$name/ckpt"

    def drain(end: Long): Unit = {
      val q = spark.readStream.format("graft-seq")
        .option("end", end.toString).option("rowsPerBatch", "100")
        .option("numPartitions", "4").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000), "AvailableNow must self-terminate")
    }

    // three cold runs over ONE checkpoint, the source head growing between
    // runs (the backfill-then-catch-up shape): each run must resume from
    // the offset LOG (deserializeOffset), not driver memory, landing
    // exactly the new [end-100, end) slice
    Seq(100L, 200L, 300L).foreach { end =>
      drain(end)
      assert(spark.read.parquet(out).count() == end,
        s"run to end=$end should land exactly the newly available rows")
    }

    // restart once more and drain the remaining [300, 1000): no
    // duplicates, no gaps
    val q = spark.readStream.format("graft-seq")
      .option("end", "1000").option("rowsPerBatch", "100")
      .option("numPartitions", "4").load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 1000)
    assert(got.select("id").distinct().count() == 1000)
  }

  test("Trigger.Once's ReadAllAvailable overrides the rate knob and drains in one batch") {
    val name = s"seq-once-${System.nanoTime()}"
    val out = s"/tmp/graft-seq-spec/$name/out"
    val q = spark.readStream.format("graft-seq")
      .option("end", "1000").option("rowsPerBatch", "100")
      .option("numPartitions", "4").load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", s"/tmp/graft-seq-spec/$name/ckpt")
      .trigger(Trigger.Once())
      .start()
    q.awaitTermination()
    // one trigger, full range: ReadAllAvailable ≡ Kafka ignoring
    // maxOffsetsPerTrigger under Trigger.Once
    assert(spark.read.parquet(out).count() == 1000)
  }

  test("Trigger.AvailableNow drains the range in rate-limited batches, then terminates") {
    val name = s"seq-availnow-${System.nanoTime()}"
    val out = s"/tmp/graft-seq-spec/$name/out"
    val q = spark.readStream.format("graft-seq")
      .option("end", "500").option("rowsPerBatch", "200")
      .option("numPartitions", "4").load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", s"/tmp/graft-seq-spec/$name/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow must self-terminate")
    val got = spark.read.parquet(out)
    assert(got.count() == 500 && got.distinct().count() == 500)
  }
}
