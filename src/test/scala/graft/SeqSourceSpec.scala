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

  test("options: missing end / bad rate fail at analysis time") {
    intercept[IllegalArgumentException] {
      SeqOptions.from(java.util.Map.of("rowsPerBatch", "5"))
    }
    intercept[IllegalArgumentException] {
      SeqOptions.from(java.util.Map.of("end", "10", "rowsPerBatch", "0"))
    }
  }

  test("streaming: rate limit paces micro-batches; restart resumes after last commit") {
    val name = s"seq-recovery-${System.nanoTime()}"
    val out = s"/tmp/graft-seq-spec/$name/out"
    val ckpt = s"/tmp/graft-seq-spec/$name/ckpt"

    def start(trigger: Trigger) =
      spark.readStream.format("graft-seq")
        .option("end", "1000").option("rowsPerBatch", "100")
        .option("numPartitions", "4").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(trigger)
        .start()

    // three single-trigger runs: each admits exactly one 100-row batch,
    // with a cold connector instance per run — progress must come from the
    // checkpoint offset log (deserializeOffset), not driver memory
    (1 to 3).foreach { i =>
      val q = start(Trigger.Once())
      q.awaitTermination()
      assert(spark.read.parquet(out).count() == i * 100L,
        s"run $i should land exactly one 100-row batch")
    }

    // restart once more and drain: the remaining [300, 1000) arrives with
    // no duplicates and no gaps
    val q = start(Trigger.ProcessingTime(0))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 1000)
    assert(got.distinct().count() == 1000)
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
