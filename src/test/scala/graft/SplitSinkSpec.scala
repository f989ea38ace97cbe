package graft

import graft.streaming.Streams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** Split/side-output + file-source rate limiting: the scale properties of
  * the new streaming gates that the oracle compare can't see.
  */
class SplitSinkSpec extends AnyFunSuite with TestSession {

  test("q_split_sink: branch writes reuse one scan (second write hits the cache)") {
    // capture every executed write plan during the gate; the clean branch
    // scans the staged files, the flagged branch of the SAME batch must
    // read InMemoryTableScan — a file re-scan per branch would double
    // ingest I/O at scale
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = SparkEntry.queries("q_split_sink")(spark, sfDir)
      val n = result.count()
      assert(n == 500, s"split must cover every doc once, got $n")
      // listener callbacks are async: wait for the write plans to land
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def writes = {
        import scala.jdk.CollectionConverters._
        plans.asScala.filter(p =>
          p.contains("InsertIntoHadoopFsRelationCommand") ||
            p.contains("WriteFiles"))
      }
      while (writes.size < 8 && System.nanoTime() < deadline) Thread.sleep(100)
      val w = writes.toSeq
      assert(w.size >= 8, s"expected 2 branch writes x 4 batches, saw ${w.size}")
      val cachedWrites = w.count(_.contains("InMemoryTableScan"))
      assert(cachedWrites >= w.size / 2,
        s"branch writes must reuse the persisted batch frame, " +
          s"only $cachedWrites/${w.size} read the cache")
    } finally spark.listenerManager.unregister(listener)
  }

  test("file source: maxFilesPerTrigger paces ingestion into bounded micro-batches") {
    // the G2 rate-knob analog: 4 staged files at 1 file/trigger must
    // arrive as 4 micro-batches, each no larger than the biggest file
    val name = Streams.fresh("ratelimit", sfDir)
    val docs = Tables(spark, sfDir).documents.select(col("doc_id"))
    val total = docs.count()
    val src = Streams.stagedFileStream(spark, docs, name, files = 4)
    // count per batch INSIDE foreachBatch: a sink that doesn't consume the
    // batch frame never pulls source rows, so progress-side numInputRows
    // would read 0 — the authoritative cadence is what each batch delivers
    val batchRows = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = src.writeStream
      .foreachBatch { (df: DataFrame, _: Long) => batchRows.add(df.count()); () }
      .option("checkpointLocation", Streams.ckpt(name))
      .start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val batches = batchRows.asScala.toSeq.filter(_ > 0)
    assert(batches.length == 4,
      s"4 files at maxFilesPerTrigger=1 must be 4 batches, got $batches")
    assert(batches.sum == total, "rate limiting must not drop or duplicate rows")
    assert(batches.max <= total / 4 + total / 8,
      s"per-trigger input must stay near one file's rows, got max=${batches.max}")
  }
}
