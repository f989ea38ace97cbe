package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Event-time semantics the reference plumbs but never exposes
  * (StreamSourceContexts.java:41-47 throws for anything but
  * ProcessingTime; SURVEY.md §0.2): here watermarks, event-time windows,
  * and event-time timers are first-class and deterministic under test
  * (watermark advancement is driven by fed data, not wall clock). */
class EventTimeSpec extends AnyFunSuite with TestSession {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("watermark + tumbling window: late data beyond watermark is dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String, Double)]
    val agg = source.toDF().toDF("ts", "k", "v")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("k"))
      .agg(sum("v").as("total"))
      .select(col("window.start").as("ws"), col("k"), col("total"))
    val name = s"evt_win_${System.nanoTime()}"
    val q = agg.writeStream.queryName(name).outputMode("update")
      .format("memory")
      .option("checkpointLocation", s"/tmp/graft-ckpt/$name").start()

    source.addData((ts(10), "a", 1.0), (ts(20), "a", 2.0))
    q.processAllAvailable()
    // advance watermark far past the first window (wm = 500-10 > 60)
    source.addData((ts(500), "b", 5.0))
    q.processAllAvailable()
    // this event is older than the watermark -> must be DROPPED
    source.addData((ts(15), "a", 100.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table(name).collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1), r.getDouble(2)))
    // window [0,60) for key a contains only the pre-watermark 3.0
    val aWindows = rows.filter(r => r._2 == "a")
    assert(aWindows.nonEmpty && aWindows.forall(_._3 <= 3.0),
      s"late row leaked into closed window: ${aWindows.toSeq}")
    // the drop is OBSERVABLE, not just inferable from absent output: the
    // state operator's progress metrics count the watermark-dropped rows
    // — what a production pipeline alerts on (silent late-data loss is
    // the classic streaming correctness incident)
    val dropped = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    assert(dropped >= 1,
      s"expected numRowsDroppedByWatermark >= 1, got $dropped")
  }

  test("event-time timer: state expires when watermark passes timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    // KeyedProcessFunction analog: buffer first-seen per key, emit
    // "<key>:expired" when the event-time timer fires
    val out = source.toDF().toDF("ts", "k")
      .withWatermark("ts", "0 seconds")
      .as[(Timestamp, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, String](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key: String, vs: Iterator[(Timestamp, String)], st: GroupState[Long]) =>
          if (st.hasTimedOut) { st.remove(); Iterator(s"$key:expired") }
          else {
            val maxTs = vs.map(_._1.getTime).max
            st.update(maxTs)
            st.setTimeoutTimestamp(maxTs + 30000) // 30s after last event
            Iterator(s"$key:seen")
          }
      }
    val name = s"evt_timer_${System.nanoTime()}"
    val q = out.writeStream.queryName(name).outputMode("update")
      .format("memory")
      .option("checkpointLocation", s"/tmp/graft-ckpt/$name").start()

    source.addData((ts(10), "a"))
    q.processAllAvailable()
    // watermark jumps to 500s >> a's timeout at 40s -> timer fires
    source.addData((ts(500), "b"))
    q.processAllAvailable()
    source.addData((ts(501), "b")) // one more batch so the timeout batch runs
    q.processAllAvailable()
    q.stop()

    val rows = spark.table(name).as[String].collect().toSeq
    assert(rows.contains("a:seen"))
    assert(rows.contains("a:expired"), s"timer never fired: $rows")
  }

  test("processing-time timer: idle key expires via KeyedGraftStream.process") {
    import graft.operators.GraftStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The OTHER timer family of the reference's timer service
    // (InternalTimerServiceImpl.java:169 registerProcessingTimeTimer):
    // wall-clock-driven expiry, driven through the production `process`
    // operator rather than raw flatMapGroupsWithState.
    val source = MemoryStream[String]
    val out = new GraftStream(source.toDS())
      .keyBy(identity[String])
      .process[Long, String](
        GroupStateTimeout.ProcessingTimeTimeout,
        onElements = (key, vs, st) => {
          val n = st.getOption.getOrElse(0L) + vs.size
          st.update(n)
          st.setTimeoutDuration(500) // idle-key expiry after 500 ms
          Iterator(s"$key:seen:$n")
        },
        onTimeout = (key, st) => { st.remove(); Iterator(s"$key:expired") })
    val name = s"proc_timer_${System.nanoTime()}"
    // 500 ms trigger cadence: with ProcessingTimeTimeout the engine ALWAYS
    // has a potential next batch (wall clock advances timers), so
    // processAllAvailable() can block indefinitely — the test POLLS the
    // sink instead, and paces batches to avoid a 0-interval busy loop.
    val q = out.writeStream.queryName(name).outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(500))
      .format("memory")
      .option("checkpointLocation", s"/tmp/graft-ckpt/$name").start()

    def sinkRows(): Seq[String] = spark.table(name).as[String].collect().toSeq
    def awaitRow(row: String, timeoutMs: Long): Boolean = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (System.currentTimeMillis() < deadline && !sinkRows().contains(row))
        Thread.sleep(100)
      sinkRows().contains(row)
    }

    source.addData("a")
    assert(awaitRow("a:seen:1", 30000), s"element never processed: ${sinkRows()}")
    // wall clock passes a's 500 ms idle timeout; timer-driven batches fire
    // on the trigger cadence with no further input needed
    assert(awaitRow("a:expired", 30000),
      s"processing-time timer never fired: ${sinkRows()}")
    q.stop()
  }

  test("stream split (OutputSelector analog): filter branches partition the stream") {
    import spark.implicits._
    val ds = spark.createDataset(1 to 100)
    val evens = ds.filter(_ % 2 == 0)
    val odds = ds.filter(_ % 2 == 1)
    assert(evens.count() + odds.count() == 100)
    assert(evens.collect().forall(_ % 2 == 0))
  }
}
