package graft

import graft.operators.{GraftStream, KeyedGraftStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Fault tolerance: the reference deleted all of Flink's checkpointing
  * (SURVEY.md §0.3 — `runtime/checkpoint/` is 8 passive stubs). Here a
  * streaming query stopped mid-stream and restarted from its checkpoint
  * resumes with its keyed state intact — the engine-level capability the
  * reference lacks entirely, tested end-to-end. */
class CheckpointRecoverySpec extends AnyFunSuite with TestSession {

  test("running-reduce state survives query restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val ckpt = s"/tmp/graft-ckpt/recovery-${System.nanoTime()}"

    val seen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def startQuery() = {
      val keyed = new GraftStream(source.toDS())
        .keyBy(identity[String]).kv.mapValues(_ => 1L)
      new KeyedGraftStream(keyed).runningReduce(_ + _)
        .toDF("word", "cnt")
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => seen.put(r.getString(0), r.getLong(1)))
        }
        .start()
    }

    // epoch 1: count two words, then STOP the query
    val q1 = startQuery()
    source.addData("alpha", "beta", "alpha")
    q1.processAllAvailable()
    q1.stop()

    // epoch 2: new data arrives while no query is running
    source.addData("alpha", "beta")

    // restart from the same checkpoint: state must resume, not reset
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val updates = seen.asScala.toMap
    // alpha was 2 before the stop; the replayed/queued batch adds 1 -> 3
    assert(updates("alpha") == 3L, s"state reset on restart: $updates")
    assert(updates("beta") == 2L, s"state reset on restart: $updates")
  }
}
