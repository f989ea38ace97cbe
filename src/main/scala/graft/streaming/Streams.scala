package graft.streaming

import graft.operators.{GraftStream, KeyedGraftStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Structured Streaming drivers for the reference's continuously-emitting
  * pipelines (SURVEY.md §3: source → keyed running state → update sink).
  *
  * The reference runs an always-on mailbox loop per task
  * (`MailboxProcessor.java:158`); the Spark-native equivalent is
  * micro-batch execution — each trigger re-runs the incremental plan and
  * the state store carries keyed state across batches
  * (≙ HeapKeyedStateBackend, but spillable/checkpointable RocksDB here,
  * required at 100 TB key cardinality).
  */
object Streams {

  /** The WordCount pipeline (the reference's single executable spec,
    * `WordCount.java:14-35`: fromElements → flatMap → filter → keyBy →
    * running reduce → sink), run as a real Structured Streaming job over a
    * MemoryStream source.
    *
    * Feeding one batch per element reproduces the reference's per-element
    * emission trace exactly (SURVEY.md §7.4.1); feeding all elements in
    * one batch yields one final update per key. Returns the memory sink's
    * update log (one row per (key, updated running count) per batch).
    */
  def wordCount(spark: SparkSession, batches: Seq[Seq[String]],
      queryName: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val counts = new GraftStream(source.toDS())
      .flatMap(_.toLowerCase.split("\\W+").toSeq)
      .filter(w => w.length >= 4)
      .keyBy(identity[String])
      .kv.mapValues(_ => 1L)
    val running = new KeyedGraftStream(counts).runningReduce(_ + _)
    val query = running
      .toDF("word", "cnt")
      .writeStream
      .queryName(queryName)
      .outputMode("update")
      .format("memory")
      .option("checkpointLocation",
        s"/tmp/graft-ckpt/$queryName-${System.nanoTime()}")
      .start()
    // One processAllAvailable per addData = one micro-batch per feed step.
    batches.foreach { b =>
      source.addData(b)
      query.processAllAvailable()
    }
    query.stop()
    spark.table(queryName)
  }
}
