package graft.queries

import graft.Tables
import graft.streaming.Streams

/** Driver-gate entries that run REAL Structured Streaming jobs (MemoryStream
  * source → typed keyed state → update-mode memory sink) and land on a
  * batch-verifiable result: after all input is consumed, the per-key
  * running state must equal the batch aggregate — so the DuckDB oracle is
  * plain SQL. Per-element emission traces are asserted in the ScalaTest
  * suites (single-element batches); here the whole input is one batch.
  */
object StreamQueries {

  val all: Map[String, GraftQuery] = Map(

    // ---- the WordCount end-to-end spec (ref: WordCount.java:14-35) run as
    // a streaming job; final state == batch counts.
    "q_stream_wordcount" -> GraftQuery.sql(
      "streaming WordCount (flatMap→filter→keyBy→running reduce), final state",
      """SELECT w AS word, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(lower(text), '\W+')) AS w FROM documents)
        |WHERE length(w) >= 4 GROUP BY w""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val texts = Tables(spark, dir).documents
        .select("text").as[String].collect().toSeq
      Streams.wordCount(spark, Seq(texts),
        s"stream_wc_${System.nanoTime()}")
    }
  )
}
