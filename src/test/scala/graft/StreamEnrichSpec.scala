package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming composition beyond the reference's surface: stream-static
  * enrichment joins (the dim side broadcasts into every micro-batch),
  * the rate source (load-generator S2 variant), and foreachBatch as a
  * transactional file sink. */
class StreamEnrichSpec extends AnyFunSuite with TestSession {

  test("stream-static join: each micro-batch enriched against a dim table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Tables(spark, sfDir).nation // static side
    val source = MemoryStream[Int]
    val name = s"enrich_${System.nanoTime()}"
    val q = source.toDS().toDF("n_nationkey")
      .join(broadcast(dim), "n_nationkey")
      .select("n_nationkey", "n_name")
      .writeStream.queryName(name).outputMode("append").format("memory")
      .option("checkpointLocation", s"/tmp/graft-ckpt/$name").start()
    source.addData(0, 1, 2)
    q.processAllAvailable()
    q.stop()
    val out = spark.table(name).collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.length == 3 && out.forall(_._2 != null))
  }

  test("rate source: produces monotonically increasing values under load") {
    val name = s"rate_${System.nanoTime()}"
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
      .writeStream.queryName(name).outputMode("append").format("memory")
      .option("checkpointLocation", s"/tmp/graft-ckpt/$name").start()
    try {
      q.processAllAvailable()
      Thread.sleep(1500)
      q.processAllAvailable()
    } finally q.stop()
    import spark.implicits._
    val vals = spark.table(name).select("value").as[Long].collect().sorted
    assert(vals.nonEmpty && vals.distinct.length == vals.length)
  }

  test("foreachBatch: streaming results land as parquet per epoch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Int]
    val out = s"/tmp/graft-test-io/fb-${System.nanoTime()}"
    val q = source.toDS().writeStream
      .option("checkpointLocation", s"$out-ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Int], epoch: Long) =>
        batch.toDF("v").withColumn("epoch", lit(epoch))
          .write.mode("append").parquet(out)
      }.start()
    source.addData(1, 2, 3)
    q.processAllAvailable()
    source.addData(4, 5)
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(out)
    assert(back.count() == 5)
    assert(back.select("epoch").distinct().count() == 2)
  }
}
