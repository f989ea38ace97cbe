package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for the dedup pipelines (dev tool, not part of
  * the query surface). */
object NgramPlan {
  def main(args: Array[String]): Unit = {
    val spark = Engine.ready(Engine.configure(
      SparkSession.builder().master("local[32]").appName("profile"), 32)
      .getOrCreate())
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    time("warmup-q1_agg")(materialize("q1_agg"))
    time("simhash-1")(materialize("q_dedup_simhash"))
    time("simhash-2")(materialize("q_dedup_simhash"))
    time("minhash")(materialize("q_dedup_minhash"))
    time("ngram")(materialize("q_dedup_ngram"))
    time("clusters")(materialize("q_dedup_clusters"))
    time("embedding")(materialize("q_dedup_embedding"))
    time("exact")(materialize("q_dedup_exact"))
    spark.stop()
  }
}
