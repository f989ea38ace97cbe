package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev tool, not part of the query surface). */
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val orders = Tables(spark, dir).orders
    println(s"[profile] orders=${orders.count()}")
    time("warmup")(noop(orders.groupBy(col("o_orderstatus")).agg(count(lit(1)))))

    val g = orders.groupBy(col("o_orderstatus"))
    time("exact_distinct")(noop(g.agg(countDistinct(col("o_custkey")))))
    time("approx_distinct")(noop(g.agg(approx_count_distinct(col("o_custkey"), 0.02))))
    time("approx_p50")(noop(g.agg(expr("approx_percentile(o_totalprice, 0.5, 1000)"))))
    time("exact_p50")(noop(g.agg(expr("percentile(o_totalprice, 0.5)"))))
    time("all-four")(noop(g.agg(
      countDistinct(col("o_custkey")).as("exact_distinct"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx_distinct"),
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50"),
      expr("percentile(o_totalprice, 0.5)").as("exact_p50"))))
    time("all-four-again")(noop(g.agg(
      countDistinct(col("o_custkey")).as("exact_distinct"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx_distinct"),
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50"),
      expr("percentile(o_totalprice, 0.5)").as("exact_p50"))))

    def split(): org.apache.spark.sql.DataFrame = {
      val d = orders.groupBy(col("o_orderstatus")).agg(
        countDistinct(col("o_custkey")).as("exact_distinct"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_distinct"))
      val p = orders.groupBy(col("o_orderstatus")).agg(
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50"),
        expr("percentile(o_totalprice, 0.5)").as("exact_p50"))
      d.join(p, "o_orderstatus")
    }
    time("split-join-1")(noop(split()))
    time("split-join-2")(noop(split()))
    spark.stop()
  }
}
