package graft.examples

import graft.{Engine, Tables}
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (dev-only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-scratch")
    val orders = Tables(spark, sfDir).orders

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[scratch] $tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    time("distinct-half") {
      orders.groupBy(col("o_orderstatus")).agg(
        countDistinct(col("o_custkey")).as("exact_distinct"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_distinct"))
    }
    time("distinct-prededup") {
      val pairs = orders.select(col("o_orderstatus"), col("o_custkey")).distinct()
      pairs.groupBy(col("o_orderstatus")).agg(
        count(lit(1)).as("exact_distinct"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_distinct"))
    }
    time("pct-half") {
      orders.groupBy(col("o_orderstatus")).agg(
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50"),
        expr("percentile(o_totalprice, 0.5)").as("exact_p50"))
    }
    time("pct-approx-only") {
      orders.groupBy(col("o_orderstatus")).agg(
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50"))
    }
    time("pct-exact-window") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"))
      orders.select(col("o_orderstatus"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          count(lit(1)).over(Window.partitionBy(col("o_orderstatus"))).as("n"))
        .filter(col("rn") === (col("n") + 1) / 2 || col("rn") === col("n") / 2 + 1)
        .groupBy(col("o_orderstatus"))
        .agg(avg(col("o_totalprice")).as("exact_p50"))
    }
    spark.stop()
  }
}
