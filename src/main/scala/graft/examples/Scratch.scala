package graft.examples

import graft.{Engine, Tables}
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (dev-only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-scratch")
    val li = Tables(spark, sfDir).lineitem

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[scratch] $tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    val base = li
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))

    time("decimal") {
      base.agg(
        sum(col("l_quantity").cast("decimal(28,4)")).cast("double").as("a"),
        sum(col("l_extendedprice").cast("decimal(28,4)")).cast("double").as("b"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,6)")).cast("double").as("c"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).cast("decimal(28,6)")).cast("double").as("d"),
        count(lit(1)).as("n"))
    }
    time("double") {
      base.agg(
        sum(col("l_quantity")).as("a"),
        sum(col("l_extendedprice")).as("b"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("d"),
        count(lit(1)).as("n"))
    }
    time("scan-only") {
      base.agg(count(lit(1)).as("n"))
    }
    spark.stop()
  }
}
