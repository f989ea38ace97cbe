package graft.examples

import graft.{Engine, Tables}
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (dev-only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-scratch")
    val li = Tables(spark, sfDir).lineitem
    val base = li.groupBy(col("l_returnflag"), col("l_linestatus"))

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[scratch] $tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    time("sum-long") {
      base.agg(
        call_function("scaled_double",
          sum(call_function("dec_scaled", col("l_extendedprice") * (lit(1) - col("l_discount")), lit(6))),
          lit(6)).as("c"))
    }
    time("sum-dec38") {
      base.agg(
        (sum(call_function("dec_scaled", col("l_extendedprice") * (lit(1) - col("l_discount")), lit(6))
          .cast("decimal(38,0)")).cast("double") / 1e6).as("c"))
    }
    time("sum-double") {
      base.agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"))
    }
    spark.stop()
  }
}
