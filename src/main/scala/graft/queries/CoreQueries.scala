package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Core relational/operator-parity queries (SURVEY.md §2.1).
  *
  * Each query exercises one operator row of the reference inventory,
  * re-expressed declaratively so Catalyst applies pushdown/pruning the
  * reference lacks entirely (SURVEY.md §4.1).
  */
object CoreQueries {

  /** Exact decimal sum of a double expression, returned as double —
    * order-insensitive, so bit-identical between Spark and DuckDB. */
  private def dsum(e: org.apache.spark.sql.Column, scale: Int = 4) =
    sum(e.cast(s"decimal(28,$scale)")).cast("double")

  val all: Map[String, GraftQuery] = Map(

    // ---- T4+T5+aggregation: the flagship TPC-H-Q1-style keyed aggregate.
    // Reference analog: keyBy + running reduce final state
    // (KeyedStream.java:206, StreamGroupedReduce.java:35-53).
    "q1_agg" -> GraftQuery.sql(
      "pricing summary: filter -> groupBy(2 keys) -> 6 aggregates",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
      li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          count(lit(1)).as("count_order"))
    }
  )
}
