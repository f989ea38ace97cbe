package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join / ranking / top-k queries.
  *
  * All join kinds are ABSENT from the reference (SURVEY.md §2.4 — no
  * TwoInputStreamOperator exists); they are first-class built-ins here.
  * Scale notes: dimension tables (region/nation/customer/supplier/part) are
  * broadcast explicitly — at 100 TB the fact tables shuffle on join keys and
  * the dims must never shuffle. Big-big joins rely on AQE (skew-join
  * splitting + partition coalescing) which Engine.configure enables.
  */
object JoinQueries {
  import CoreQueries.dsum

  /** Session confs under which q_join_skew_aqe runs: broadcast disabled
    * so the shuffle-join skew machinery is actually exercised (the 150-row
    * dim would otherwise broadcast and there'd be no shuffle to skew), and
    * the skew/advisory byte thresholds scaled from their 256 MB/64 MB
    * cluster defaults down to gate-sized shuffles — the SAME dial a real
    * deployment sets relative to its executor memory, not a semantics
    * change. Shared with PlanSpec so the pinned plan runs under exactly
    * the gate's configuration. */
  private[graft] val SKEW_AQE_CONFS: Seq[(String, String)] = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16kb",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16kb")

  /** The q_join_skew_aqe frame WITHOUT materialization, exposed so the
    * PlanSpec pin can execute it under [[SKEW_AQE_CONFS]] and assert the
    * final adaptive plan actually split the skewed partition. ~75% of
    * lineitem rows land on join key 0; the dim is a fixed 150-row frame
    * covering every key, so the hot key is a genuine shuffle-side skew. */
  private[graft] def skewAqeJoined(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // AQE can only split a skewed reduce partition at MAP-output
    // boundaries (createSkewPartitionSpecs groups per-mapper byte
    // ranges): the single tiny test parquet file scans as ONE map task,
    // whose hot-key output is then atomic — no split possible no matter
    // the thresholds. A 100 TB fact table has thousands of mappers; the
    // round-robin repartition stands in for that multi-mapper map side.
    val fact = t.lineitem
      .repartition(spark.sparkContext.defaultParallelism)
      .select(
        when(col("l_orderkey") % 4 > 0, lit(0L))
          .otherwise(col("l_orderkey") % 89 + 1).as("sk"),
        col("l_extendedprice").as("price"))
    // fixed-size dim at every SF (custkey ≤ 150 exists from sf0.001 up),
    // covering all 97 key residues so the hot key joins non-trivially
    val dim = t.customer.filter(col("c_custkey") <= 150)
      .select((col("c_custkey") % 97).as("sk"), col("c_nationkey"))
    fact.join(dim, "sk")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), dsum(col("price"), 4).as("total"))
  }

  val all: Map[String, GraftQuery] = Map(

    // ---- AQE skew-join splitting, demonstrated end to end: the manual
    // salting pattern (q_skew_salted) is what you write when you KNOW the
    // hot key; this gate is the runtime answer for when you don't — AQE
    // measures the map output, finds the partition holding the hot join
    // key (~75% of the fact side here), splits it into
    // advisory-size chunks and duplicates the matching dim rows per chunk.
    // PlanSpec executes the same frame under the same confs and pins
    // "skew=true" in the FINAL adaptive plan, so the gate can't silently
    // degrade into an unsplit (or broadcast) join. Materialized inside the
    // conf scope (Scratch.checkpoint) so AQE sees the gate's thresholds.
    // The aggregation key (c_nationkey) deliberately differs from the
    // join key: OptimizeSkewedJoin declines to split when downstream
    // reuse requires the join's hash partitioning.
    "q_join_skew_aqe" -> GraftQuery.sql(
      "AQE skew-join split: hot-key fact x full-coverage dim, post-join rollup",
      """WITH f AS (
        |  SELECT CASE WHEN l_orderkey % 4 > 0 THEN 0
        |              ELSE l_orderkey % 89 + 1 END AS sk,
        |         l_extendedprice AS price
        |  FROM lineitem),
        |d AS (SELECT c_custkey % 97 AS sk, c_nationkey FROM customer
        |      WHERE c_custkey <= 150)
        |SELECT c_nationkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(price AS DECIMAL(28,4))) AS DOUBLE) AS total
        |FROM f JOIN d USING (sk)
        |GROUP BY c_nationkey""".stripMargin) { (spark, dir) =>
      GraftQuery.withConfs(spark, SKEW_AQE_CONFS: _*) {
        Scratch.checkpoint(skewAqeJoined(spark, dir))
      }
    },

    // ---- typed cogroup (the Flink coGroup/connect shape, SURVEY.md §2.4):
    // both sides shuffle+sort on the key once, then the lambda sees the two
    // per-key iterators together — the escape hatch for per-key logic a
    // join + aggregate can't express. The key predicate is applied to BOTH
    // sides before the shuffle (join-key equality makes them equivalent) —
    // at 100 TB the big side must never shuffle rows the other side will
    // drop. The exact sum folds scaled longs (GraftExpressions.decScaled
    // ≡ CAST AS DECIMAL(28,4)) so the typed path keeps the oracle's
    // decimal-exact semantics.
    "q_cogroup" -> GraftQuery.sql(
      "typed cogroup customer×orders on custkey: per-customer order rollup",
      """SELECT c.c_custkey, c.c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE c.c_custkey % 10 = 0
        |GROUP BY c.c_custkey, c.c_mktsegment""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val t = Tables(spark, dir)
      val c = t.customer.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_mktsegment")).as[(Long, String)]
      val o = t.orders.filter(col("o_custkey") % 10 === 0)
        .select(col("o_custkey"), col("o_totalprice")).as[(Long, Double)]
      c.groupByKey(_._1).cogroup(o.groupByKey(_._1)) { (k, cs, os) =>
        if (!cs.hasNext) Iterator.empty
        else {
          val seg = cs.next()._2
          var n = 0L
          var acc = 0L
          os.foreach { case (_, p) =>
            n += 1
            acc = Math.addExact(acc, graft.functions.GraftExpressions.decScaled(p, 4))
          }
          if (n == 0) Iterator.empty
          else Iterator((k, seg, n,
            graft.functions.GraftExpressions.scaledToDouble(acc, 4)))
        }
      }.toDF("c_custkey", "c_mktsegment", "n_orders", "total")
    },

    // ---- broadcast join chain: fact -> dims (customer, nation, region all
    // broadcast; only orders avoids a shuffle entirely).
    "q_join_broadcast" -> GraftQuery.sql(
      "orders ⋈ customer ⋈ nation ⋈ region, dims broadcast, revenue per region",
      """SELECT r_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    },

    // ---- shuffle (sort-merge/hash) join of the two big tables; at scale
    // both sides hash-partition on orderkey and AQE handles skew.
    "q_join_shuffle" -> GraftQuery.sql(
      "lineitem ⋈ orders on orderkey (big-big shuffle join)",
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |GROUP BY o_orderpriority""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .join(t.orders.filter(col("o_orderdate") >= lit("1995-01-01 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_orderkey")).as("n_orders"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
    },

    // ---- semi join (EXISTS).
    "q_semi_join" -> GraftQuery.sql(
      "customers having at least one big order (left semi)",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders.filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    // ---- anti join (NOT EXISTS).
    "q_anti_join" -> GraftQuery.sql(
      "customers with no order above 450k (left anti)",
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders.filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
    },

    // ---- the TPC-H Q5 shape: a six-table star with a LOCAL-supplier
    // correlation (c_nationkey = s_nationkey ties two dimension arms
    // together through the fact) and a selective date filter — the
    // canonical multi-join planning exercise. The plan a 100 TB run
    // needs: the date filter pushes into the orders scan BEFORE the
    // lineitem join (volume cut first), the two big tables shuffle once
    // on orderkey, and all four dimension arms broadcast — the fact
    // rows never move for dim enrichment; the nationkey correlation
    // rides the broadcast joins as an extra equality, not a new
    // shuffle. Revenue folds through exact decimals (q1_agg's idiom).
    "q_star_join" -> GraftQuery.sql(
      "TPC-H Q5 shape: regional local-supplier revenue, one year, six tables",
      """SELECT n_name, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |             AND c_nationkey = s_nationkey
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN region ON r_regionkey = n_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("c_custkey") === col("o_custkey"))
        .join(broadcast(t.supplier),
          col("s_suppkey") === col("l_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t.nation), col("n_nationkey") === col("s_nationkey"))
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
            .as("revenue"))
    },

    // ---- NOT IN under three-valued logic: the classic correctness trap
    // both engines must agree on. `x NOT IN (subquery)` is UNKNOWN (not
    // FALSE) whenever the subquery contains a NULL — one NULL in a
    // billion-row exclusion list silently empties the whole result, the
    // bug that ships when an anti-join is written as NOT IN against a
    // nullable column. The gate pins the cliff edge from both sides:
    // the same high-value exclusion list (q_anti_join's), one with an
    // injected NULL (0 survivors, ANSI-correct and counter-intuitive)
    // and one NULL-free (the true anti-join count, hundreds of rows). Planner note: Spark rewrites NOT IN as a null-aware
    // anti join — at scale the null check rides the join, there is no
    // per-row subquery re-execution.
    "q_not_in_null" -> GraftQuery.sql(
      "NOT IN three-valued logic: a NULL in the list empties the result",
      """SELECT
        |  (SELECT COUNT(*) FROM customer
        |   WHERE c_custkey NOT IN (
        |     SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
        |                 ELSE o_custkey END
        |     FROM orders WHERE o_totalprice > 450000
        |        OR o_orderkey % 1000 = 0)) AS n_with_null,
        |  (SELECT COUNT(*) FROM customer
        |   WHERE c_custkey NOT IN (
        |     SELECT o_custkey FROM orders
        |     WHERE o_totalprice > 450000)) AS n_filtered""".stripMargin) {
      (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders.createOrReplaceTempView("graft_nin_orders")
      t.customer.createOrReplaceTempView("graft_nin_customer")
      spark.sql(
        """SELECT
          |  (SELECT COUNT(*) FROM graft_nin_customer
          |   WHERE c_custkey NOT IN (
          |     SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
          |                 ELSE o_custkey END
          |     FROM graft_nin_orders WHERE o_totalprice > 450000
          |        OR o_orderkey % 1000 = 0)) AS n_with_null,
          |  (SELECT COUNT(*) FROM graft_nin_customer
          |   WHERE c_custkey NOT IN (
          |     SELECT o_custkey FROM graft_nin_orders
          |     WHERE o_totalprice > 450000)) AS n_filtered""".stripMargin)
    },

    // ---- left outer join + null handling.
    "q_outer_join" -> GraftQuery.sql(
      "customer left join order-aggregates, missing -> 0",
      """SELECT c_custkey,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(total, CAST(0 AS DOUBLE)) AS total
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
        |  FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      val oagg = t.orders.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      t.customer
        .join(oagg, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("total"), lit(0.0)).as("total"))
    },

    // ---- bucketed co-located join: both fact tables written bucketed on
    // the join key (8 buckets, sorted) — the sort-merge join then needs NO
    // shuffle on either side (see PlanSpec). This is the 100 TB pattern
    // for repeated big-big joins: pay the partitioning once at write time,
    // reuse it across every downstream join. Oracle = the plain join.
    // ---- dynamic partition pruning: a partitioned fact dir joined to a
    // filtered tiny dim — Catalyst injects the dim's surviving keys as a
    // runtime partition filter on the fact scan (reusing the broadcast),
    // so the fact read touches 2/5 of the partition directories without
    // any static predicate on the fact side. THE star-schema scan killer
    // at 100 TB: the filter that matters lives on the dimension, and DPP
    // transplants it to the fact's partition pruning at runtime.
    // PlanSpec pins `dynamicpruning` inside the scan's PartitionFilters.
    "q_join_dpp" -> GraftQuery.sql(
      "partitioned fact ⋈ filtered dim -> runtime partition pruning (DPP)",
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value * CASE event_type WHEN 'purchase' THEN 2.0
        |                                        ELSE 0.5 END
        |       AS DECIMAL(28,6))) AS DOUBLE) AS weighted
        |FROM events
        |WHERE event_type IN ('purchase', 'click')
        |GROUP BY event_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val path = SourceQueries.partitionedEventsPath(spark, dir)
      // the dim must be a FILTERED scan (not a pre-pruned LocalRelation —
      // constant folding would erase the selective predicate the DPP rule
      // keys on), so land it and read it back with the filter
      val dimPath = SourceQueries.dppDimPath(spark, dir)
      val dim = spark.read.parquet(dimPath)
        .filter(col("d_type").isin("purchase", "click"))
      spark.read.parquet(path)
        .join(broadcast(dim), col("event_type") === col("d_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value") * col("weight"), 6).as("weighted"))
    },

    "q_join_bucketed" -> GraftQuery.sql(
      "lineitem ⋈ orders via bucketed tables (shuffle-free sort-merge)",
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      val sfx = java.lang.Integer.toHexString(dir.hashCode)
      val (li, ord) = (s"li_bucketed_$sfx", s"ord_bucketed_$sfx")
      if (!spark.catalog.tableExists(li)) {
        // Files from a previous session survive while the in-memory
        // catalog does not: re-register them as external bucketed tables
        // (the ETL cost is paid once, the bucketing reused forever — the
        // actual point of bucketing); only build from scratch on first run.
        val wh = "/tmp/graft-warehouse"
        val marker = java.nio.file.Paths.get(s"$wh/$li/_SUCCESS")
        if (java.nio.file.Files.exists(marker)) {
          def register(name: String, src: org.apache.spark.sql.DataFrame,
              key: String): Unit = {
            val cols = src.schema.fields
              .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
            spark.sql(
              s"""CREATE TABLE $name ($cols) USING parquet
                 |CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
                 |LOCATION '$wh/$name'""".stripMargin)
          }
          register(li, t.lineitem, "l_orderkey")
          register(ord, t.orders, "o_orderkey")
        } else {
          t.lineitem.write.format("parquet").bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey").mode("overwrite").saveAsTable(li)
          t.orders.write.format("parquet").bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey").mode("overwrite").saveAsTable(ord)
        }
      }
      spark.table(li)
        .join(spark.table(ord), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
    },

    // ---- interval (range) join: same-user event pairs within 30 minutes.
    // The naive plan is a nested-loop over every same-user pair; instead
    // both sides are BUCKETED by time (floor(ts / 30min)) and the stream
    // side explodes to its own and the next bucket — any qualifying pair
    // (0 < Δt ≤ 30min) lands in exactly one (user, bucket) equi-join cell,
    // so Spark executes a plain shuffle hash join and the candidate set is
    // linear in the data, not quadratic. This is the standard range-join
    // blocking trick (Databricks' range-join optimization does the same
    // under the hood); at 100 TB the join shuffles on (user_id, bucket)
    // and skewed users split via AQE.
    "q_interval_join" -> GraftQuery.sql(
      "same-user event pairs within 30 minutes (bucketed range join)",
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
        |SELECT a.user_id, COUNT(*) AS n_pairs
        |FROM ev a JOIN ev b
        |  ON a.user_id = b.user_id
        |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        |GROUP BY a.user_id""".stripMargin) { (spark, dir) =>
      val winUs = 30L * 60 * 1000 * 1000 // 30 min in microseconds
      val e = Tables(spark, dir).events
        .select(col("user_id"), unix_micros(col("ts")).as("t"))
      val left = e.select(col("user_id"), col("t").as("ta"),
        explode(array(expr(s"t div $winUs"), expr(s"t div $winUs") + 1L))
          .as("bk"))
      val right = e.select(col("user_id").as("user_b"), col("t").as("tb"),
        expr(s"t div $winUs").as("bk_b"))
      left.join(right,
          col("user_id") === col("user_b") && col("bk") === col("bk_b")
            && col("tb") > col("ta") && col("tb") <= col("ta") + winUs)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
    },

    // ---- global sort + limit (absent in reference §2.4). Tie-break on the
    // unique key makes the top-k SET deterministic. Spark plans this as
    // TakeOrderedAndProject — per-partition top-k then driver merge, no
    // global sort shuffle: exactly what survives at 100 TB.
    "q_topk" -> GraftQuery.sql(
      "top 10 customers by account balance",
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).customer
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_name", "c_acctbal")
    },

    // ---- per-group top-n via rank window (scales: one shuffle on the
    // partition key, no global sort).
    "q_window_topn" -> GraftQuery.sql(
      "top 3 parts by retail price per brand",
      """SELECT p_brand, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |                       ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) WHERE rn <= 3""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables(spark, dir).part
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    },

    // ---- rank/dense_rank analytics.
    "q_rank_window" -> GraftQuery.sql(
      "rank + dense_rank of customers by balance within market segment",
      """SELECT c_mktsegment, c_custkey,
        |  rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
        |  dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk
        |FROM customer WHERE c_acctbal > 9500""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc)
      Tables(spark, dir).customer
        .filter(col("c_acctbal") > 9500)
        .select(
          col("c_mktsegment"), col("c_custkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
    }
  )
}
