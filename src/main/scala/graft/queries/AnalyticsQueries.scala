package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Analytics operators beyond the reference's surface: as-of join, pivot,
  * exact percentiles, exact-sum correlation, and the salting pattern for
  * skewed aggregation. Determinism discipline as elsewhere: exact decimal
  * sums feeding single IEEE expressions; window formulations written
  * identically on both engines.
  */
object AnalyticsQueries {
  import CoreQueries.dsum

  private val byUserStrict = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))
    .rowsBetween(Window.unboundedPreceding, -1)

  val all: Map[String, GraftQuery] = Map(

    // ---- as-of join: each event picks up the most recent STRICTLY-PRIOR
    // 'click' of the same user. Composed from a cumulative window (one
    // shuffle on the key, no range join blowup) — the scalable as-of
    // formulation; DuckDB oracle is the identical window expression.
    "q_asof_join" -> GraftQuery.sql(
      "as-of join: latest prior click timestamp/value per event",
      """SELECT event_id, user_id,
        |  MAX(CASE WHEN event_type = 'click' THEN ts END) OVER w AS asof_click_ts,
        |  CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS BIGINT)
        |    AS clicks_before
        |FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .select(
          col("event_id"), col("user_id"),
          max(when(col("event_type") === "click", col("ts")))
            .over(byUserStrict).as("asof_click_ts"),
          count(when(col("event_type") === "click", lit(1)))
            .over(byUserStrict).as("clicks_before"))
    },

    // ---- pivot: event_type -> columns (conditional aggregation under the
    // hood; oracle spells exactly that).
    "q_pivot" -> GraftQuery.sql(
      "pivot event counts per user over event_type",
      """SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase
        |FROM events GROUP BY user_id""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },

    // ---- exact percentiles: Spark percentile() and DuckDB quantile_cont
    // share the linear-interpolation definition; inputs are raw doubles so
    // both engines interpolate the same two order statistics.
    "q_percentiles" -> GraftQuery.sql(
      "median and p95 of order totalprice per status",
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.95) AS p95
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).orders
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.95)").as("p95"))
    },

    // ---- Pearson correlation from exact decimal moments: Sx/Sy/Sxx/Syy/
    // Sxy are order-insensitive decimal sums; the final formula is one
    // deterministic double expression, identical on both engines (built-in
    // corr() would be partition-order-sensitive).
    "q_corr_exact" -> GraftQuery.sql(
      "exact-moment Pearson corr(value, json k) per event_type",
      """SELECT event_type, n,
        |  (n * sxy - sx * sy) /
        |  (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr
        |FROM (
        |  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y * y AS DECIMAL(28,6))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy
        |  FROM (SELECT event_type, value AS x,
        |          CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DOUBLE) AS y
        |        FROM events)
        |  GROUP BY event_type)""".stripMargin) { (spark, dir) =>
      val base = Tables(spark, dir).events
        .select(col("event_type"), col("value").as("x"),
          get_json_object(col("props"), "$.k").cast("long").cast("double").as("y"))
      base.groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          dsum(col("x"), 6).as("sx"), dsum(col("y"), 6).as("sy"),
          dsum(col("x") * col("x"), 6).as("sxx"),
          dsum(col("y") * col("y"), 6).as("syy"),
          dsum(col("x") * col("y"), 6).as("sxy"))
        .select(col("event_type"), col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr"))
    },

    // ---- typed custom UDAF (Aggregator[IN,BUF,OUT]): top-3 values per
    // key with a bounded buffer — partial aggregation ships ≤ k doubles
    // per group through the shuffle. Oracle: ordered list slice.
    // The aggregator's array result is unpacked into scalar columns for
    // the gate (the driver's pandas compare cannot hash ndarray cells).
    "q_udaf_topk" -> GraftQuery.sql(
      "custom typed Aggregator: top-3 event values per event_type",
      """SELECT event_type,
        |  (list(value ORDER BY value DESC))[1] AS top1,
        |  (list(value ORDER BY value DESC))[2] AS top2,
        |  (list(value ORDER BY value DESC))[3] AS top3
        |FROM events GROUP BY event_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val topk = new graft.operators.TopKAggregator(3).toColumn.name("topk")
      Tables(spark, dir).events
        .select(col("event_type"), col("value"))
        .as[(String, Double)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(topk)
        .toDF("event_type", "topk")
        .select(col("event_type"),
          // try_element_at: groups with <3 events yield NULL here, matching
          // the DuckDB oracle's list[i] (ANSI element_at would throw).
          try_element_at(col("topk"), lit(1)).as("top1"),
          try_element_at(col("topk"), lit(2)).as("top2"),
          try_element_at(col("topk"), lit(3)).as("top3"))
    },

    // ---- distribution window functions: ntile/percent_rank/cume_dist are
    // rational-exact (rank arithmetic only), deterministic under the
    // unique-key tie-break.
    "q_window_stats" -> GraftQuery.sql(
      "ntile/percent_rank/cume_dist of customers by balance per segment",
      """SELECT c_mktsegment, c_custkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables(spark, dir).customer
        .select(
          col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
    },

    // ---- time-RANGE window frame: trailing 1-hour per-user sum — the
    // frame is defined by the ts value, not row counts. Decimal-exact sum.
    "q_range_frame" -> GraftQuery.sql(
      "trailing 1-hour range-frame sum per user",
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS hour_sum
        |FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events.createOrReplaceTempView("graft_events_range")
      spark.sql(
        """SELECT event_id, user_id,
          |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
          |    PARTITION BY user_id ORDER BY ts
          |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          |    AS DOUBLE) AS hour_sum
          |FROM graft_events_range""".stripMargin)
    },

    // ---- typed JSON parsing: from_json with an explicit schema (vs the
    // per-field get_json_object in q_json_funcs) -> struct field access.
    "q_json_struct" -> GraftQuery.sql(
      "from_json into a typed struct, then field math",
      """SELECT event_id, k, k * 2 AS k2 FROM (
        |  SELECT event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events) WHERE k IS NOT NULL AND k % 3 = 0""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("k", LongType)))
      Tables(spark, dir).events
        .select(col("event_id"),
          from_json(col("props"), schema).getField("k").as("k"))
        .filter(col("k").isNotNull && col("k") % 3 === 0)
        .select(col("event_id"), col("k"), (col("k") * 2).as("k2"))
    },

    // ---- approximate sketches (HLL distinct, approx quantiles): the
    // sketch VALUES are engine-specific (different HLL registers /
    // quantile summaries), so the oracle verifies (a) the exact columns
    // value-for-value and (b) in-row booleans asserting each sketch landed
    // within its published error bound of the exact answer — DuckDB
    // computes the booleans as literal TRUE, so a sketch running out of
    // bound flips the gate red instead of being invisible (r3's permanent
    // `no_oracle` cell).
    //   approx_count_distinct rsd=0.02 → |approx−exact| ≤ max(10, 10%·exact)
    //   (5σ of the configured rsd, plus absolute slack for tiny groups);
    //   approx_percentile accuracy=1000 → rank error ≤ N/1000, far inside
    //   the exact p45..p55 value bracket used as the bound.
    // Two aggregation passes joined on the (3-row) group key, not one:
    // countDistinct's Expand rewrite combined with the
    // TypedImperativeAggregate percentiles in a single operator forces
    // everything onto the slow sort-aggregate path (measured 3.2-5.4s vs
    // 1.5s split at sf0.1). The second scan is the lesser evil — and at
    // real scale the exact columns would be dropped entirely (an exact
    // percentile's unbounded value buffer doesn't scale; it exists here
    // as the in-row bound for the sketches).
    "q_approx_sketches" -> GraftQuery.sql(
      "approx_count_distinct + approx_percentile validated in-row vs exact",
      """SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS exact_distinct,
        |  quantile_cont(o_totalprice, 0.5) AS exact_p50,
        |  TRUE AS approx_distinct_ok,
        |  TRUE AS approx_p50_ok
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (spark, dir) =>
      val orders = Tables(spark, dir).orders
      // both distinct stats run over the pre-deduped (status, custkey)
      // pairs: HLL sketches are duplicate-insensitive (identical registers,
      // identical estimate), countDistinct becomes a plain count, and the
      // Expand rewrite (distinct + non-distinct aggs in one operator,
      // measured 3× slower) never fires. At 100 TB the pair dedup is one
      // map-side-combinable shuffle of the two slim columns.
      val pairs = orders
        .select(col("o_orderstatus"), col("o_custkey")).distinct()
      val d = pairs.groupBy(col("o_orderstatus")).agg(
        count(lit(1)).as("exact_distinct"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_distinct"))
      val p = orders.groupBy(col("o_orderstatus")).agg(
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50"),
        expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
        expr("percentile(o_totalprice, 0.45)").as("p45"),
        expr("percentile(o_totalprice, 0.55)").as("p55"))
      d.join(p, "o_orderstatus")
        .select(col("o_orderstatus"), col("exact_distinct"), col("exact_p50"),
          (abs(col("approx_distinct") - col("exact_distinct"))
            <= greatest(lit(10.0), col("exact_distinct") * 0.1))
            .as("approx_distinct_ok"),
          (col("approx_p50") >= col("p45") && col("approx_p50") <= col("p55"))
            .as("approx_p50_ok"))
    },

    // ---- per-group z-score outlier audit (3σ rule): the distribution-
    // drift monitor a production pipeline runs per ingest batch. Engine-
    // exact by integer discipline: values are ≤4-decimal, so v4 =
    // round(value·10⁴) is an exact integer on both engines (products land
    // within ulps of integers — no ties possible), Σv4 and Σv4² are exact
    // BIGINT sums, and mean/std/outlier-threshold derive through an
    // IDENTICAL textual formula (same IEEE op sequence → same bits; the
    // int64→double conversions are correctly rounded, unlike the >2^53
    // decimal÷10^s path q_text_simjoin dodged). One stats aggregation +
    // one broadcast-stats per-row pass — two corpus scans, zero windows.
    "q_outliers" -> GraftQuery.sql(
      "per-event-type 3-sigma outlier audit with exact integer moments",
      """WITH s AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS s4,
        |    CAST(SUM(CAST(round(value * 10000) AS BIGINT)
        |           * CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS s8
        |  FROM events GROUP BY event_type),
        |m AS (
        |  SELECT event_type, n,
        |    CAST(s4 AS DOUBLE) / 10000.0 / n AS mean,
        |    sqrt((CAST(s8 AS DOUBLE) / 100000000.0
        |          - (CAST(s4 AS DOUBLE) / 10000.0)
        |            * (CAST(s4 AS DOUBLE) / 10000.0) / n) / n) AS std
        |  FROM s)
        |SELECT m.event_type, CAST(m.n AS BIGINT) AS n, m.mean, m.std,
        |  CAST(count_if(abs(e.value - m.mean) > 3 * m.std) AS BIGINT)
        |    AS n_outliers
        |FROM events e JOIN m ON e.event_type = m.event_type
        |GROUP BY 1, 2, 3, 4""".stripMargin) { (spark, dir) =>
      val ev = Tables(spark, dir).events.select(col("event_type"), col("value"))
      val s = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 10000) AS BIGINT)")).as("s4"),
        sum(expr("CAST(round(value * 10000) AS BIGINT) * " +
          "CAST(round(value * 10000) AS BIGINT)")).as("s8"))
      val m = s.select(col("event_type"), col("n"),
        expr("CAST(s4 AS DOUBLE) / 10000.0 / n").as("mean"),
        expr("sqrt((CAST(s8 AS DOUBLE) / 100000000.0 " +
          "- (CAST(s4 AS DOUBLE) / 10000.0) " +
          "* (CAST(s4 AS DOUBLE) / 10000.0) / n) / n)").as("std"))
      ev.join(broadcast(m), "event_type")
        .groupBy(col("event_type"), col("n").cast("long").as("n"),
          col("mean"), col("std"))
        .agg(expr("CAST(count_if(abs(value - mean) > 3 * std) AS BIGINT)")
          .as("n_outliers"))
    },

    // ---- persisted-sketch union (the production "sketch table"): build
    // per-shard HLL sketches (Datasketches, lgConfigK=12 → rsd ≈ 1.6%),
    // LAND them as kilobyte binaries, then answer the distinct-count
    // question by merging ONLY the sketch table — the corpus is never
    // rescanned. At 100 TB this is how daily per-partition sketches serve
    // any date-range COUNT DISTINCT in milliseconds: sketch build is one
    // map-combinable aggregation at write time; the union pass reads KBs.
    // Mergeability is the whole point: union(sketch(a), sketch(b)) ≡
    // sketch(a ∪ b) — asserted in-row against the exact answer with the
    // q_approx_sketches bound pattern (oracle computes the boolean as
    // literal TRUE, so an out-of-bound merge flips the gate red).
    "q_sketch_union" -> GraftQuery.sql(
      "per-shard HLL sketches persisted + merged; estimate bounded vs exact",
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS exact_distinct,
        |  TRUE AS union_ok
        |FROM events GROUP BY event_type""".stripMargin) { (spark, dir) =>
      val path = "/tmp/graft-sources/hllsk-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val ev = Tables(spark, dir).events
        .select(col("event_type"), col("user_id"),
          (col("user_id") % 8).as("shard"))
      ev.groupBy(col("shard"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
        // the sketch table is 8 shards × |types| rows of KB binaries —
        // one file IS the production layout; the default shuffle-width
        // write scattered it over 32 near-empty files whose open/commit
        // overhead dominated the gate (r7: 0.47 → 1.2 s in-session)
        .coalesce(1)
        .write.mode("overwrite").parquet(path)
      val exact = ev.select(col("event_type"), col("user_id")).distinct()
        .groupBy(col("event_type")).agg(count(lit(1)).as("exact_distinct"))
      val est = spark.read.parquet(path)
        .groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      exact.join(est, "event_type")
        .select(col("event_type"), col("exact_distinct"),
          (abs(col("est") - col("exact_distinct"))
            <= greatest(lit(10.0), col("exact_distinct") * lit(0.05)))
            .as("union_ok"))
    },

    // ---- kNN label prediction over embeddings: majority vote of the 5
    // nearest same-corpus neighbors (exact cosine), per-label accuracy.
    // Ties broken by (count desc, label asc); fully deterministic.
    // The query set is BOUNDED (vec_id < 1000 on top of the % 20 stride):
    // a kNN query workload is fixed-size by nature, and the broadcast of
    // the query side must not grow with the corpus — the r3 5%-of-corpus
    // set was flagged as a 100 TB scale-killer. The label column comes
    // from the shared memoized corpus projection (no per-run join at all;
    // the r2/r3 per-run broadcast-label join was the one query whose plan
    // degraded under surrounding session state in the driver bench).
    "q_knn_predict" -> GraftQuery.sql(
      "5-NN majority-vote label prediction accuracy per true label",
      s"""WITH v AS (SELECT * FROM ${SimilarityQueries.VECTORS_SQL} v0),
         |q AS (SELECT * FROM v WHERE vec_id % 20 = 0 AND vec_id < 1000),
         |neigh AS (
         |  SELECT query_id, true_label, label FROM (
         |    SELECT q.vec_id AS query_id, q.label AS true_label, v.label,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${SimilarityQueries.cosExactSql("q.embedding", "v.embedding",
                    "sqrt(q.norm2 * v.norm2)")} DESC,
         |        v.vec_id) AS rn
         |    FROM q JOIN v ON q.vec_id <> v.vec_id) WHERE rn <= 5),
         |votes AS (
         |  SELECT query_id, true_label, label AS pred, COUNT(*) AS cnt
         |  FROM neigh GROUP BY query_id, true_label, label),
         |pred AS (
         |  SELECT query_id, true_label, pred FROM (
         |    SELECT query_id, true_label, pred,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY cnt DESC, pred) AS rn
         |    FROM votes) WHERE rn = 1)
         |SELECT true_label, COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN pred = true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         |FROM pred GROUP BY true_label""".stripMargin) { (spark, dir) =>
      val v = SimilarityQueries.vectors(spark, dir)
      val q = v.filter(col("vec_id") % 20 === 0 && col("vec_id") < 1000)
      val byQ = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      val neigh = broadcast(q.as("q"))
        .join(v.as("v"), col("q.vec_id") =!= col("v.vec_id"))
        .select(
          col("q.vec_id").as("query_id"), col("q.label").as("true_label"),
          col("v.label").as("label"), col("v.vec_id").as("neighbor_id"),
          // native decimal-exact dot (GraftExpressions.dotDec)
          (expr("vector_dot_dec(q.embedding, v.embedding)")
            / sqrt(col("q.norm2") * col("v.norm2"))).as("cos"))
        .withColumn("rn", row_number().over(byQ))
        .filter(col("rn") <= 5)
      val votes = neigh.groupBy(col("query_id"), col("true_label"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val byVote = Window.partitionBy(col("query_id"))
        .orderBy(col("cnt").desc, col("label"))
      val pred = votes.withColumn("rn", row_number().over(byVote))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("true_label"), col("label").as("pred"))
      pred.groupBy(col("true_label"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred") === col("true_label"), 1L).otherwise(0L))
            .as("n_correct"))
    },

    // ---- salting for skewed keys: two-phase aggregation (partial by
    // (key, salt), final by key). At 100 TB a hot key would overload one
    // reducer; the salt spreads its partials over 16, and the final
    // combine is tiny. Result provably equals the direct aggregate — the
    // oracle is the plain GROUP BY.
    "q_skew_salted" -> GraftQuery.sql(
      "salted two-phase aggregation over a skewed derived key",
      """SELECT hot_key, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
        |FROM (SELECT CASE WHEN user_id % 10 < 8 THEN 'hot' ELSE
        |               CAST(user_id AS VARCHAR) END AS hot_key, value
        |      FROM events)
        |GROUP BY hot_key""".stripMargin) { (spark, dir) =>
      val salted = Tables(spark, dir).events
        .select(
          when(col("user_id") % 10 < 8, lit("hot"))
            .otherwise(col("user_id").cast("string")).as("hot_key"),
          col("value"),
          (col("event_id") % 16).as("salt"))
      salted
        .groupBy(col("hot_key"), col("salt")) // phase 1: spread the hot key
        .agg(count(lit(1)).as("pn"),
          sum(col("value").cast("decimal(28,6)")).as("psum"))
        .groupBy(col("hot_key")) // phase 2: tiny final combine
        .agg(sum(col("pn")).as("n"),
          sum(col("psum")).cast("double").as("total"))
    },

    // ---- navigation window functions: first/last/nth value over the full
    // partition frame plus lead with an explicit default. All positional
    // (no FP aggregation), deterministic under the (ts, event_id) unique
    // tie-break. last_value/nth_value REQUIRE the unbounded-following
    // frame: the default frame stops at CURRENT ROW, where last_value
    // degenerates to the current value on both engines.
    "q_window_navs" -> GraftQuery.sql(
      "first_value/last_value/nth_value/lead per user timeline",
      """SELECT event_id, user_id,
        |  first_value(value) OVER w AS first_v,
        |  last_value(value) OVER w AS last_v,
        |  nth_value(value, 2) OVER w AS second_v,
        |  lead(value, 1, -1.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_v
        |FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
        |WHERE user_id % 50 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wc = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables(spark, dir).events
        .filter(col("user_id") % 50 === 0)
        .select(
          col("event_id"), col("user_id"),
          first(col("value")).over(w).as("first_v"),
          last(col("value")).over(w).as("last_v"),
          nth_value(col("value"), 2).over(w).as("second_v"),
          lead(col("value"), 1, -1.0).over(wc).as("next_v"))
    },

    // ---- SCD-2 temporal dimension join: each user's 'click' events
    // build a slowly-changing dimension — version k carries the click's
    // value with validity [ts_k, ts_{k+1}) (the last version open-ended)
    // via one lead() window — and every 'purchase' fact joins the
    // version VALID AT ITS TIMESTAMP: user equi-join + interval filter.
    // This is the warehouse bitemporal-lookup shape q_asof_join's
    // single-table window can't express (the dim is a separate versioned
    // TABLE a real pipeline materializes and reuses). Scale story: the
    // join fans out by versions-per-key before the interval filter —
    // and SCD-2 dims are bounded per key by construction (version count
    // = attribute-change count), so candidate volume is fact-rows ×
    // avg-versions, keyed, never a time-range cross product; intervals
    // partition time per key, so each fact matches at most ONE version
    // (purchases before the first click stay unmatched through the left
    // join — counted, not dropped).
    "q_scd2_join" -> GraftQuery.sql(
      "SCD-2 dimension: purchases join the click-version valid at their time",
      """WITH clicks AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS vf, value,
        |    lead(CAST(ts AS TIMESTAMP), 1, TIMESTAMP '9999-01-01 00:00:00')
        |      OVER (PARTITION BY user_id
        |            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS vt
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, event_id
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT p.user_id, p.event_id, c.value
        |      FROM p LEFT JOIN clicks c
        |        ON c.user_id = p.user_id
        |       AND c.vf <= p.pts AND p.pts < c.vt)
        |SELECT user_id, COUNT(*) AS n_purch,
        |  CAST(COUNT(value) AS BIGINT) AS n_matched,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS matched_value_sum
        |FROM j GROUP BY user_id""".stripMargin) { (spark, dir) =>
      val ev = Tables(spark, dir).events
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("vf"),
          col("event_id").as("ceid"), col("value"))
        .withColumn("vt",
          coalesce(lead(col("vf"), 1).over(
            Window.partitionBy(col("cu")).orderBy(col("vf"), col("ceid"))),
            lit("9999-01-01 00:00:00").cast("timestamp")))
        .drop("ceid")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("event_id"))
      p.join(clicks,
          col("cu") === col("user_id")
            && col("vf") <= col("pts") && col("pts") < col("vt"),
          "left")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purch"),
          count(col("value")).as("n_matched"),
          dsum(col("value"), 6).as("matched_value_sum"))
    },

    // ---- time-series similarity search (SAX-blocked, cf. the iSAX /
    // EDBT'19 streaming-similarity line): each user's event-value series
    // z-normalizes (exact-moment mean/std, q_outliers' engine-identical
    // formula), reduces to an 8-segment PAA (piecewise aggregate
    // approximation — per-segment decimal-exact means), and discretizes
    // to a 4-symbol SAX word on the standard N(0,1) breakpoints. The
    // word is the BLOCKING key: nearest-neighbor candidates come from a
    // word equi-join (never all user pairs), and survivors confirm by
    // the exact decimal-quantized PAA distance with (dist, id)
    // tie-break. At 100 TB this is the standard series-search shape:
    // normalization and PAA are one keyed pass each, the index is a
    // (word -> users) table, and per-query work scales with the word
    // bucket, not the corpus. Output is per-user (always non-empty):
    // word + nearest same-word neighbor, NULL when the user's word is
    // unique — which itself is the measured selectivity of the block.
    "q_ts_sax" -> GraftQuery.sql(
      "SAX-blocked series similarity: PAA words + exact nearest same-word neighbor",
      """WITH ev AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |st AS (
        |  SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE) AS sxx
        |  FROM events GROUP BY user_id),
        |z AS (
        |  SELECT e.user_id, ((e.rn - 1) * 8) // e.n AS seg,
        |    CASE WHEN s.n * s.sxx - s.sx * s.sx <= 0 THEN 0.0
        |         ELSE (e.value - s.sx / s.n)
        |              / (sqrt(s.n * s.sxx - s.sx * s.sx) / s.n) END AS zv
        |  FROM ev e JOIN st s ON s.user_id = e.user_id),
        |paa AS (
        |  SELECT user_id, seg,
        |    CAST(SUM(CAST(zv AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m
        |  FROM z GROUP BY user_id, seg),
        |sym AS (
        |  SELECT user_id, seg, m,
        |    CASE WHEN m < -0.6745 THEN 'a' WHEN m < 0.0 THEN 'b'
        |         WHEN m < 0.6745 THEN 'c' ELSE 'd' END AS s
        |  FROM paa),
        |words AS (
        |  SELECT user_id, string_agg(s, '' ORDER BY seg) AS sax_word
        |  FROM sym GROUP BY user_id),
        |cand AS (
        |  SELECT a.user_id AS ua, b.user_id AS ub, a.sax_word
        |  FROM words a JOIN words b
        |    ON a.sax_word = b.sax_word AND a.user_id <> b.user_id),
        |d2 AS (
        |  SELECT c.ua, c.ub,
        |    CAST(SUM(CAST((x.m - y.m) * (x.m - y.m) AS DECIMAL(28,12)))
        |      AS DOUBLE) AS dist2
        |  FROM cand c
        |  JOIN sym x ON x.user_id = c.ua
        |  JOIN sym y ON y.user_id = c.ub AND y.seg = x.seg
        |  GROUP BY c.ua, c.ub),
        |nn AS (
        |  SELECT ua, ub, dist2 FROM (
        |    SELECT ua, ub, dist2,
        |      row_number() OVER (PARTITION BY ua
        |                         ORDER BY dist2, ub) AS rk
        |    FROM d2) r WHERE rk = 1)
        |SELECT w.user_id, w.sax_word, nn.ub AS nn_user, nn.dist2 AS nn_dist2
        |FROM words w LEFT JOIN nn ON nn.ua = w.user_id""".stripMargin) { (spark, dir) =>
      val ev = Tables(spark, dir).events
        .select(col("user_id"), col("value"), col("ts"), col("event_id"))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cnt = Window.partitionBy(col("user_id"))
      val st = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).cast("double").as("n"),
          dsum(col("value"), 6).as("sx"),
          dsum(col("value") * col("value"), 6).as("sxx"))
      val z = ev
        .withColumn("rn", row_number().over(byUser))
        .withColumn("nn", count(lit(1)).over(cnt))
        .join(st, "user_id")
        .select(col("user_id"),
          expr("((rn - 1) * 8) div nn").as("seg"),
          when(col("n") * col("sxx") - col("sx") * col("sx") <= 0, 0.0)
            .otherwise((col("value") - col("sx") / col("n"))
              / (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) / col("n")))
            .as("zv"))
      val paa = z.groupBy(col("user_id"), col("seg"))
        .agg((dsum(col("zv"), 12) / count(lit(1))).as("m"))
      val sym = paa.select(col("user_id"), col("seg"), col("m"),
        when(col("m") < -0.6745, "a").when(col("m") < 0.0, "b")
          .when(col("m") < 0.6745, "c").otherwise("d").as("s"))
      val words = Scratch.checkpointLazy(sym.groupBy(col("user_id"))
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("seg"), col("s")))),
            x => x.getField("s")), "").as("sax_word"))
        .select(col("user_id"), col("sax_word")))
      val cand = words.as("a")
        .join(words.as("b"),
          col("a.sax_word") === col("b.sax_word")
            && col("a.user_id") =!= col("b.user_id"))
        .select(col("a.user_id").as("ua"), col("b.user_id").as("ub"))
      val symX = sym.select(col("user_id"), col("seg"), col("m"))
      val d2 = cand
        .join(symX.as("x"), col("ua") === col("x.user_id"))
        .join(symX.as("y"),
          col("ub") === col("y.user_id") && col("y.seg") === col("x.seg"))
        .groupBy(col("ua"), col("ub"))
        .agg(dsum((col("x.m") - col("y.m")) * (col("x.m") - col("y.m")), 12)
          .as("dist2"))
      val byUa = Window.partitionBy(col("ua"))
        .orderBy(col("dist2"), col("ub"))
      val nn = d2.withColumn("rk", row_number().over(byUa))
        .filter(col("rk") === 1)
        .select(col("ua"), col("ub").as("nn_user"), col("dist2").as("nn_dist2"))
      words.join(nn, col("user_id") === col("ua"), "left")
        .select(col("user_id"), col("sax_word"), col("nn_user"), col("nn_dist2"))
    },

    // ---- mergeable quantile sketch (deterministic KLL): the quantile
    // member of the sketch family (HLL distinct counts, CMS frequencies)
    // as a typed Aggregator whose level buffers merge ASSOCIATIVELY
    // through the shuffle — the shape a 1000-executor percentile job
    // needs (a few KB per group on the wire vs shipping every value).
    // Randomness is removed (odd-index compactor), so the rank-error
    // bound ε ≈ L/(2k) holds WORST-CASE under any partial-merge order —
    // which is the property that survives Spark's nondeterministic merge
    // tree: estimates may differ run to run, the bound never does. The
    // gate audits exactly that (q_approx_sketches' pattern): the
    // estimate's TRUE rank, measured against the corpus, must sit within
    // ε·n of the target rank; the oracle computes the booleans as
    // literal TRUE, so an out-of-bound sketch flips the gate red.
    // QuantileSketchSpec additionally pins the bound under adversarial
    // merge splits.
    "q_quantile_sketch" -> GraftQuery.sql(
      "deterministic KLL quantile sketch: rank-error bound audited vs exact",
      """SELECT event_type, COUNT(*) AS n,
        |  quantile_cont(value, 0.5) AS p50_exact,
        |  TRUE AS ok50, TRUE AS ok95
        |FROM events GROUP BY event_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val sk = new graft.operators.QuantileSketchAgg(64).toColumn.name("sk")
      val est = Tables(spark, dir).events
        .select(col("event_type"), col("value"))
        .as[(String, Double)]
        .groupByKey(_._1).mapValues(_._2).agg(sk)
        .toDF("event_type", "sk")
        .select(col("event_type"),
          col("sk")(1).as("e50"), col("sk")(2).as("e95"))
      // audit pass: the estimates broadcast back over one corpus scan to
      // measure their TRUE ranks (the exact p50 rides the same pass)
      val ranks = Tables(spark, dir).events
        .select(col("event_type"), col("value"))
        .join(broadcast(est), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(value, 0.5)").as("p50_exact"),
          sum(when(col("value") < col("e50"), 1).otherwise(0)).as("r50lo"),
          sum(when(col("value") <= col("e50"), 1).otherwise(0)).as("r50hi"),
          sum(when(col("value") < col("e95"), 1).otherwise(0)).as("r95lo"),
          sum(when(col("value") <= col("e95"), 1).otherwise(0)).as("r95hi"))
      // tie-correct audit: the target rank must fall within ε of the
      // estimate's rank INTERVAL [count(<v), count(<=v)] — a point check
      // would reject good estimates on duplicated values. ε = 0.12
      // dominates the worst-case L/(2k) at every SF (k = 64: 4-7% for n
      // in 250..25k); +1 absorbs rank discretization.
      def ok(lo: String, hi: String, q: Double) =
        (col(lo) - lit(1) <= col("n") * q + col("n") * 0.12) &&
          (col(hi) + lit(1) >= col("n") * q - col("n") * 0.12)
      ranks.select(col("event_type"), col("n"), col("p50_exact"),
        ok("r50lo", "r50hi", 0.5).as("ok50"),
        ok("r95lo", "r95hi", 0.95).as("ok95"))
    },

    // ---- snapshot time travel (AS OF diff): the key-latest visible
    // state of the events table AS OF a cutoff vs AS OF now, classified
    // per key into added / deleted / updated / unchanged — the audit
    // query every versioned lake table answers ("what changed since the
    // snapshot we trained on?"). Both snapshots are one window over one
    // scan each (same last-writer-wins rule as q_stream_cdc, so this is
    // the BATCH view of the CDC snapshot at two versions); the diff is a
    // single user-keyed full-outer join of two key-latest frames —
    // key-count-sized, not event-history-sized. At 100 TB a table format
    // serves the two versions from metadata and the same diff runs on
    // the manifests' row sets.
    "q_time_travel" -> GraftQuery.sql(
      "AS-OF snapshot diff: added/deleted/updated/unchanged keys across versions",
      """WITH v1 AS (
        |  SELECT user_id, event_id FROM (
        |    SELECT user_id, event_id, event_type,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |    FROM events
        |    WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-16 00:00:00') s
        |  WHERE rn = 1 AND event_type <> 'error'),
        |v2 AS (
        |  SELECT user_id, event_id FROM (
        |    SELECT user_id, event_id, event_type,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |    FROM events) s
        |  WHERE rn = 1 AND event_type <> 'error'),
        |d AS (
        |  SELECT CASE WHEN a.user_id IS NULL THEN 'added'
        |              WHEN b.user_id IS NULL THEN 'deleted'
        |              WHEN a.event_id <> b.event_id THEN 'updated'
        |              ELSE 'unchanged' END AS change_type
        |  FROM v1 a FULL OUTER JOIN v2 b ON a.user_id = b.user_id)
        |SELECT change_type, COUNT(*) AS n_users
        |FROM d GROUP BY change_type""".stripMargin) { (spark, dir) =>
      val latest = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      def snapshot(df: DataFrame) = df
        .withColumn("rn", row_number().over(latest))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_id"))
      val ev = Tables(spark, dir).events
      val v1 = snapshot(ev.filter(
        col("ts") <= lit("2024-01-16 00:00:00").cast("timestamp")))
      val v2 = snapshot(ev)
      v1.as("a").join(v2.as("b"),
          col("a.user_id") === col("b.user_id"), "full_outer")
        .select(
          when(col("a.user_id").isNull, "added")
            .when(col("b.user_id").isNull, "deleted")
            .when(col("a.event_id") =!= col("b.event_id"), "updated")
            .otherwise("unchanged").as("change_type"))
        .groupBy(col("change_type"))
        .agg(count(lit(1)).as("n_users"))
    }
  )
}
