package graft

import org.apache.spark.sql.ForeachWriter
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink parity (SURVEY.md §2.1 S1/S2/K1/K2 + §2.4 file formats the
  * reference lacks entirely): Parquet/CSV/JSON round-trips and the
  * foreach (custom sink) callback path. */
class SourcesSinksSpec extends AnyFunSuite with TestSession {

  private def tmp(name: String) =
    s"/tmp/graft-test-io/$name-${System.nanoTime()}"

  test("parquet round-trip preserves schema and rows") {
    val t = Tables(spark, sfDir)
    val path = tmp("parquet")
    val orig = t.nation
    orig.write.parquet(path)
    val back = spark.read.parquet(path)
    assert(back.schema == orig.schema)
    assert(back.collect().toSet == orig.collect().toSet)
  }

  test("csv round-trip with header schema inference") {
    val path = tmp("csv")
    val t = Tables(spark, sfDir)
    t.region.write.option("header", "true").csv(path)
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(path)
    assert(back.count() == t.region.count())
    assert(back.columns.toSeq == t.region.columns.toSeq)
  }

  test("json lines round-trip") {
    val path = tmp("json")
    val t = Tables(spark, sfDir)
    t.supplier.write.json(path)
    val back = spark.read.json(path)
    assert(back.count() == t.supplier.count())
  }

  test("q_sink_compact mechanics: 64 files in, <=4 out, disjoint sorted id ranges") {
    // the gate itself proves content preservation against the oracle;
    // this asserts the layout mechanics the gate's comment promises
    SparkEntry.queries("q_sink_compact")(spark, sfDir).collect()
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles((_, n) => n.endsWith(".parquet")).toSeq
    val base = s"/tmp/graft-sources/compact-${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
    val frag = parquetFiles(s"$base/frag")
    val packed = parquetFiles(s"$base/packed")
    assert(frag.size == 64, s"expected 64 fragment files, got ${frag.size}")
    assert(packed.size <= 4, s"compaction left ${packed.size} files")
    // range clustering: per-file (min, max) doc_id intervals are disjoint
    val ranges = packed.map { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .agg(org.apache.spark.sql.functions.min("doc_id"),
          org.apache.spark.sql.functions.max("doc_id"))
        .head()
      (ids.getLong(0), ids.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"file id ranges overlap: $ranges")
      case _ =>
    }
  }

  test("partitioned write: partition column becomes directory layout") {
    val path = tmp("partitioned")
    Tables(spark, sfDir).orders
      .write.partitionBy("o_orderstatus").parquet(path)
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("o_orderstatus=")))
    // partition pruning: reading one partition must not scan the others
    val one = spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F")
    val plan = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
  }

  test("K2 foreach sink: per-record callback receives every row") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("rows-seen")
    spark.createDataset(1 to 100).foreach(_ => acc.add(1))
    assert(acc.value == 100)
  }

  test("K2 streaming foreach sink: ForeachWriter lifecycle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val acc = spark.sparkContext.longAccumulator("stream-rows")
    val q = source.toDS().writeStream
      .option("checkpointLocation", tmp("foreach-ckpt"))
      .foreach(new ForeachWriter[Int] {
        def open(partitionId: Long, epochId: Long): Boolean = true
        def process(value: Int): Unit = acc.add(value)
        def close(errorOrNull: Throwable): Unit = ()
      }).start()
    source.addData(1, 2, 3, 4)
    q.processAllAvailable()
    q.stop()
    assert(acc.value == 10)
  }

  test("observe(): in-flight pipeline metrics ride the job, no extra scan") {
    import org.apache.spark.sql.functions._
    // the production QC pattern: row counts and value sums collected as
    // named metrics DURING the real aggregation job — at 100 TB a second
    // audit pass over the corpus is unaffordable; observe() attaches the
    // audit to the pass that already runs
    val df = graft.Tables(spark, sfDir).events
      .observe("ingest_qc",
        count(lit(1)).as("rows_seen"),
        sum(col("value").cast("decimal(28,6)")).as("value_sum"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val rows = df.collect()
    val metrics = df.queryExecution.observedMetrics("ingest_qc")
    assert(metrics.getAs[Long]("rows_seen") == rows.map(_.getLong(1)).sum,
      "observed row count must equal the aggregate's total")
    assert(metrics.getAs[java.math.BigDecimal]("value_sum") != null)
  }

  test("q_stream_join_connector: both join sides are connector streams, no memory source") {
    // the r6 gap was that every stream-stream join gate staged its input
    // through driver collect + MemoryStream; this pin keeps the connector
    // gate honest — two graft-seq relations, zero MemoryStream, and a
    // genuinely streaming frame
    val df = graft.queries.StreamQueries.connectorJoinStream(spark)
    assert(df.isStreaming, "connector join frame must be a streaming frame")
    val logical = df.queryExecution.logical.toString
    val seqRelations = "graft-seq".r.findAllIn(logical).size
    assert(seqRelations >= 2,
      s"expected two graft-seq relations in the plan:\n$logical")
    assert(!logical.toLowerCase.contains("memorystream")
      && !logical.contains("MemoryDataSource"),
      s"no MemoryStream may feed the connector join:\n$logical")
  }

  test("q_stats_skipping: the index prunes the file list to exactly the admitting files") {
    import org.apache.spark.sql.functions._
    // correctness is pruning-independent (the exact filter re-applies on
    // the pruned read) — so the pruning itself must be pinned here or a
    // broken index would silently degrade to a full scan
    val all = graft.queries.SourceQueries.skipIndexAllFiles(spark, sfDir)
    val ranges = Seq((100L, 199L), (1200L, 1299L))
    val picked = graft.queries.SourceQueries.skipIndexSelect(spark, sfDir, ranges)
    assert(all.size == 8, s"expected 8 range-clustered files, got ${all.size}")
    assert(picked.nonEmpty && picked.size < all.size,
      s"index failed to prune: ${picked.size}/${all.size} files")
    assert(picked.toSet.subsetOf(all.toSet))
    // the picked set is exactly the admitting set: every excluded file's
    // key range must miss both probe ranges
    val stats = graft.queries.SourceQueries.statsIndexed(spark, sfDir)._2
    stats.foreach { case (f, mn, mx) =>
      val admits = ranges.exists { case (lo, hi) => mx >= lo && mn <= hi }
      assert(admits == picked.contains(f),
        s"file $f [$mn,$mx] admits=$admits but picked=${picked.contains(f)}")
    }
    // and the pruned read returns the same rows as a full scan
    val full = spark.read.parquet(all: _*)
      .filter(col("o_orderkey").between(100, 199)
        || col("o_orderkey").between(1200, 1299))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val pruned = spark.read.parquet(picked: _*)
      .filter(col("o_orderkey").between(100, 199)
        || col("o_orderkey").between(1200, 1299))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(full.sameElements(pruned), "pruned read lost or invented rows")
  }
}
