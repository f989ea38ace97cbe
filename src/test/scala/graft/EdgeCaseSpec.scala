package graft

import graft.operators.{GraftStream, KeyedGraftStream}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate and boundary inputs: empty streams, null keys, single
  * elements, NaN aggregation — the places distributed engines
  * historically disagree with themselves across partitionings. */
class EdgeCaseSpec extends AnyFunSuite with TestSession {

  test("empty input: reduce/agg produce empty, not failure") {
    import spark.implicits._
    val empty = spark.emptyDataset[(String, Long)]
    assert(new KeyedGraftStream(empty.groupByKey(_._1).mapValues(_._2))
      .reduce(_ + _).collect().isEmpty)
    assert(empty.toDF("k", "v").groupBy("k").agg(sum("v")).collect().isEmpty)
  }

  test("single element per key: reduce emits it untouched (ref first-element path)") {
    import spark.implicits._
    val out = GraftStream.fromElements(spark, ("a", 41L))
      .keyBy(_._1).reduce((x, y) => (x._1, x._2 + y._2))
      .collect()
    assert(out.toSeq == Seq(("a", ("a", 41L))))
  }

  test("null keys group together and join as no-match") {
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = true),
      StructField("v", LongType, nullable = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("a", 1L), Row(null, 2L), Row(null, 3L), Row("b", 4L)),
      schema)
    // null keys form ONE group in aggregation...
    val agg = df.groupBy("k").agg(sum("v").as("s")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    assert(agg(None) == 5L)
    // ...but match NOTHING in an equi-join (SQL semantics)
    val joined = df.as("x").join(df.as("y"), col("x.k") === col("y.k"))
    assert(joined.count() == 2) // only a-a and b-b
  }

  test("NaN: aggregates propagate, sorts place NaN last (Spark semantics)") {
    import spark.implicits._
    val ds = Seq(1.0, Double.NaN, 3.0).toDF("v")
    assert(ds.agg(sum("v")).collect()(0).getDouble(0).isNaN)
    val sorted = ds.orderBy(col("v").asc).collect().map(_.getDouble(0))
    assert(sorted(2).isNaN, "Spark sorts NaN greater than any value")
  }

  test("stream with zero batches then data: state starts clean") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val name = s"edge_empty_${System.nanoTime()}"
    val q = new GraftStream(source.toDS())
      .keyBy(identity[String]).kv.mapValues(_ => 1L)
    val running = new KeyedGraftStream(q).runningReduce(_ + _)
      .toDF("k", "n").writeStream.queryName(name)
      .outputMode("update").format("memory")
      .option("checkpointLocation", s"/tmp/graft-ckpt/$name").start()
    running.processAllAvailable() // no data yet
    source.addData("x")
    running.processAllAvailable()
    running.stop()
    val rows = spark.table(name).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("x", 1L)))
  }

  test("stream-stream inner join with watermarked time bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val left = MemoryStream[(java.sql.Timestamp, String)]
    val right = MemoryStream[(java.sql.Timestamp, String)]
    val l = left.toDF().toDF("lts", "lk").withWatermark("lts", "10 seconds")
    val r = right.toDF().toDF("rts", "rk").withWatermark("rts", "10 seconds")
    val name = s"ss_join_${System.nanoTime()}"
    val q = l.join(r,
      col("lk") === col("rk") &&
        col("rts").between(col("lts") - expr("interval 5 seconds"),
          col("lts") + expr("interval 5 seconds")))
      .select("lk", "lts", "rts")
      .writeStream.queryName(name).outputMode("append").format("memory")
      .option("checkpointLocation", s"/tmp/graft-ckpt/$name").start()
    left.addData((ts(10), "a"), (ts(100), "b"))
    right.addData((ts(12), "a"), (ts(200), "b")) // a within 5s, b not
    q.processAllAvailable()
    q.stop()
    val out = spark.table(name).collect().map(_.getString(0))
    assert(out.toSeq == Seq("a"), s"got ${out.toSeq}")
  }

  test("packing: zero-token docs never advance the bin counter") {
    import spark.implicits._
    // shard x: 1000-token doc, empty doc, 1500-token doc with budget 2048:
    // doc 3 STARTS at token 1000 -> bin 0; the empty doc occupies no space
    val df = Seq(("x", 1L, 1000L), ("x", 2L, 0L), ("x", 3L, 1500L))
      .toDF("source", "doc_id", "n_tok")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(Long.MinValue, 0)
    val bins = df.withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"),
        floor((col("cum") - col("n_tok")) / 2048.0).cast("long").as("bin"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 0L), s"got $bins")
  }

  test("budget selection: budget below the best band selects nothing, loudly-empty") {
    import spark.implicits._
    // one band holds all the token mass; a 2/5 budget can't afford it
    val hist = Seq((49L, 1000L)).toDF("band", "tok")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("band").desc)
      .rowsBetween(Long.MinValue, 0)
    val cutoff = hist
      .withColumn("ctok", sum(col("tok")).over(w))
      .withColumn("tot", sum(col("tok")).over(
        org.apache.spark.sql.expressions.Window
          .rowsBetween(Long.MinValue, Long.MaxValue)))
      .filter(col("ctok") <= floor(col("tot") * 2 / 5))
      .agg(min(col("band")).as("cb"))
      .collect()
    assert(cutoff.head.isNullAt(0), "cutoff must be NULL (select nothing)")
  }

  test("dedup-free corpus: canonical election and incremental probe are loudly empty") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-edge-").toString
    // four docs, zero shared shingles, no exact/near dups anywhere
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "one two three four five six seven eight"),
      (2L, "red orange yellow green blue indigo violet maroon"),
      (3L, "north south east west up down left right"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(SparkEntry.queries("q_dedup_canonical")(spark, dir).collect().isEmpty,
      "no dup clusters -> no election rows")
    val inc = SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getBoolean(3)))
    assert(inc.toSeq == Seq((0L, true)),
      "the sole incoming doc (id 0) survives with no match")
  }

  test("bm25: corpus without any query term returns an empty ranking") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-edge-").toString
    Seq((0L, "alpha beta gamma"), (1L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(SparkEntry.queries("q_text_bm25")(spark, dir).collect().isEmpty,
      "zero matching postings -> zero ranked docs, not a failure")
  }

  test("phrase search: corpus without the phrase is loudly empty") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-edge-").toString
    // 'stream' and 'join' present but never adjacent after 'a'
    Seq((0L, "a join stream alpha"), (1L, "stream a join beta"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(SparkEntry.queries("q_text_phrase")(spark, dir).collect().isEmpty,
      "terms present but never phrase-adjacent -> zero hits, not a failure")
  }

  test("Morton interleave: zval round-trips both dimensions (q_zorder_cluster kernel)") {
    import spark.implicits._
    // deinterleaving the gate's 20-bit z must recover both inputs exactly
    val xs = Seq((0L, 0L), (1023L, 1023L), (1L, 0L), (0L, 1L),
      (513L, 257L), (777L, 333L))
    val df = xs.toDF("zx", "zy").selectExpr("zx", "zy",
      (0 until 10).map(i =>
        s"(((zx >> $i) & 1) << ${2 * i}) + (((zy >> $i) & 1) << ${2 * i + 1})")
        .mkString("CAST(", " + ", " AS BIGINT) AS z"))
    val back = df.selectExpr("zx", "zy",
      (0 until 10).map(i => s"(((z >> ${2 * i}) & 1) << $i)")
        .mkString("CAST(", " + ", " AS BIGINT) AS rx"),
      (0 until 10).map(i => s"(((z >> ${2 * i + 1}) & 1) << $i)")
        .mkString("CAST(", " + ", " AS BIGINT) AS ry"))
      .collect()
    back.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) && r.getLong(3) == r.getLong(1),
        s"z-value must be a bijection: $r")
    }
  }

  test("graft-seq: empty range streams zero batches and terminates") {
    val name = s"seq_empty_${System.nanoTime()}"
    val q = spark.readStream.format("graft-seq")
      .option("start", "5").option("end", "5").load()
      .writeStream.queryName(name).format("memory")
      .option("checkpointLocation", s"/tmp/graft-ckpt/$name")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000))
    assert(spark.table(name).isEmpty)
  }

  test("normalization: empty, all-invisible, and already-canonical strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      "",                          // empty survives as empty
      "\u200B\uFEFF\u00AD",       // pure invisibles vanish entirely
      "plain ascii 123",           // canonical text is a fixed point
      "\u00A0\uFF13")             // NBSP + fullwidth 3 fold to " 3"
      .toDF("t")
      .select(graft.queries.TextQueries.normalizeCol(col("t")))
      .as[String].collect()
    assert(rows(0) == "" && rows(1) == "")
    assert(rows(2) == "plain ascii 123")
    assert(rows(3) == " 3")
  }

  test("content-defined chunker: short docs yield exactly one whole chunk") {
    import spark.implicits._
    // < 4 tokens -> no 4-gram exists -> no boundary can fire -> one
    // chunk holding every token; empty docs are filtered (no chunks)
    val df = Seq(
      (1L, Seq("one")),
      (2L, Seq("two", "words")),
      (3L, Seq("a", "b", "c")),
      (4L, Seq.empty[String])).toDF("doc_id", "ws")
    val ch = graft.queries.DedupQueries.cdcChunks(df)
      .select("doc_id", "n_tok").as[(Long, Long)].collect().toMap
    assert(ch == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
