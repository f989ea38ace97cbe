package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expressions (vector_dot, array_jaccard): correctness
  * against the built-in formulations they replace, SQL registration, and
  * null behavior. */
class GraftExpressionsSpec extends AnyFunSuite with TestSession {

  test("vector_dot equals the interpreted aggregate/transform fold bit-for-bit") {
    val df = Tables(spark, sfDir).embeddings.limit(50)
    val both = df.as("a").crossJoin(df.as("b")).limit(500)
      .select(
        call_function("vector_dot", col("a.embedding"), col("b.embedding")).as("fast"),
        expr("""aggregate(transform(sequence(1, size(a.embedding)),
               |  i -> CAST(element_at(a.embedding, i) AS DOUBLE)
               |       * CAST(element_at(b.embedding, i) AS DOUBLE)),
               |  CAST(0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin).as("slow"))
    // strict left fold both ways -> bit-identical, not just approximately
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("vector_dot_dec equals the exact DECIMAL(38,12) product sum bit-for-bit") {
    // pins the precision contract directly (not just via the end-to-end
    // oracle gates): vector_dot_dec must equal the ORACLE's semantics —
    // an EXACT sum of per-product DECIMAL(38,12) quantizations (DuckDB's
    // list_sum over a DECIMAL list; here Spark's decimal SUM, exact at
    // these magnitudes). Deliberately NOT the old r2 aggregate() fold:
    // Catalyst rescales the fold's (38,12)+(38,12) intermediate to scale
    // 11 on every step (adjustPrecisionScale), drifting the last two
    // digits — invisible at the gate's 6-significant-digit canon, but the
    // native loop pins to the exact-sum semantics both engines gate on.
    val df = Tables(spark, sfDir).embeddings.limit(50)
    val pairs = df.as("a").crossJoin(df.as("b")).limit(500)
      .select(monotonically_increasing_id().as("pid"),
        col("a.embedding").as("ea"), col("b.embedding").as("eb"))
    val both = pairs
      .select(col("pid"),
        call_function("vector_dot_dec", col("ea"), col("eb")).as("fast"),
        explode(zip_with(col("ea"), col("eb"),
          (x, y) => (x.cast("double") * y.cast("double"))
            .cast("decimal(38,12)"))).as("p"))
      .groupBy(col("pid"))
      .agg(first(col("fast")).as("fast"),
        sum(col("p")).cast("double").as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("vector dots: ragged arrays throw loudly (ANSI stance, no truncation)") {
    for (fn <- Seq("vector_dot", "vector_dot_dec")) {
      val e = intercept[Exception](spark.sql(
        s"SELECT $fn(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT)))").collect())
      def all(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ all(t.getCause)
      assert(all(e).exists(_.contains("ragged")), s"$fn: ${all(e)}")
    }
  }

  test("vector dots: a null ELEMENT null-propagates the whole result") {
    // the interpreted folds both engines run poison the accumulator on a
    // null product; the native loops must yield NULL, not treat it as 0
    val r = spark.sql(
      "SELECT vector_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "vector_dot_dec(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dd").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("shingle_hashes: k outside [1, 100] fails at analysis, not at runtime") {
    for (k <- Seq(0, -3, 101)) {
      val e = intercept[Exception](
        spark.sql(s"SELECT shingle_hashes(array('a', 'b', 'c'), $k)").collect())
      assert(e.getMessage.contains("k must be in [1, 100]"), e.getMessage)
    }
  }

  test("array_jaccard equals size(intersect)/size(union) on distinct arrays") {
    import spark.implicits._
    val docs = Tables(spark, sfDir).documents.limit(100)
      .select(col("doc_id"),
        array_distinct(split(lower(col("text")), "\\W+")).as("ws"))
    val pairs = docs.as("x").crossJoin(docs.as("y")).limit(2000)
      .select(
        call_function("array_jaccard", col("x.ws"), col("y.ws")).as("fast"),
        (size(array_intersect(col("x.ws"), col("y.ws"))).cast("double") /
          size(array_union(col("x.ws"), col("y.ws"))).cast("double")).as("slow"))
    assert(pairs.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("registered in SQL: callable from spark.sql text") {
    val r = spark.sql(
      "SELECT vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "array_jaccard(array('a','b'), array('b','c')) AS j").collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0 / 3.0) < 1e-15)
  }

  test("null inputs propagate null; empty arrays define jaccard = 0") {
    val r = spark.sql(
      "SELECT vector_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS d, " +
        "array_jaccard(array(), array()) AS j").collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 0.0)
  }

  test("codegen and interpreted eval paths agree bit-for-bit") {
    // force the interpreted Expression.eval path, compare against the
    // default codegen'd path — doGenCode/nullSafeEval drift is the classic
    // custom-expression bug
    val df = Tables(spark, sfDir).embeddings.limit(40)
    def run(): Array[(Double, Double)] = df.as("a").crossJoin(df.as("b"))
      .limit(300)
      .select(
        call_function("vector_dot", col("a.embedding"), col("b.embedding")),
        call_function("array_jaccard",
          transform(col("a.embedding"), x => x.cast("string")),
          transform(col("b.embedding"), x => x.cast("string"))))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val codegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(codegen.toSeq == interpreted.toSeq)
  }

  test("duplicate elements: jaccard counts distinct only") {
    val r = spark.sql(
      "SELECT array_jaccard(array('a','a','b'), array('a','c','c')) AS j")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0 / 3.0) < 1e-15) // {a,b} vs {a,c}: 1/3
  }

  test("shingle_hashes equals the interpreted md5-HOF chain on real docs") {
    val ws = filter(split(lower(col("text")), "\\W+"), w => w =!= "")
    val both = Tables(spark, sfDir).documents.limit(200)
      .select(col("doc_id"), ws.as("ws"))
      .select(
        call_function("shingle_hashes", col("ws"), lit(3)).as("fast"),
        expr(
          """CASE WHEN size(ws) >= 3 THEN
            |  array_sort(array_distinct(transform(sequence(1, size(ws) - 2),
            |    i -> CAST(conv(substr(md5(concat_ws(' ', slice(ws, i, 3))), 1, 15), 16, 10) AS BIGINT))))
            |ELSE array() END""".stripMargin).as("slow"))
    assert(both.filter(not(col("fast") === col("slow"))).count() == 0)
  }

  test("shingle_hashes: fewer words than k yields an empty array") {
    val r = spark.sql(
      "SELECT shingle_hashes(array('a', 'b'), 3) AS h").collect()(0)
    assert(r.getSeq[Long](0).isEmpty)
  }

  test("shingle_hashes: null words skipped like concat_ws (no extra separator)") {
    val r = spark.sql(
      """SELECT shingle_hashes(array('a', CAST(NULL AS STRING), 'b'), 3) AS withNull,
        |  shingle_hashes(array('a b'), 1) AS joined""".stripMargin).collect()(0)
    assert(r.getSeq[Long](0) == r.getSeq[Long](1),
      "digest of ('a', NULL, 'b') must equal digest of 'a b'")
  }

  test("dec_scaled: scale outside [0,18] fails at analysis, not at runtime") {
    val e = intercept[Exception](
      spark.sql("SELECT dec_scaled(CAST(1.5 AS DOUBLE), 19)").collect())
    assert(e.getMessage.contains("scale must be in [0, 18]"), e.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT dec_scaled(CAST(1.5 AS DOUBLE), -1)").collect())
    assert(e2.getMessage.contains("scale must be in [0, 18]"), e2.getMessage)
  }

  test("dec_scaled: NaN/Infinity throw loudly (ANSI cast semantics)") {
    val e = intercept[Exception](
      spark.sql("SELECT dec_scaled(CAST('NaN' AS DOUBLE), 4)").collect())
    assert(e.getMessage.contains("dec_scaled") ||
      e.getCause != null && e.getCause.getMessage.contains("dec_scaled"),
      s"unexpected: ${e.getMessage}")
  }

  test("dsum headroom: totals past 2^63 of unscaled units stay exact") {
    // 10 rows of 9.0e14 at scale 4 -> unscaled total 9e19 > Long.MaxValue;
    // the DECIMAL(38,0) sum path must neither throw nor lose exactness
    import spark.implicits._
    val big = Seq.fill(10)(9.0e14).toDF("x")
    val r = big.agg(
      call_function("scaled_double",
        sum(call_function("dec_scaled", col("x"), lit(4)).cast("decimal(38,0)")),
        lit(4)).as("s"))
      .collect()(0).getDouble(0)
    assert(r == 9.0e15, s"got $r")
  }

  test("dec_scaled matches Spark's double->decimal cast on adversarial values") {
    // the fast path's guard band must push every near-tie to the exact
    // slow path: probe uniform doubles, exact tie points, and values one
    // ulp either side of tie points, at every scale used by the queries
    val rnd = new scala.util.Random(42)
    val probes = Seq.newBuilder[Double]
    (1 to 20000).foreach { _ =>
      probes += (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(10))
    }
    (1 to 2000).foreach { _ =>
      val tie = (rnd.nextInt(2000001) - 1000000) + 0.5 // exact .5 at scale 0
      probes += tie / math.pow(10, rnd.nextInt(7))     // near-tie at scale s
    }
    Seq(0.30000000000000004, 2.675, -2.675, 1e13 + 0.5, -0.12345,
      4.9999999999999994, 0.049999999999999996).foreach(probes += _)
    for (s <- Seq(0, 2, 4, 6)) {
      // domain bound: the scaled value must fit a long (out-of-range
      // throws ArithmeticException by contract — ANSI-loud, never wraps)
      probes.result().filter(x => math.abs(x) < 9e18 / math.pow(10, s))
        .foreach { x =>

        val got = graft.functions.GraftExpressions.decScaled(x, s)
        val want = java.math.BigDecimal.valueOf(x)
          .setScale(s, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
        assert(got == want, s"decScaled($x, $s): got $got want $want")
      }
    }
  }

  test("GraftExtensions registers every function through the extensions path") {
    // `spark.sql.extensions` is a STATIC conf read at SparkContext level,
    // so it can't be probed on the suite's running context; instead apply
    // the extensions object to a fresh registry — the exact call session
    // construction makes — and check all seven functions land.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val names = org.apache.spark.sql.GraftExtensionsProbe
      .registeredFunctionNames(ext).toSet
    assert(Set("vector_dot", "vector_dot_dec", "array_jaccard",
      "array_jaccard_sorted", "shingle_hashes", "dec_scaled",
      "scaled_double").subsetOf(names), s"registered: $names")
  }

  test("gram_hashes law: sort+distinct of the positional hashes IS shingle_hashes") {
    import org.apache.spark.sql.functions._
    // the two expressions share one digest loop by construction; this
    // pins the refactor seam — a drift in either's windowing or hashing
    // breaks the identity
    val df = spark.sql(
      """SELECT array('a','b','c','a','b','c','d') AS ws
        |UNION ALL SELECT array('x') UNION ALL SELECT array('p','q')""".stripMargin)
    val rows = df.select(
      expr("array_sort(array_distinct(gram_hashes(ws, 2)))").as("g"),
      expr("shingle_hashes(ws, 2)").as("s")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"gram/shingle identity broke: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
    // positional semantics: duplicates kept, index order preserved
    val pos = df.filter(size(col("ws")) === 7)
      .select(expr("gram_hashes(ws, 2)").as("g")).head().getSeq[Long](0)
    assert(pos.length == 6, s"expected 6 positional 2-grams, got ${pos.length}")
    assert(pos(0) == pos(3) && pos(1) == pos(4) && pos(2) != pos(5),
      "repeated grams must hash identically at their positions")
  }

  test("dec_scaled + sum + scaled_double equals the decimal-sum formulation") {
    val li = Tables(spark, sfDir).lineitem.limit(20000)
    val r = li.agg(
      call_function("scaled_double",
        sum(call_function("dec_scaled",
          col("l_extendedprice") * (lit(1) - col("l_discount")), lit(6))),
        lit(6)).as("fast"),
      sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(28,6)")).cast("double").as("slow"))
      .collect()(0)
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("nfc_normalize: canonical composition, idempotence, null passthrough") {
    import spark.implicits._
    val rows = Seq(
      "cafe\u0301",   // decomposed -> composed U+00E9
      "caf\u00E9",    // already canonical -> unchanged
      "A\u030A",      // A + combining ring -> U+00C5
      "plain ascii")
      .toDF("s")
      .select(col("s"), call_function("nfc_normalize", col("s")).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0)._2 == "caf\u00E9" && rows(0)._2.length == 4)
    assert(rows(1)._2 == "caf\u00E9")
    assert(rows(2)._2 == "\u00C5")
    assert(rows(3)._2 == "plain ascii")
    // idempotence: normalize(normalize(x)) == normalize(x)
    val twice = Seq("cafe\u0301A\u030A").toDF("s")
      .select(call_function("nfc_normalize",
        call_function("nfc_normalize", col("s"))).as("n2"),
        call_function("nfc_normalize", col("s")).as("n1"))
      .head()
    assert(twice.getString(0) == twice.getString(1))
    val n = Seq[Option[String]](None).toDF("s")
      .select(call_function("nfc_normalize", col("s"))).head()
    assert(n.isNullAt(0), "null must pass through")
  }
}
