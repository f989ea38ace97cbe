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
}
