package graft

import graft.operators.{GraftStream, KeyedGraftStream}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.scalatest.funsuite.AnyFunSuite

/** Unit suites for the typed operator surface (SURVEY.md §2.1 parity):
  * one test per reference operator row. */
class FlinkStyleSpec extends AnyFunSuite with TestSession {

  test("S1 fromElements: emits the fixed collection") {
    import spark.implicits._
    val out = GraftStream.fromElements(spark, 1, 2, 3).ds.collect().sorted
    assert(out.toSeq == Seq(1, 2, 3))
  }

  test("T1 map: 1-to-1 transform") {
    import spark.implicits._
    val out = GraftStream.fromElements(spark, 1, 2, 3)
      .map(_ * 10).ds.collect().sorted
    assert(out.toSeq == Seq(10, 20, 30))
  }

  test("T2 flatMap: 1-to-N with empty outputs allowed") {
    import spark.implicits._
    val out = GraftStream.fromElements(spark, "a b", "", "c")
      .flatMap(_.split(" ").toSeq.filter(_.nonEmpty))
      .ds.collect().sorted
    assert(out.toSeq == Seq("a", "b", "c"))
  }

  test("T3 filter: drops failing records") {
    import spark.implicits._
    val out = GraftStream.fromElements(spark, 1, 2, 3, 4)
      .filter(_ % 2 == 0).ds.collect().sorted
    assert(out.toSeq == Seq(2, 4))
  }

  test("T4+T5 keyBy + reduce: per-key final fold, first element untouched") {
    import spark.implicits._
    val out = GraftStream.fromElements(spark, ("a", 1), ("b", 5), ("a", 2), ("a", 4))
      .keyBy(_._1)
      .reduce((x, y) => (x._1, x._2 + y._2))
      .map(_._2).collect().toSet
    assert(out == Set(("a", 7), ("b", 5)))
  }

  test("§2.3 sumBy: per-key numeric fold") {
    import spark.implicits._
    val out = GraftStream
      .fromElements(spark, ("a", 1L), ("b", 5L), ("a", 2L))
      .keyBy(_._1)
      .sumBy(Numeric.LongIsIntegral)(_._2)
      .collect().toSet
    assert(out == Set(("a", 3L), ("b", 5L)))
  }

  test("§2.3 minBy/maxBy: whole-record argmin/argmax") {
    import spark.implicits._
    val ks = GraftStream
      .fromElements(spark, ("a", 3.0), ("a", 1.0), ("a", 2.0), ("b", 9.0))
      .keyBy(_._1)
    val mins = ks.minBy(_._2).map(_._2).collect().toSet
    val maxs = ks.maxBy(_._2).map(_._2).collect().toSet
    assert(mins == Set(("a", 1.0), ("b", 9.0)))
    assert(maxs == Set(("a", 3.0), ("b", 9.0)))
  }

  test("WordCount batch slice: flatMap→filter→keyBy→reduce (ref WordCount.java)") {
    import spark.implicits._
    val out = GraftStream
      .fromElements(spark, "hello flink hello", "bye flink")
      .flatMap(_.toLowerCase.split("\\W+").toSeq)
      .filter(_.length >= 4)
      .keyBy(identity[String])
      .kv.mapValues(_ => 1L)
    val counts = new KeyedGraftStream(out).reduce(_ + _).collect().toSet
    assert(counts == Set(("hello", 2L), ("flink", 2L)))
  }

  test("keyBy invariance: result independent of shuffle partition count") {
    import spark.implicits._
    val data = (1 to 1000).map(i => (s"k${i % 7}", i.toLong))
    def run(parts: String): Set[(String, Long)] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try new KeyedGraftStream(
        spark.createDataset(data).groupByKey(_._1).mapValues(_._2))
        .reduce(_ + _).collect().toSet
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(run("1") == run("13"))
  }

  test("process: per-key state machine emits on threshold") {
    import spark.implicits._
    val ks = GraftStream
      .fromElements(spark, ("a", 1L), ("a", 2L), ("b", 10L), ("a", 3L))
      .keyBy(_._1)
    val out = ks.process[Long, (String, Long)](
      GroupStateTimeout.NoTimeout(),
      (key: String, vs: Iterator[(String, Long)], st: GroupState[Long]) => {
        val total = st.getOption.getOrElse(0L) + vs.map(_._2).sum
        st.update(total)
        if (total >= 5L) Iterator((key, total)) else Iterator.empty
      },
      (_: String, _: GroupState[Long]) => Iterator.empty)
    assert(out.collect().toSet == Set(("a", 6L), ("b", 10L)))
  }
}
