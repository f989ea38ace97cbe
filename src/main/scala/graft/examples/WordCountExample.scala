package graft.examples

import graft.Engine
import graft.operators.{GraftStream, KeyedGraftStream}

/** The reference's single executable program
  * (`flink-examples/.../wordcount/WordCount.java:14-35`:
  * fromElements → flatMap → filter → keyBy → running reduce → print),
  * written against this engine's typed surface. Run with
  * `sbt "runMain graft.examples.WordCountExample"`. */
object WordCountExample {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-wordcount-example")
    import spark.implicits._

    val keyed = GraftStream
      .fromElements(spark,
        "to be or not to be that is the question",
        "whether tis nobler in the mind to suffer")
      .flatMap(_.toLowerCase.split("\\W+").toSeq)
      .filter(_.length >= 4) // the reference filters short tokens
      .keyBy(identity[String])
      .kv.mapValues(_ => 1L)

    new KeyedGraftStream(keyed).reduce(_ + _)
      .toDF("word", "cnt").orderBy($"cnt".desc, $"word").show(false)
    spark.stop()
  }
}
