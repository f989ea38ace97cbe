package graft

import graft.operators.{MediaRecord, MultimodalOps, TopKAggregator}
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit tests for the custom operator classes (beyond their
  * oracle-gated query usage). */
class OperatorUnitSpec extends AnyFunSuite with TestSession {

  test("TopKAggregator: reduce and merge respect the bound and ordering") {
    val agg = new TopKAggregator(3)
    val b = Seq(5.0, 1.0, 9.0, 7.0, 3.0).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) == Seq(9.0, 7.0, 5.0))
    // merge of two partial buffers == aggregate of the union
    val left = Seq(5.0, 1.0).foldLeft(agg.zero)(agg.reduce)
    val right = Seq(9.0, 7.0, 3.0).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(left, right)) == Seq(9.0, 7.0, 5.0))
    assert(agg.finish(agg.merge(right, left)) == Seq(9.0, 7.0, 5.0))
  }

  test("TopKAggregator: distributed result equals local computation") {
    import spark.implicits._
    val data = (1 to 500).map(i => ("k" + i % 3, (i * 37 % 101).toDouble))
    val expected = data.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).sortBy(-_).take(4)
    }
    val got = spark.createDataset(data)
      .groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAggregator(4).toColumn)
      .collect().toMap
    assert(got.view.mapValues(_.toSeq).toMap == expected)
  }

  test("decodeStub: deterministic, media-type-sensitive, hash = md5 hex") {
    val r = MediaRecord(7L, "audio", "hello".getBytes("UTF-8"), "src0")
    val f1 = MultimodalOps.decodeStub(r, "abc")
    val f2 = MultimodalOps.decodeStub(r, "abc")
    assert(f1 == f2, "stub must be deterministic")
    assert(f1.n_bytes == 5 && f1.channels == 2) // audio -> 2 channels
    assert(f1.width == 64 + 5 % 577 && f1.n_frames == 1 + 5 % 30)
    // the mapPartitions pipeline computes real md5 hex
    import spark.implicits._
    val ds = spark.createDataset(Seq(r))
    val decoded = MultimodalOps.decodeAll(ds).collect()(0)
    assert(decoded.content_hash == "5d41402abc4b2a76b9719d911017c592")
  }

  test("mediaFrom: round-robin media types, payload bytes preserved") {
    val media = MultimodalOps.mediaFrom(
      Tables(spark, sfDir).documents, partitions = 4).collect()
    assert(media.nonEmpty)
    media.foreach { m =>
      val expected = Seq("image", "audio", "video")((m.doc_id % 3).toInt)
      assert(m.media_type == expected)
      assert(m.bytes.nonEmpty)
    }
  }
}
