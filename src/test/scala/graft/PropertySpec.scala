package graft

import graft.operators.{GraftStream, KeyedGraftStream}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Algebraic-law tests over seeded random inputs (SURVEY.md §5.3):
  * deterministic trials (fixed seeds) rather than a scalacheck runner,
  * same laws. */
class PropertySpec extends AnyFunSuite with TestSession {

  private def randData(seed: Long, n: Int): Seq[(String, Long)] = {
    val r = new Random(seed)
    Seq.fill(n)((s"k${r.nextInt(11)}", r.nextLong(1000)))
  }

  test("filter fusion: filter(p).filter(q) == filter(p && q)") {
    import spark.implicits._
    for (seed <- 1L to 5L) {
      val ds = spark.createDataset(randData(seed, 500))
      val fused = ds.filter(t => t._2 % 2 == 0 && t._2 > 100).collect().toSeq.sorted
      val chained = ds.filter(_._2 % 2 == 0).filter(_._2 > 100).collect().toSeq.sorted
      assert(fused == chained, s"seed=$seed")
    }
  }

  test("map fusion: map(f).map(g) == map(g compose f)") {
    import spark.implicits._
    for (seed <- 1L to 5L) {
      val ds = spark.createDataset(randData(seed, 500))
      val f = (t: (String, Long)) => t._2 + 7
      val g = (x: Long) => x * 3
      assert(ds.map(f).map(g).collect().sorted.toSeq ==
        ds.map(f.andThen(g)).collect().sorted.toSeq, s"seed=$seed")
    }
  }

  test("keyed reduce: invariant under input order and partitioning") {
    import spark.implicits._
    for (seed <- 1L to 3L) {
      val data = randData(seed, 1000)
      def run(d: Seq[(String, Long)], parts: Int): Map[String, Long] =
        new KeyedGraftStream(
          spark.createDataset(d).repartition(parts).groupByKey(_._1)
            .mapValues(_._2))
          .reduce(_ + _).collect().toMap
      val base = run(data, 4)
      assert(run(new Random(seed).shuffle(data), 1) == base, s"seed=$seed order")
      assert(run(data, 13) == base, s"seed=$seed parts")
    }
  }

  test("flatMap then count == sum of per-element output sizes") {
    import spark.implicits._
    for (seed <- 1L to 3L) {
      val r = new Random(seed)
      val data = Seq.fill(200)(Seq.fill(r.nextInt(5))(r.nextInt(100)))
      val ds = spark.createDataset(data)
      assert(ds.flatMap(identity).count() == data.map(_.size).sum)
    }
  }

  test("array_jaccard laws: symmetry, [0,1] bounds, self-similarity = 1") {
    import spark.implicits._
    val r = new Random(7)
    val arrays = Seq.fill(60)(
      Seq.fill(1 + r.nextInt(30))(s"w${r.nextInt(40)}").distinct)
    val df = spark.createDataset(arrays.zipWithIndex).toDF("ws", "id")
    val pairs = df.as("x").crossJoin(df.as("y"))
      .select(
        call_function("array_jaccard", col("x.ws"), col("y.ws")).as("xy"),
        call_function("array_jaccard", col("y.ws"), col("x.ws")).as("yx"),
        (col("x.id") === col("y.id")).as("same"))
      .collect()
    pairs.foreach { row =>
      val (xy, yx, same) = (row.getDouble(0), row.getDouble(1), row.getBoolean(2))
      assert(xy == yx, "symmetry")
      assert(xy >= 0.0 && xy <= 1.0, "bounds")
      if (same) assert(xy == 1.0, "self-similarity")
    }
  }

  test("vector_dot laws: symmetry and Cauchy-Schwarz vs norms") {
    import spark.implicits._
    val r = new Random(11)
    val vecs = Seq.fill(40)(Array.fill(16)(r.nextFloat() * 2 - 1)).zipWithIndex
    val df = spark.createDataset(vecs).toDF("v", "id")
    val rows = df.as("x").crossJoin(df.as("y"))
      .select(
        call_function("vector_dot", col("x.v"), col("y.v")).as("xy"),
        call_function("vector_dot", col("y.v"), col("x.v")).as("yx"),
        call_function("vector_dot", col("x.v"), col("x.v")).as("xx"),
        call_function("vector_dot", col("y.v"), col("y.v")).as("yy"))
      .collect()
    rows.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1), "symmetry")
      assert(math.abs(row.getDouble(0)) <=
        math.sqrt(row.getDouble(2)) * math.sqrt(row.getDouble(3)) + 1e-9,
        "Cauchy-Schwarz")
    }
  }

  test("partition-count invariance: scaled-long folds are order-insensitive") {
    // the decimal-exactness claim in concrete form: representative queries
    // using dec_scaled sums / typed scaled-long folds / broadcast top-k
    // must produce IDENTICAL rows at any shuffle parallelism
    for (name <- Seq("q1_agg", "q_cogroup", "q_text_oov")) {
      def run(parts: Int): Set[String] =
        queries.GraftQuery.withShufflePartitions(spark, parts) {
          SparkEntry.queries(name)(spark, sfDir)
            .collect().map(_.toString).toSet
        }
      assert(run(2) == run(16), s"$name not partition-invariant")
    }
  }

  test("SeqBatch.slices law: complete, contiguous, balanced, overflow-free") {
    import graft.sources.{SeqBatch, SeqInputPartition}
    val r = new Random(7)
    val cases = Seq.fill(200)((r.nextLong(1L << 40).abs,
        r.nextLong(1L << 20).abs, 1 + r.nextInt(64))) ++
      // extreme ranges that overflowed the old i*total formulation
      Seq((0L, Long.MaxValue / 2, 7), (Long.MaxValue / 3, Long.MaxValue / 3, 16))
    for ((s, len, n) <- cases) {
      val e = s + len
      val ps = SeqBatch.slices(s, e, n).map(_.asInstanceOf[SeqInputPartition])
      if (len == 0) assert(ps.isEmpty)
      else {
        assert(ps.head.lo == s && ps.last.hi == e, s"range [$s,$e)x$n not covered")
        ps.sliding(2).foreach {
          case Array(a, b) => assert(a.hi == b.lo, s"gap in [$s,$e)x$n")
          case _ => ()
        }
        val sizes = ps.map(p => p.hi - p.lo)
        assert(sizes.forall(_ > 0) && sizes.max - sizes.min <= 1,
          s"unbalanced slices for [$s,$e)x$n: ${sizes.toSeq}")
      }
    }
  }

  test("packing law: q_pack_sequences output is monotone and start-addressed per shard") {
    // laws over the PRODUCTION gate's output at sf0.001: within each
    // shard, bin ids are non-decreasing in doc order, and every doc's bin
    // equals floor(start-offset / 2048) recomputed independently from the
    // emitted token counts — a regression to end-addressed binning (
    // floor(cum/2048)) fails the recomputation on any doc crossing a
    // boundary
    val rows = SparkEntry.queries("q_pack_sequences")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (shard, docs) =>
      val ordered = docs.sortBy(_._2)
      val bins = ordered.map(_._4)
      assert(bins.sameElements(bins.sorted), s"$shard bins not monotone")
      var start = 0L
      ordered.foreach { case (_, docId, nTok, bin) =>
        assert(bin == start / 2048,
          s"$shard doc $docId: bin $bin != start-addressed ${start / 2048}")
        start += nTok
      }
    }
  }

  test("quantization law: q_sim_quantized output respects ranking and the int bound") {
    // laws over the PRODUCTION gate's output at sf0.001: per query, ranks
    // are 1..k dense, qdot is non-increasing in rank with the vec_id
    // tie-break, every qdot is an integer within the 64*127^2 analytic
    // bound, and no query returns itself
    val rows = SparkEntry.queries("q_sim_quantized")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (qid, ns) =>
      val ordered = ns.sortBy(_._2)
      assert(ordered.map(_._2).sameElements(1L to ordered.length),
        s"query $qid ranks not dense")
      ordered.foreach { case (_, _, cand, qdot) =>
        assert(cand != qid, s"query $qid returned itself")
        assert(math.abs(qdot) <= 64L * 127 * 127,
          s"query $qid qdot $qdot outside int8 bound")
      }
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3),
            s"query $qid ordering violated at rank ${b._2}")
        case _ => ()
      }
    }
  }

  test("substring rewrite law: kept + removed = total tokens, identity off the cut set") {
    import spark.implicits._
    // token conservation: every position is either kept or inside a cut
    // span (spans never overlap after the island merge, so removed =
    // total - kept exactly); docs with zero cuts keep full length. Also
    // cross-checks q_dedup_substring_rewrite against q_dedup_substring:
    // a doc with duplicated spans detected from BOTH sides of a dup pair
    // may still have zero CUTS (it holds the first occurrences), but a
    // doc with cuts must have detected spans.
    val totals = SparkEntry.queries("q_text_tokens")(spark, sfDir)
      .select(col("doc_id"), col("n_words")).as[(Long, Long)]
      .collect().toMap
    val rewrite = SparkEntry.queries("q_dedup_substring_rewrite")(spark, sfDir)
      .select("doc_id", "n_spans_cut", "tokens_removed", "n_tok_kept")
      .as[(Long, Long, Long, Long)].collect()
    assert(rewrite.nonEmpty)
    assert(rewrite.exists(_._2 > 0), "fixture has no duplicated spans to cut?")
    rewrite.foreach { case (doc, spans, removed, kept) =>
      val total = totals.getOrElse(doc, 0L)
      assert(kept + removed == total,
        s"doc $doc: kept $kept + removed $removed != total $total")
      if (spans == 0) assert(removed == 0L && kept == total)
      else assert(removed >= 8L, s"doc $doc: a cut span is shorter than K")
    }
    val detected = SparkEntry.queries("q_dedup_substring")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    rewrite.filter(_._2 > 0).foreach { case (doc, _, _, _) =>
      assert(detected.contains(doc),
        s"doc $doc has cuts but no detected duplicated span")
    }
  }

  test("content-defined chunking is insertion-robust where fixed blocks are not") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the law that justifies q_dedup_cdc_chunks over fixed 16-token
    // blocks: prepending words to a document shifts every fixed block
    // boundary, but content-defined boundaries re-synchronize once the
    // 4-gram window clears the edit — so the original's chunk
    // fingerprints (minus at most the first few) reappear in the
    // edited doc. Driven on a real corpus document for a non-toy token
    // count.
    val base = graft.Tables(spark, sfDir).documents
      .orderBy(col("n_chars").desc).select("text").as[String].head()
    val baseWs = base.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
    assert(baseWs.size >= 60, "fixture doc too short for the law")
    val edited = Seq("inserted", "preamble", "words") ++ baseWs
    val df = Seq((1L, baseWs), (2L, edited)).toDF("doc_id", "ws")
    val ch = graft.queries.DedupQueries.cdcChunks(df)
      .select("doc_id", "fp").as[(Long, String)].collect()
    val fps1 = ch.filter(_._1 == 1L).map(_._2).toSet
    val fps2 = ch.filter(_._1 == 2L).map(_._2).toSet
    val shared = fps1.intersect(fps2).size
    assert(shared >= fps1.size - 2,
      s"CDC chunking lost sync after an insertion: $shared of ${fps1.size} chunks survive")
    assert(shared < fps1.size || fps2.size > fps1.size,
      "edit should perturb at least the head chunk")
  }

  test("BPE replay laws: concatenation invariant + prefix composition, random words/merges") {
    // (a) segmentation is a PARTITION of the word: tokens concatenate
    //     back byte-exactly under arbitrary (possibly pathological)
    //     merge lists; (b) replay(w, a ++ b) equals replaying the rest
    //     over a prefix's output — checked against an INDEPENDENT
    //     inline merge-pass implementation, so a semantic drift in
    //     bpeMergePass (the one the trainer's fold must match) fails
    //     here even if gates stay internally consistent
    val T = graft.queries.TextQueries
    for (seed <- 1L to 5L) {
      val r = new Random(seed)
      val alpha = "abcd"
      def word(n: Int) = Seq.fill(n)(alpha(r.nextInt(alpha.length))).mkString
      val merges = Seq.fill(12) {
        val x = word(1 + r.nextInt(2)); val y = word(1 + r.nextInt(2))
        (x, y)
      }
      for (_ <- 1 to 20) {
        val w = word(1 + r.nextInt(14))
        val toks = T.bpeReplay(w, merges)
        assert(toks.mkString == w,
          s"seed=$seed: replay of '$w' lost bytes: $toks")
        val (a, b) = merges.splitAt(r.nextInt(merges.length + 1))
        // composition: applying b's merges to the a-replayed token seq
        val composed = b.foldLeft(T.bpeReplay(w, a)) { case (ts, (x, y)) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          ts.foreach { t =>
            if (out.nonEmpty && out.last == x && t == y)
              out(out.length - 1) = x + y
            else out += t
          }
          out.toIndexedSeq
        }
        assert(composed == T.bpeReplay(w, merges),
          s"seed=$seed: prefix composition broke on '$w' at split ${a.length}")
      }
    }
  }
}
