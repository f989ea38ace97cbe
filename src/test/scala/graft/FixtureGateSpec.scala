package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crafted-corpus semantics for the round-5 gates: the sf fixtures prove
  * oracle equivalence on generated data, but these tiny hand-built
  * corpora pin the INTENDED semantics with known expected outputs —
  * keep-first ordering, short tails, all-duplicate docs, eval-overlap
  * membership, and the PQ invariant that an exact duplicate of a query
  * achieves the minimal asymmetric distance.
  */
class FixtureGateSpec extends AnyFunSuite with TestSession {

  /** Write a documents.parquet fixture into a fresh dir, return the dir. */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fixture-").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", concat(lit("src"), col("doc_id") % 3))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // 16 distinct lowercase tokens per block, blocks disjoint by prefix
  private def block(prefix: String): String =
    (0 until 16).map(i => s"$prefix$i").mkString(" ")

  test("q_dedup_chunks: keep-first across docs, within-doc dups, tails, all-dup docs") {
    val a = block("aa"); val c = block("cc"); val d = block("dd")
    val dir = docsDir(Seq(
      0L -> s"$a ${block("bb")}", // both blocks novel → kept
      1L -> s"$a $c",             // block a duplicates doc 0 → dropped
      2L -> a,                    // ONLY a duplicate block → empty clean text
      3L -> s"$d $d",             // within-doc repeat → kept once
      4L -> "tail only five words"))
    val out = SparkEntry.queries("q_dedup_chunks")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) == ((2L, 2L, s"$a ${block("bb")}")))
    assert(out(1L) == ((2L, 1L, c)), "cross-doc dup block must drop, novel block survive")
    assert(out(2L) == ((1L, 0L, "")), "all-duplicate doc reassembles to empty")
    assert(out(3L) == ((2L, 1L, d)), "within-doc repeat keeps first occurrence only")
    assert(out(4L) == ((1L, 1L, "tail only five words")), "short tail is its own block")
  }

  test("q_decontaminate_bloom: exact clean-corpus membership on a crafted eval split") {
    val dir = docsDir(Seq(
      0L -> "alpha beta gamma delta epsilon zeta",   // eval (0 % 29 = 0)
      29L -> "nu xi omicron pi rho sigma",           // eval
      1L -> "alpha beta gamma delta epsilon other",  // shares a 5-gram → dirty
      2L -> "one two three four five six seven",     // clean
      3L -> "tiny doc"))                             // < 5 words → clean
    val clean = SparkEntry.queries("q_decontaminate_bloom")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 3L),
      s"expected docs {2, 3} to survive decontamination, got $clean")
  }

  test("q_sim_pq: an exact duplicate of a query vector attains the minimal ADC distance") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fixture-").toString
    // 100 deterministic 64-dim vectors; vec 77 is an exact copy of
    // query vec 50 — identical subvectors encode to identical codes, so
    // its ADC is the per-subspace minimum summed: nothing can beat it.
    // Modulus 101 (prime > corpus size) keeps the family aperiodic in i:
    // no OTHER vector coincides with the query (a 13-periodic first cut
    // made vecs 11/24/37/63/76 exact copies too and crowded out 77)
    def vec(i: Int): Array[Float] =
      Array.tabulate(64)(d => (((i * 37 + d * 11) % 101) - 50) / 25.0f)
    (0 until 100).map(i => (i.toLong, if (i == 77) vec(50) else vec(i), i % 4))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val byRank = SparkEntry.queries("q_sim_pq")(spark, dir)
      .filter(col("q_id") === 50)
      .select("rank", "cand_id", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val dup = byRank.find(_._2 == 77L)
    assert(dup.nonEmpty, s"duplicate vector must reach the top-5: ${byRank.toSeq}")
    assert(byRank.forall(_._3 >= dup.get._3 - 1e-12),
      s"duplicate's ADC must be minimal: ${byRank.toSeq}")
  }
}
