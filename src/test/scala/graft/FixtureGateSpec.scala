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

  // 40 distinct words — enough shingles that appending one word keeps
  // Jaccard ≈ 0.97, far above the 0.5 confirm threshold
  private val baseText = (0 until 40).map(i => s"word$i").mkString(" ")

  test("q_dedup_canonical: the LONGER member wins the election, not the lower id") {
    val dir = docsDir(Seq(
      10L -> baseText,
      11L -> s"$baseText extraword", // near-dup of 10, one token longer
      12L -> "completely unrelated text about nothing in particular here"))
    val out = SparkEntry.queries("q_dedup_canonical")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    // cluster id is the min member (10); canonical is the LONGEST (11)
    assert(out.keySet == Set(10L, 11L), s"only the dup pair is clustered: $out")
    assert(out(10L) == ((10L, 11L, false)), "shorter member must lose despite lower id")
    assert(out(11L) == ((10L, 11L, true)), "longer member must be elected canonical")
  }

  test("q_dedup_incremental: exact beats near, novel incoming docs survive") {
    val dir = docsDir(Seq(
      // historical (id % 4 != 0)
      1L -> baseText,
      2L -> "some other historical document with its own words entirely",
      3L -> "third historical doc full of yet more unique content words",
      // incoming (id % 4 == 0)
      4L -> baseText,                   // exact copy of 1 → dropped (exact)
      8L -> s"$baseText extraword",     // near-dup of 1 → dropped (near)
      12L -> "a genuinely novel incoming document nothing matches at all"))
    val out = SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getBoolean(3)))).toMap
    assert(out.keySet == Set(4L, 8L, 12L), "one row per INCOMING doc only")
    assert(out(4L) == ((Some("exact"), Some(1L), false)))
    assert(out(8L) == ((Some("near"), Some(1L), false)))
    assert(out(12L) == ((None, None, true)), "novel doc must be kept with null match")
  }

  test("q_sample_stratified: exactly min(10, group size) per source, stable picks") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fixture-").toString
    // srcBig has 12 docs (→ 10 sampled), srcRare has 2 (→ both kept)
    (0 until 14).map { i =>
      (i.toLong, s"document number $i with some words",
        "en", if (i < 12) "srcBig" else "srcRare", 30L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run() = SparkEntry.queries("q_sample_stratified")(spark, dir)
      .select("source", "doc_id", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val picks = run()
    assert(picks.count(_._1 == "srcBig") == 10, s"exact-k per source: $picks")
    assert(picks.count(_._1 == "srcRare") == 2, s"small groups keep all members: $picks")
    assert(picks.filter(_._1 == "srcBig").map(_._3) == (1 to 10).toSet)
    assert(run() == picks, "hash-rank sampling must be deterministic across runs")
  }

  test("q_text_redact: crafted PII counts, near-misses, and exact rewrite bytes") {
    val dir = docsDir(Seq(
      5L -> "x.y@z.co hello",       // embedded email → 2 emails total
      6L -> "call 555-1234 now",    // embedded phone → 2 phones
      7L -> "host 1.2.3.4 up",      // embedded IPv4 → 2 ips
      8L -> "near misses 5555-1234 and 1.2.3 stay put"))
    val rows = SparkEntry.queries("q_text_redact")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(rows(5L)._1 == 2 && rows(5L)._2 == 1 && rows(5L)._3 == 1)
    assert(rows(6L)._2 == 2, "embedded 555-1234 must count as a phone")
    assert(rows(7L)._3 == 2, "embedded dotted quad must count as an IP")
    assert(rows(8L) == ((1L, 1L, 1L, rows(8L)._4)),
      "5555-1234 and 1.2.3 are not PII and must not add counts")
    // byte-exact rewrite: doc 5's redacted text, built by hand
    val expected = "contact <EMAIL> or call <PHONE> ip <IP> <EMAIL> hello"
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(expected.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows(5L)._4 == hex, s"redacted bytes differ for doc 5")
  }

  test("q_text_bm25: rare-term doc outranks common-term docs of equal length") {
    // "vector" appears in ONE doc, "table" in five; all docs are 8 words
    // long, one query-term occurrence each — so ranking is pure idf:
    // the rare-term doc must take rank 1
    val filler = "alpha beta gamma delta epsilon zeta eta"
    val dir = docsDir(
      Seq(0L -> s"vector $filler") ++
        (1L to 5L).map(i => i -> s"table $filler"))
    val rows = SparkEntry.queries("q_text_bm25")(spark, dir)
      .select("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.size == 6, s"all six docs match a query term: $rows")
    assert(rows(0L) == 1L, s"rare-term doc must rank first: $rows")
    assert((1L to 5L).map(rows).toSet == (2L to 6L).toSet,
      "common-term docs tie on score and rank by doc_id")
  }

  test("q_quality_audit: crafted violations counted; digest invariant to partitioning") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fixture-").toString
    def write(parts: Int): Unit = Seq(
      (0L, "good doc text", "en", "srcA", 13L),
      (1L, "", "en", "srcA", 0L),              // empty text
      (2L, "short", "en", "srcA", 99L),        // stored n_chars wrong
      (3L, "fine here", "en", "srcB", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    write(1)
    def audit() = SparkEntry.queries("q_quality_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(7)))).toMap
    val a = audit()
    assert(a("srcA") == ((3L, 1L, 1L, a("srcA")._4)),
      s"srcA: 3 docs, 1 empty, 1 length mismatch: $a")
    assert(a("srcB") == ((1L, 0L, 0L, a("srcB")._4)))
    // content digest must not depend on file/partition layout
    write(7)
    val b = audit()
    assert(b("srcA")._4 == a("srcA")._4 && b("srcB")._4 == a("srcB")._4,
      "xor digest must be invariant to row order and partitioning")
  }

  test("q_source_evolution: legacy rows bucket under the sentinel, typed rows keep theirs") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fixture-").toString
    Seq(
      (0L, 100L, "click", 1.5), (1L, 101L, "view", 2.5),
      (2L, 102L, "click", 3.5), (3L, 103L, "view", 4.5))
      .toDF("event_id", "user_id", "event_type", "value")
      // Tables.events expects raw-nanos LongType (nanosAsLong read path)
      .withColumn("ts", lit(1700000000000000000L) + col("event_id") * 1000000L)
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_source_evolution")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    // even ids (0, 2) were written by the legacy generation → sentinel
    assert(out.keySet == Set("<legacy>", "view"), s"buckets: $out")
    assert(out("<legacy>") == ((2L, 5.0)), "legacy = events 0 and 2, null-filled type")
    assert(out("view") == ((2L, 7.0)), "odd ids keep their written event_type")
  }

  test("q_text_simjoin: near-identical pair found, disjoint doc excluded") {
    val shared = (0 until 30).map(i => s"tok$i").mkString(" ")
    // 60 unique-vocabulary filler docs push the corpus past the df ≤ 5%
    // frequency cap's floor (a df=2 shared shingle needs n ≥ 40 to
    // survive) — exactly the regime the cap is designed for
    val filler = (3L until 63L).map(i =>
      i -> (0 until 8).map(j => s"u${i}x$j").mkString(" "))
    val dir = docsDir(Seq(
      0L -> s"$shared alpha beta gamma",
      1L -> s"$shared delta epsilon zeta", // ≥ 27 shared 3-shingles with 0
      2L -> s"${block("zz")} ${block("yy")}") // fully disjoint vocabulary
      ++ filler)
    val out = SparkEntry.queries("q_text_simjoin")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.contains((0L, 1L)), s"near-dup pair missing: $out")
    // shared shingles carry HALF the idf weight of each doc's unique ones
    // (df 2 vs 1), so the crafted cosine lands near 0.7, not ~1
    assert(out((0L, 1L)) > 0.6 && out((0L, 1L)) < 1.0,
      s"shared-prefix cosine out of range: ${out((0L, 1L))}")
    assert(!out.keySet.exists { case (a, b) => a == 2L || b == 2L },
      "disjoint doc must never pair")
  }

  test("q_text_cms: estimates dominate exact counts; heavy hitter ranked first") {
    // 'heavy' appears 40×, every filler token once — the sketch estimate
    // must never under-count (CMS one-sided error) and the true heavy
    // hitter must top the ranking
    val dir = docsDir(Seq(
      0L -> (Seq.fill(40)("heavy") ++ (0 until 30).map(i => s"fill$i"))
        .mkString(" ")))
    val rows = SparkEntry.queries("q_text_cms")(spark, dir).collect()
    assert(rows.forall(r => r.getLong(1) >= r.getLong(2)),
      "CMS estimate under-counted — impossible by construction")
    assert(rows.head.getString(0) == "heavy" && rows.head.getLong(2) == 40L,
      s"heavy hitter not ranked first: ${rows.toSeq}")
  }

  test("q_dedup_substring: crafted spans — adjacency merges, gaps split, whole-doc dups") {
    // doc 0 and doc 1 share two DISJOINT 8-token spans separated by
    // unique filler (two islands each); doc 2 duplicates doc 3 entirely
    // (one maximal span covering the doc); doc 4 is all-unique (absent
    // from the output). K = 8.
    val span1 = (0 until 8).map(i => s"alpha$i").mkString(" ")
    val span2 = (0 until 8).map(i => s"beta$i").mkString(" ")
    val whole = (0 until 20).map(i => s"gamma$i").mkString(" ")
    val dir = docsDir(Seq(
      0L -> s"$span1 u0a u0b u0c $span2",
      1L -> s"$span1 u1a u1b u1c $span2",
      2L -> whole,
      3L -> whole,
      4L -> (0 until 20).map(i => s"solo$i").mkString(" ")))
    val rows = SparkEntry.queries("q_dedup_substring")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!rows.contains(4L), "unique doc reported duplicated spans")
    // docs 0/1: two islands of exactly 8 tokens each (the unique filler
    // keeps them from merging), 16 of 19 tokens duplicated
    for (d <- Seq(0L, 1L)) {
      val (nSpans, dupTok, nTok) = rows(d)
      assert(nSpans == 2 && dupTok == 16 && nTok == 19,
        s"doc $d: expected 2 spans / 16 dup of 19, got ($nSpans, $dupTok, $nTok)")
    }
    // docs 2/3: every position duplicated -> ONE maximal span = the doc
    for (d <- Seq(2L, 3L)) {
      val (nSpans, dupTok, nTok) = rows(d)
      assert(nSpans == 1 && dupTok == 20 && nTok == 20,
        s"doc $d: expected one whole-doc span, got ($nSpans, $dupTok, $nTok)")
    }
  }

  test("q_dedup_substring_rewrite: first occurrence survives, later ones cut") {
    val whole = (0 until 20).map(i => s"delta$i").mkString(" ")
    val dir = docsDir(Seq(
      0L -> whole, // first occurrence by (doc_id, pos): keeps everything
      1L -> whole, // full duplicate: fully cut
      2L -> (0 until 20).map(i => s"keep$i").mkString(" ")))
    val rows = SparkEntry.queries("q_dedup_substring_rewrite")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val (s0, rem0, kept0, fp0) = rows(0L)
    assert(s0 == 0 && rem0 == 0 && kept0 == 20,
      s"first occurrence must survive intact: $s0 spans, $rem0 removed")
    val (s1, rem1, kept1, fp1) = rows(1L)
    assert(s1 == 1 && rem1 == 20 && kept1 == 0 && fp1 == null,
      s"full duplicate must be fully cut: ($s1, $rem1, $kept1, $fp1)")
    val (_, _, kept2, fp2) = rows(2L)
    assert(kept2 == 20 && fp2 != null && fp2.length == 32 && fp2 != fp0,
      "untouched doc must keep its own full fingerprint")
  }

  test("q_quality_gopher: crafted docs trip exactly the intended rules") {
    // doc 0: healthy (60 distinct words incl. stopwords) — keep
    // doc 1: 10 words — fails ONLY r_word_count
    // doc 2: one 2-gram dominates >20% of tokens — fails r_top2gram
    // doc 3: a 5-gram repeated 10x — fails r_dup5gram (41% dup instances)
    val healthy = ("the of and to in is that a " +
      (0 until 52).map(i => s"word$i").mkString(" "))
    val short = "the of and to tiny doc here now so small"
    val loop2 = ("the of and to in is that a " +
      Seq.fill(14)("ping pong").mkString(" ") +
      " " + (0 until 24).map(i => s"pad$i").mkString(" "))
    val rep5 = ("the of and to in is that a " +
      Seq.fill(10)("v w x y z").mkString(" ") +
      " " + (0 until 12).map(i => s"qq$i").mkString(" "))
    val dir = docsDir(Seq(0L -> healthy, 1L -> short, 2L -> loop2, 3L -> rep5))
    val rows = SparkEntry.queries("q_quality_gopher")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
          r.getBoolean(9), r.getBoolean(10), r.getBoolean(11))).toMap
    val (wc0, ml0, st0, t20, d50, keep0) = rows(0L)
    assert(wc0 && ml0 && st0 && t20 && d50 && keep0, s"healthy doc dropped: ${rows(0L)}")
    val r1 = rows(1L)
    assert(!r1._1 && r1._3 && !r1._6, s"short doc must fail word count only-ish: $r1")
    val r2 = rows(2L)
    assert(!r2._4 && !r2._6, s"2-gram loop must fail r_top2gram: $r2")
    val r3 = rows(3L)
    assert(!r3._5 && !r3._6, s"5-gram repetition must fail r_dup5gram: $r3")
  }

  test("q_split_leakage_safe: clusters never straddle; the naive split would") {
    // the property the composition buys, proven on the sf fixture: (a)
    // under cluster-keyed membership every dup cluster lands whole in
    // one split; (b) the naive per-doc hash splits at least one cluster
    // on this corpus — i.e. the gate isn't vacuously equal to
    // q_split_holdout's per-doc rule
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16)
    }
    val labels = SparkEntry.queries("q_dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.nonEmpty, "fixture has no dup clusters?")
    val byCluster = labels.groupBy(_._2).filter(_._2.length >= 2)
    assert(byCluster.nonEmpty, "no multi-member clusters to protect")
    // (a) cluster-keyed split: every member shares the cluster's bucket
    byCluster.foreach { case (cid, members) =>
      val splits = members.map(_ => bucket(cid) < 204).toSet
      assert(splits.size == 1, s"cluster $cid straddles splits")
    }
    // (b) the naive per-doc rule splits at least one of these clusters
    val naiveSplit = byCluster.exists { case (_, members) =>
      members.map { case (doc, _) => bucket(doc) < 204 }.toSet.size == 2
    }
    assert(naiveSplit,
      "per-doc hashing kept every cluster together by luck — fixture too small to prove the property")
  }
}
