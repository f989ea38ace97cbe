package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` — exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * The reference engine has no dedup surface at all (its only keyed
  * operator is the running reduce, `StreamGroupedReduce.java:35`); these are
  * the LLM-pipeline operators the north star adds. Every variant is built
  * from engine-portable primitives (md5 hex strings, integer bit math,
  * exact decimal folds) so the DuckDB oracle reproduces results
  * bit-for-bit.
  *
  * Scale design (100 TB):
  *  - exact dedup = hash-groupBy: one shuffle on the 128-bit digest, no
  *    driver state.
  *  - MinHash+LSH: shingle explode → per-doc signature (map-side combinable
  *    min() aggregates) → band-bucket self-join. The candidate join is on
  *    (band, bucket-hash) — only colliding docs meet, never O(n²).
  *  - SimHash: same banding trick on 8-bit signature bytes (pigeonhole: any
  *    pair within hamming ≤ 3 of a 32-bit sig shares one of 4 bands).
  *  - brute-force variants (ngram, cosine) are the correctness baselines
  *    the LSH paths are validated against; they carry the O(n²) warning and
  *    a cheap-prefilter + exact-confirm structure so the expensive exact
  *    fold only runs on plausible pairs.
  */
object DedupQueries {

  // ---------- shared text primitives (exactly mirrored in the oracle SQL)

  /** Lowercased word tokens with empties dropped. */
  private def words(c: Column): Column =
    filter(split(lower(c), "\\W+"), w => w =!= "")

  private val WORDS_SQL =
    raw"list_filter(string_split_regex(lower(text), '\W+'), w -> w <> '')"

  /** Distinct 3-word shingles ("w1 w2 w3"). Empty when < 3 words. */
  private def shingles(ws: Column): Column =
    when(size(ws) >= 3,
      array_distinct(transform(sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", slice(ws, i, lit(3))))))
      .otherwise(array().cast("array<string>"))

  /** DuckDB mirror: 1-based inclusive slices, range end exclusive. */
  private val SHINGLES_SQL =
    "list_distinct(list_transform(range(1, len(ws) - 1), " +
      "i -> array_to_string(ws[i:i+2], ' ')))"

  /** Per-doc distinct shingle sets, as a subquery both engines share. */
  private val SH_SQL =
    s"(SELECT doc_id, $SHINGLES_SQL AS shingles FROM " +
      s"(SELECT doc_id, $WORDS_SQL AS ws FROM documents))"

  /** Per-doc shingle sets. The repartition matters: `documents` is a
    * single small parquet file → one input partition, and every
    * pair-generating join downstream (BroadcastNestedLoopJoin for the
    * non-equi baselines) parallelizes by STREAM-side partitions — without
    * this, all O(n²) work lands on one core. At 100 TB the scan has
    * thousands of natural splits and this becomes a no-op shuffle of the
    * slim (doc_id, shingles) projection. */
  private def shingleDf(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), shingles(col("ws")).as("shingles"))
      // The shuffle AFTER the shingle projection is load-bearing twice
      // over: (a) it spreads downstream per-pair work across all cores
      // (the single small parquet file scans as one partition, and
      // nested-loop joins parallelize by stream-side partitions);
      // (b) it MATERIALIZES the computed shingle arrays — left inside the
      // join's codegen, deferred evaluation would recompute the whole
      // transform-distinct pipeline once per PAIR instead of once per doc.
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))

  /** Exact Jaccard over two distinct string arrays — integer counts, one
    * IEEE division: engine-identical. Uses graft's native ArrayJaccard
    * expression (count-only, codegen'd) rather than
    * size(array_intersect)/size(array_union), which materializes both
    * result arrays per pair just to count them. */
  private def jaccard(a: Column, b: Column): Column =
    call_function("array_jaccard", a, b)

  private val JACCARD_SQL =
    "CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) / " +
      "CAST(len(list_distinct(list_concat(x.shingles, y.shingles))) AS DOUBLE)"

  val all: Map[String, GraftQuery] = Map(

    // ---- exact dedup: hash-groupBy on the normalized content digest.
    // One shuffle on md5(norm text); survivors = min doc_id per group.
    "q_dedup_exact" -> GraftQuery.sql(
      "exact dedup: group by md5(normalized text), canonical = min doc_id",
      s"""SELECT doc_id, canonical_id, group_size FROM (
         |  SELECT doc_id,
         |    MIN(doc_id) OVER (PARTITION BY fp) AS canonical_id,
         |    COUNT(*) OVER (PARTITION BY fp) AS group_size
         |  FROM (SELECT doc_id,
         |          md5(array_to_string($WORDS_SQL, ' ')) AS fp
         |        FROM documents))""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byFp = Window.partitionBy(col("fp"))
      Tables(spark, dir).documents
        .select(col("doc_id"), md5(array_join(words(col("text")), " ")).as("fp"))
        .select(
          col("doc_id"),
          min(col("doc_id")).over(byFp).as("canonical_id"),
          count(lit(1)).over(byFp).as("group_size"))
    },

    // ---- MinHash + LSH: k=9 signature (min over shingles of
    // md5(seed|shingle)), 3 bands × 3 rows; candidates share a band key;
    // exact Jaccard confirms ≥ 0.5. The md5-min is a valid min-wise hash
    // family and identical across engines.
    "q_dedup_minhash" -> GraftQuery.sql(
      "MinHash(9) + LSH(3 bands of 3) near-dup pairs, Jaccard-confirmed",
      {
        // 9 min-hashes from 3 md5 computations: hash i uses the 8-hex-char
        // chunk (i%4) of md5('(i/4)|'||shingle) — one md5 yields 4
        // independent-enough 32-bit min-wise hashes, cutting the dominant
        // per-shingle hashing cost 3×. Same derivation on both engines.
        val mins = (0 until 9)
          .map(i => s"min(substr(md5('${i / 4}|' || s), ${1 + 8 * (i % 4)}, 8)) AS h$i")
          .mkString(", ")
        s"""WITH sh AS (SELECT doc_id, shingles FROM $SH_SQL sh0),
           |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
           |sig AS (SELECT doc_id, $mins FROM ex GROUP BY doc_id),
           |bands AS (
           |  SELECT doc_id, 0 AS band, md5(h0||h1||h2) AS bk FROM sig
           |  UNION ALL SELECT doc_id, 1, md5(h3||h4||h5) FROM sig
           |  UNION ALL SELECT doc_id, 2, md5(h6||h7||h8) FROM sig),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)
           |SELECT doc_a, doc_b, jac FROM (
           |  SELECT doc_a, doc_b, $JACCARD_SQL AS jac
           |  FROM cand JOIN sh x ON x.doc_id = doc_a
           |            JOIN sh y ON y.doc_id = doc_b)
           |WHERE jac >= 0.5""".stripMargin
      }) { (spark, dir) =>
      val sh = shingleDf(spark, dir).cache()
      val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
      // mirror of the oracle's chunked derivation: 3 md5s -> 9 hashes
      val hashCols = (0 until 9).map { i =>
        min(substring(md5(concat(lit(s"${i / 4}|"), col("s"))),
          1 + 8 * (i % 4), 8)).as(s"h$i")
      }
      val sig = ex.groupBy(col("doc_id"))
        .agg(hashCols.head, hashCols.tail: _*)
      val bands = (0 until 3).map { b =>
        sig.select(
          col("doc_id"), lit(b).as("band"),
          md5(concat(col(s"h${3 * b}"), col(s"h${3 * b + 1}"), col(s"h${3 * b + 2}")))
            .as("bk"))
      }.reduce(_ union _)
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bk") === col("b.bk")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(sh.as("x"), col("doc_a") === col("x.doc_id"))
        .join(sh.as("y"), col("doc_b") === col("y.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          jaccard(col("x.shingles"), col("y.shingles")).as("jac"))
        .filter(col("jac") >= 0.5)
    },

    // ---- n-gram Jaccard, brute force: the exact baseline the LSH variant
    // is validated against. O(n²) by design, so it runs on a
    // deterministic half-sample (even doc_ids) — the LSH query above is
    // the full-corpus path; this one exists to validate it.
    "q_dedup_ngram" -> GraftQuery.sql(
      "sampled all-pairs 3-gram Jaccard ≥ 0.3 (exact baseline for the LSH path)",
      s"""SELECT doc_a, doc_b, jac FROM (
         |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, $JACCARD_SQL AS jac
         |  FROM $SH_SQL x JOIN $SH_SQL y ON x.doc_id < y.doc_id
         |  WHERE x.doc_id % 2 = 0 AND y.doc_id % 2 = 0)
         |WHERE jac >= 0.3""".stripMargin) { (spark, dir) =>
      val sh = shingleDf(spark, dir).filter(col("doc_id") % 2 === 0)
      sh.as("x").join(sh.as("y"), col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          jaccard(col("x.shingles"), col("y.shingles")).as("jac"))
        .filter(col("jac") >= 0.3)
    },

    // ---- SimHash: 32-bit signature from the parity of md5 hex digits of
    // each shingle; candidate pairs share one of four 8-bit bands
    // (pigeonhole covers hamming ≤ 3 exactly; ham = 4 pairs are found iff
    // their differing bits cluster — standard SimHash-LSH semantics, and
    // deterministic on both engines).
    "q_dedup_simhash" -> GraftQuery.sql(
      "SimHash(32) + 4×8-bit band LSH, pairs within hamming ≤ 4",
      s"""WITH ex AS (
         |  SELECT doc_id, unnest(shingles) AS s FROM $SH_SQL sh0),
         |bits AS (
         |  SELECT doc_id, b,
         |    CASE WHEN SUM(CASE WHEN
         |        (strpos('0123456789abcdef', substr(md5(s), b + 1, 1)) - 1) % 2 = 1
         |      THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS bit
         |  FROM ex CROSS JOIN (SELECT unnest(range(32)) AS b) pos
         |  GROUP BY doc_id, b),
         |sig AS (
         |  SELECT doc_id, SUM(CAST(bit AS BIGINT) * (1::BIGINT << b)) AS simhash
         |  FROM bits GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, simhash, b AS band,
         |    (simhash >> (8 * b)) & 255 AS bk
         |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b) pos),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.simhash AS sig_a, b.simhash AS sig_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, ham FROM (
         |  SELECT doc_a, doc_b, bit_count(xor(sig_a, sig_b)) AS ham FROM cand)
         |WHERE ham <= 4""".stripMargin) { (spark, dir) =>
      val ex = shingleDf(spark, dir)
        .select(col("doc_id"), explode(col("shingles")).as("s"))
      val bits = ex
        .select(col("doc_id"), col("s"), explode(sequence(lit(0), lit(31))).as("b"))
        .groupBy(col("doc_id"), col("b"))
        .agg(sum(expr(
          "CASE WHEN (instr('0123456789abcdef', substr(md5(s), b + 1, 1)) - 1) % 2 = 1 " +
            "THEN 1 ELSE -1 END")).as("vote"))
        .select(col("doc_id"), col("b"),
          when(col("vote") > 0, 1L).otherwise(0L).as("bit"))
      val sig = bits.groupBy(col("doc_id"))
        .agg(sum(expr("bit * shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))")).as("simhash"))
      val bands = sig
        .select(col("doc_id"), col("simhash"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .select(col("doc_id"), col("simhash"), col("band"),
          expr("shiftright(simhash, CAST(band AS INT) * 8) & CAST(255 AS BIGINT)").as("bk"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bk") === col("b.bk")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.simhash").as("sig_a"), col("b.simhash").as("sig_b"))
        .distinct()
      cand
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("ham"))
        .filter(col("ham") <= 4)
    },

    // ---- duplicate-cluster assignment: connected components over the
    // MinHash-LSH dup pairs (a dedup pipeline's final step — pairs alone
    // under-merge transitive groups A~B~C). Spark side: iterative min-label
    // propagation, one equi-join per round, rounds ≤ component diameter
    // (the driver loop reads ONE scalar per round for convergence — no
    // data collects). Oracle: recursive CTE computing min reachable id.
    "q_dedup_clusters" -> GraftQuery.sql(
      "connected components over LSH dup pairs: doc -> canonical id",
      {
        val mins = (0 until 9)
          .map(i => s"min(substr(md5('${i / 4}|' || s), ${1 + 8 * (i % 4)}, 8)) AS h$i")
          .mkString(", ")
        s"""WITH RECURSIVE sh AS (SELECT doc_id, shingles FROM $SH_SQL sh0),
           |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
           |sig AS (SELECT doc_id, $mins FROM ex GROUP BY doc_id),
           |bands AS (
           |  SELECT doc_id, 0 AS band, md5(h0||h1||h2) AS bk FROM sig
           |  UNION ALL SELECT doc_id, 1, md5(h3||h4||h5) FROM sig
           |  UNION ALL SELECT doc_id, 2, md5(h6||h7||h8) FROM sig),
           |pairs AS (
           |  SELECT doc_a, doc_b FROM (
           |    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |    FROM bands a JOIN bands b
           |      ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id) c
           |  JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b
           |  WHERE $JACCARD_SQL >= 0.5),
           |edges AS (
           |  SELECT doc_a AS a, doc_b AS b FROM pairs
           |  UNION ALL SELECT doc_b, doc_a FROM pairs),
           |nodes AS (SELECT DISTINCT a AS id FROM edges),
           |reach(id, lab) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.id)
           |SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id""".stripMargin
      }) { (spark, dir) =>
      import org.apache.spark.storage.StorageLevel
      // the dup-pair graph is orders of magnitude smaller than the corpus
      // (only near-duplicates appear); coalescing the iteration frames to
      // a few partitions cuts per-round scheduling cost without touching
      // the heavy candidate-generation stage above
      val pairs = all("q_dedup_minhash").run(spark, dir)
        .select(col("doc_a"), col("doc_b"))
        .coalesce(4)
        .persist(StorageLevel.MEMORY_AND_DISK)
      pairs.count() // materialize the LSH pipeline at full parallelism
      GraftQuery.withShufflePartitions(spark, 4) {
      val edges = pairs
        .union(pairs.select(col("doc_b"), col("doc_a")))
        .toDF("a", "b")
        .persist(StorageLevel.MEMORY_AND_DISK)
      var labels = edges.select(col("a").as("id")).distinct()
        .select(col("id"), col("id").as("lab"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // convergence via the label-sum invariant: per-node min-propagation
      // is monotone non-increasing, so the total strictly decreases every
      // round until fixpoint — one aggregate per round, no diff join
      var prevSum = Long.MaxValue
      var converged = false
      while (!converged) {
        val propagated = labels
          .join(edges, col("id") === col("a"))
          .select(col("b").as("id"), col("lab"))
          .union(labels)
          .groupBy(col("id")).agg(min(col("lab")).as("lab"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val s = Option(propagated.agg(sum(col("lab"))).first().get(0))
          .fold(0L)(_.asInstanceOf[Long]) // null when the pair set is empty
        labels.unpersist()
        labels = propagated
        converged = s == prevSum
        prevSum = s
      }
      edges.unpersist(); pairs.unpersist()
      labels.select(col("id").as("doc_id"), col("lab").as("cluster_id"))
      }
    },

    // ---- embedding-cosine near-dup: cheap double-fold prefilter at 0.44,
    // exact decimal-fold confirm at 0.45. The ≥ 0.01 margin dwarfs any
    // cross-engine FP noise (< 1e-12), so membership is engine-exact while
    // the expensive exact fold runs only on plausible pairs.
    "q_dedup_embedding" -> GraftQuery.sql(
      "embedding near-dup pairs: cosine ≥ 0.45 (prefilter + exact confirm)",
      s"""WITH v AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_sum(list_transform(range(1, len(embedding) + 1),
         |      i -> CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
         |           AS DECIMAL(38,12)))) AS DOUBLE) AS norm2
         |  FROM embeddings),
         |pre AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    a.embedding AS ea, b.embedding AS eb,
         |    sqrt(a.norm2 * b.norm2) AS denom,
         |    list_reduce(list_transform(range(1, len(a.embedding) + 1),
         |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
         |      (acc, x) -> acc + x) AS dot_approx
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id),
         |confirmed AS (
         |  SELECT vec_a, vec_b,
         |    CAST(list_sum(list_transform(range(1, len(ea) + 1),
         |      i -> CAST(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)
         |           AS DECIMAL(38,12)))) AS DOUBLE) / denom AS cos
         |  FROM pre WHERE dot_approx / denom >= 0.44)
         |SELECT vec_a, vec_b, cos FROM confirmed WHERE cos >= 0.45""".stripMargin) { (spark, dir) =>
      val v = Tables(spark, dir).embeddings
        .select(
        col("vec_id"), col("embedding"),
        expr("""CAST(aggregate(transform(sequence(1, size(embedding)),
               |  i -> CAST(CAST(element_at(embedding, i) AS DOUBLE)
               |       * CAST(element_at(embedding, i) AS DOUBLE) AS DECIMAL(38,12))),
               |  CAST(0 AS DECIMAL(38,12)),
               |  (acc, x) -> CAST(acc + x AS DECIMAL(38,12))) AS DOUBLE)""".stripMargin)
          .as("norm2"))
        // shuffle after the norm projection: materializes norm2 and
        // parallelizes the O(n²) pair join (see SimilarityQueries.vectors)
        .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      val pre = v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(
          col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          col("a.embedding").as("ea"), col("b.embedding").as("eb"),
          sqrt(col("a.norm2") * col("b.norm2")).as("denom"),
          // native codegen'd strict left fold — same op order as the
          // oracle's list_reduce, but a primitive loop instead of the
          // interpreted aggregate/transform pipeline
          call_function("vector_dot", col("a.embedding"), col("b.embedding"))
            .as("dot_approx"))
      pre.filter(col("dot_approx") / col("denom") >= 0.44)
        .select(col("vec_a"), col("vec_b"),
          (expr("""CAST(aggregate(transform(sequence(1, size(ea)),
                  |  i -> CAST(CAST(element_at(ea, i) AS DOUBLE)
                  |       * CAST(element_at(eb, i) AS DOUBLE) AS DECIMAL(38,12))),
                  |  CAST(0 AS DECIMAL(38,12)),
                  |  (acc, x) -> CAST(acc + x AS DECIMAL(38,12))) AS DOUBLE)""".stripMargin)
            / col("denom")).as("cos"))
        .filter(col("cos") >= 0.45)
    }
  )
}
