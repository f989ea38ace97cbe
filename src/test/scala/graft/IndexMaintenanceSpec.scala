package graft

import graft.streaming.PartitionedStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the persisted-ANN-index maintenance discipline (r10): delete
  * propagation (staged swap on the cell layouts — untouched cells keep
  * their files byte-identical, crash points recover, deleted vectors
  * are irretrievable from every serve path), and the generic
  * PartitionedStore machinery on a non-bucket partition column.
  */
class IndexMaintenanceSpec extends AnyFunSuite with TestSession {

  private val Q = graft.queries.SimilarityQueries

  /** (relative path, size, md5) of every parquet file under `path`. */
  private def fileState(path: String): Map[String, (Long, String)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val base = java.nio.file.Paths.get(path)
    walk(new java.io.File(path))
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString
        base.relativize(f.toPath).toString -> (f.length(), md5)
      }.toMap
  }

  test("persisted PQ index: the codes layout carries no raw vectors and compresses on disk") {
    val root = Q.persistedPqIndex(spark, sfDir)
    val codes = spark.read.parquet(s"$root/codes")
    // compression contract: per-vector payload is the 8-code array ONLY
    assert(codes.columns.sorted.toSeq == Seq("cent_id", "codes", "vec_id"),
      s"codes layout must carry exactly (vec_id, codes, cent_id): ${codes.columns.toSeq}")
    // routing tables sized to the contract: 8 subspaces x 16 codes, and
    // ceil(sqrt(n)) coarse centroids; every corpus vector has one code row
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(spark.read.parquet(s"$root/codebook").count() == 128L)
    assert(spark.read.parquet(s"$root/centroids").count()
      == math.ceil(math.sqrt(n.toDouble)).toLong)
    assert(codes.count() == n)
    // the compression is real where it counts — on disk: the codes layout
    // is a fraction of the raw-embedding cell layout over the same corpus
    def bytes(path: String): Long =
      fileState(path).values.map(_._1).sum
    val codesBytes = bytes(s"$root/codes")
    val rawBytes = bytes(s"${Q.persistedIvfIndex(spark, sfDir)}/cells")
    info(f"codes layout $codesBytes bytes vs raw cells $rawBytes (${
      rawBytes.toDouble / codesBytes}%.1fx)")
    assert(codesBytes * 2 < rawBytes,
      s"codes layout ($codesBytes B) should be well under the raw layout ($rawBytes B)")
    // the stored coarse assignment is the recomputable one: re-deriving
    // it from the persisted routing table changes nothing
    val routing = spark.read.parquet(s"$root/centroids")
    val stored = codes.select(col("vec_id"), col("cent_id"))
    val fresh = Q.assignToCentroids(
      spark.read.parquet(s"${Q.persistedIvfIndex(spark, sfDir)}/cells")
        .select("vec_id", "label", "embedding", "norm2"), routing)
    assert(stored.exceptAll(fresh).isEmpty && fresh.exceptAll(stored).isEmpty,
      "stored coarse assignment diverges from the persisted routing table")
  }

  test("index delete: only the delete set's cells rewritten; untouched cells byte-identical") {
    import spark.implicits._
    // stepwise copy so the byte-stability is observable across the delete
    val root = s"/tmp/graft-idxmaint-del-${System.nanoTime()}"
    PartitionedStore.copyTree(
      new java.io.File(Q.persistedIvfIndex(spark, sfDir)),
      new java.io.File(root))
    val cells = s"$root/cells"
    val before = fileState(cells)
    assert(before.nonEmpty)
    val del = Q.vectorsForSpec(spark, sfDir).filter(col("vec_id") % 10 === 3)
    val pcents = spark.read.parquet(s"$root/centroids")
    val delAsg = Q.assignToCentroids(del, pcents)
    // the delete set's recomputed assignment equals its STORED assignment
    // — the "touched cells without a full scan" resolution is exact
    val stored = spark.read.parquet(cells)
      .filter(col("vec_id") % 10 === 3).select("vec_id", "cent_id")
    val divergent = delAsg.as("a")
      .join(stored.as("s"), "vec_id")
      .filter(col("a.cent_id") =!= col("s.cent_id")).count()
    assert(divergent == 0,
      s"$divergent delete vectors resolve to a different cell than stored")
    val touched = delAsg.select("cent_id").distinct()
      .collect().map(_.get(0).toString).toSet
    assert(touched.nonEmpty)
    PartitionedStore.deleteKeys(spark, cells, "cent_id", delAsg, Seq("vec_id"))
    val after = fileState(cells)
    val unBefore = before.filter { case (p, _) =>
      !touched.exists(c => p.startsWith(s"cent_id=$c/")) }
    val unAfter = after.filter { case (p, _) =>
      !touched.exists(c => p.startsWith(s"cent_id=$c/")) }
    assert(unBefore == unAfter,
      "delete rewrote cells outside the delete set's assignment")
    // content: exactly the deleted vec_ids are gone
    val gotIds = spark.read.parquet(cells).select("vec_id")
      .as[Long].collect().toSet
    val wantIds = Q.vectorsForSpec(spark, sfDir).select("vec_id")
      .as[Long].collect().toSet.filterNot(_ % 10 == 3)
    assert(gotIds == wantIds,
      s"post-delete ids diverge: missing=${(wantIds -- gotIds).take(5)} extra=${(gotIds -- wantIds).take(5)}")
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("index delete: a crash mid-swap on the cell layout recovers to the exact set difference") {
    import spark.implicits._
    val root = s"/tmp/graft-idxmaint-crash-${System.nanoTime()}"
    PartitionedStore.copyTree(
      new java.io.File(Q.persistedIvfIndex(spark, sfDir)),
      new java.io.File(root))
    val cells = s"$root/cells"
    val del = Q.vectorsForSpec(spark, sfDir).filter(col("vec_id") % 10 === 3)
    val delAsg = Q.assignToCentroids(del,
      spark.read.parquet(s"$root/centroids"))
    val nCells = delAsg.select("cent_id").distinct().count().toInt
    assert(nCells >= 2, s"fixture needs >= 2 touched cells, got $nCells")
    PartitionedStore.deleteKeys(spark, cells, "cent_id", delAsg,
      Seq("vec_id"), crashAfterSwaps = 1)
    assert(new java.io.File(s"$cells/_graft_staging_delete/_graft_touched").exists(),
      "committed staging missing after injected crash")
    // recovery (the write-path form) completes the delete
    PartitionedStore.recoverPendingDelete(cells)
    val gotIds = spark.read.parquet(cells).select("vec_id")
      .as[Long].collect().toSet
    val wantIds = Q.vectorsForSpec(spark, sfDir).select("vec_id")
      .as[Long].collect().toSet.filterNot(_ % 10 == 3)
    assert(gotIds == wantIds, "crash-point recovery diverged from set difference")
    assert(!new java.io.File(s"$cells/_graft_staging_delete").exists())
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("index compaction: 3 upsert waves accumulate files, compact folds only over-bound cells, content identical") {
    import spark.implicits._
    val root = s"/tmp/graft-idxmaint-compact-${System.nanoTime()}"
    Q.buildBaseIvfIndex(spark, sfDir, root)
    (0 until 3).foreach(w => Q.upsertIvfWave(spark, sfDir, root, w))
    val cells = s"$root/cells"
    val counts0 = PartitionedStore.partFileCounts(cells, "cent_id")
    assert(counts0.values.exists(_ > 1),
      s"3 waves accumulated no extra file generations: $counts0")
    val wantContent = spark.read.parquet(cells)
      .select("vec_id", "cent_id").as[(Long, Long)].collect().toSet
    val before = fileState(cells)
    val over = counts0.filter(_._2 > 1).keys.toSet
    val compacted = PartitionedStore.compact(spark, cells, "cent_id",
      maxFiles = 1)
    assert(compacted.toSet == over,
      s"compacted $compacted, expected exactly the over-bound cells $over")
    // file bound holds everywhere afterwards
    val counts1 = PartitionedStore.partFileCounts(cells, "cent_id")
    assert(counts1.values.forall(_ <= 1),
      s"file bound violated after compact: $counts1")
    // under-bound cells byte-identical
    val unBefore = before.filter { case (p, _) =>
      !over.exists(c => p.startsWith(s"cent_id=$c/")) }
    val unAfter = fileState(cells).filter { case (p, _) =>
      !over.exists(c => p.startsWith(s"cent_id=$c/")) }
    assert(unBefore == unAfter, "compaction rewrote an under-bound cell")
    // content identical
    val gotContent = spark.read.parquet(cells)
      .select("vec_id", "cent_id").as[(Long, Long)].collect().toSet
    assert(gotContent == wantContent, "compaction changed index content")
    // idempotent
    assert(PartitionedStore.compact(spark, cells, "cent_id", 1).isEmpty)
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("q_sim_index_compact serve rows equal q_sim_index_upsert's (same corpus, different physical history)") {
    val a = SparkEntry.queries("q_sim_index_compact")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val b = SparkEntry.queries("q_sim_index_upsert")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(a == b,
      s"compacted serve diverges from one-shot upsert serve: only-compact=${(a -- b).take(3)} only-upsert=${(b -- a).take(3)}")
  }

  test("streaming index upsert: checkpoint restart + batch redelivery never duplicate index rows") {
    import spark.implicits._
    import graft.streaming.Streams
    val root = s"/tmp/graft-idxmaint-stream-${System.nanoTime()}"
    Q.buildBaseIvfIndex(spark, sfDir, root)
    val cents = spark.read.parquet(s"$root/centroids")
    val name = Streams.fresh("spec_stream_idx", sfDir)
    val inc = Tables(spark, sfDir).embeddings
      .filter(col("vec_id") % 10 === 9)
      .select(col("vec_id"), col("label"), col("embedding"))
    val incIds = inc.select("vec_id").as[Long].collect().toSet
    val mid = incIds.toSeq.sorted.apply(incIds.size / 2)
    val srcDir = Streams.stage(inc.filter(col("vec_id") < mid), name, files = 2)
    def runStream(): Unit = graft.queries.GraftQuery
      .withTinyStateStreaming(spark, 8) {
      val q = Streams.fileStream(spark, srcDir, filesPerTrigger = 1)
        .writeStream.queryName(name)
        .option("checkpointLocation", Streams.ckpt(name))
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          Q.landIngestBatch(b, id, root, cents); ()
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    def ingestIds(): Seq[Long] = spark.read.parquet(s"$root/ingest")
      .select("vec_id").as[Long].collect().toSeq
    runStream() // first half of the corpus, 2 micro-batches
    val afterA = ingestIds()
    assert(afterA.toSet == incIds.filter(_ < mid), "wave A landed wrong rows")
    assert(afterA.distinct.size == afterA.size, "wave A duplicated rows")
    // simulate downtime: more files arrive, then the query RESTARTS from
    // its checkpoint — only the new files may be processed
    Streams.stage(inc.filter(col("vec_id") >= mid), name, files = 2,
      mode = "append")
    runStream()
    val afterB = ingestIds()
    assert(afterB.toSet == incIds,
      s"restart lost rows: missing=${(incIds -- afterB.toSet).take(5)}")
    assert(afterB.distinct.size == afterB.size,
      "restart REPROCESSED already-landed files — duplicate index rows")
    // at-least-once redelivery of an already-landed batch id: the
    // overwrite-own-dir landing must rewrite, not double-count
    val b0 = spark.read.parquet(s"$root/ingest").filter(col("bid") === 0)
      .select("vec_id", "label", "embedding")
    assert(b0.count() > 0)
    Q.landIngestBatch(b0, 0, root, cents)
    val afterRedeliver = ingestIds()
    assert(afterRedeliver.sorted == afterB.sorted,
      "redelivered batch changed ingest content")
    // streamed vectors are retrievable through the gate's serve
    val rows = SparkEntry.queries("q_stream_index_upsert")(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
    assert(rows.exists(_.getLong(0) % 10 == 9),
      "no streamed vector ever queried the index")
    assert(rows.exists(_.getLong(1) % 10 == 9),
      "no streamed vector was retrieved as a neighbor")
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("warm-start retrain: only changed-membership cells rewritten; layout equals the new assignment exactly") {
    import spark.implicits._
    val root = s"/tmp/graft-idxmaint-retrain-${System.nanoTime()}"
    PartitionedStore.copyTree(
      new java.io.File(Q.upsertedIvfIndex(spark, sfDir)),
      new java.io.File(root))
    val before = fileState(s"$root/cells")
    val (asg0, asg1, changed) = Q.warmStartRetrain(spark, sfDir, root)
    // fixture guard: the round must actually move vectors, or the gate
    // (and the byte-identity claim) is vacuous
    assert(changed.nonEmpty,
      "warm-start round moved nothing — retrain gate proves nothing on this fixture")
    val changedSet = changed.map(_.toString).toSet
    info(s"round moved vectors across ${changedSet.size} cells: " +
      changedSet.toSeq.sorted.mkString(","))
    val after = fileState(s"$root/cells")
    val unBefore = before.filter { case (p, _) =>
      !changedSet.exists(c => p.startsWith(s"cent_id=$c/")) }
    val unAfter = after.filter { case (p, _) =>
      !changedSet.exists(c => p.startsWith(s"cent_id=$c/")) }
    assert(unBefore == unAfter,
      "retrain rewrote a cell whose membership did not change")
    // the rewritten layout IS the new assignment: (vec_id -> cent_id)
    // read back equals asg1 for every vector
    val stored = spark.read.parquet(s"$root/cells")
      .select("vec_id", "cent_id").as[(Long, Long)].collect().toSet
    val want = asg1.select("vec_id", "cent_id")
      .as[(Long, Long)].collect().toSet
    assert(stored == want,
      s"post-retrain layout diverges from asg1: extra=${(stored -- want).take(3)} missing=${(want -- stored).take(3)}")
    // sanity: asg0 is the stored pre-retrain membership (copy of the
    // upserted index), so flows are conserved: Σarrived == Σdeparted
    val movedN = asg0.as("a").join(asg1.as("b"), "vec_id")
      .filter(col("a.cent_id") =!= col("b.cent_id")).count()
    assert(movedN > 0)
    // the v2 centroid table landed beside the frozen one
    assert(new java.io.File(s"$root/centroids_v2").exists())
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("ingest fold: bid= generations merge into cells via staged swap; crash-retry converges without duplicates") {
    import spark.implicits._
    // two independent copies of the streamed index: clean fold + crashed fold
    val streamRoot = Q.streamUpsertedIvfIndex(spark, sfDir)
    val rootA = s"/tmp/graft-idxmaint-fold-${System.nanoTime()}"
    val rootB = s"${rootA}-crash"
    PartitionedStore.copyTree(new java.io.File(streamRoot), new java.io.File(rootA))
    PartitionedStore.copyTree(new java.io.File(streamRoot), new java.io.File(rootB))
    def content(root: String): Seq[(Long, Long)] = {
      val cells = spark.read.parquet(s"$root/cells")
        .select("vec_id", "cent_id").as[(Long, Long)].collect().toSeq
      val ing = new java.io.File(s"$root/ingest")
      val streamed = if (ing.exists())
        spark.read.parquet(s"$root/ingest")
          .select("vec_id", "cent_id").as[(Long, Long)].collect().toSeq
      else Seq.empty
      cells ++ streamed
    }
    val want = content(rootA).toSet
    val before = fileState(s"$rootA/cells")
    // clean fold
    val touched = Q.foldIngest(spark, rootA).map(_.toString).toSet
    assert(touched.nonEmpty, "fold touched no cells — no streamed rows?")
    assert(!new java.io.File(s"$rootA/ingest").exists(),
      "ingest dirs survived a completed fold")
    val gotA = content(rootA)
    assert(gotA.size == gotA.distinct.size, "fold duplicated rows")
    assert(gotA.toSet == want, "fold lost or invented rows")
    val unBefore = before.filter { case (p, _) =>
      !touched.exists(c => p.startsWith(s"cent_id=$c/")) }
    val unAfter = fileState(s"$rootA/cells").filter { case (p, _) =>
      !touched.exists(c => p.startsWith(s"cent_id=$c/")) }
    assert(unBefore == unAfter, "fold rewrote a cell with no landed rows")
    // crash after ONE swap: staging committed, ingest still present;
    // a re-run must converge to the identical keyed content
    Q.foldIngest(spark, rootB, crashAfterSwaps = 1)
    assert(new java.io.File(s"$rootB/cells/_graft_staging_delete").exists(),
      "crash injection left no staging")
    Q.foldIngest(spark, rootB)
    val gotB = content(rootB)
    assert(gotB.size == gotB.distinct.size,
      "crash-retry fold duplicated rows (keyed merge broken)")
    assert(gotB.toSet == want, "crash-retry fold diverged")
    assert(!new java.io.File(s"$rootB/ingest").exists())
    // folding never changes the serve result
    val a = SparkEntry.queries("q_stream_index_fold")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val b = SparkEntry.queries("q_stream_index_upsert")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(a == b, "folded serve diverges from union serve")
    Seq(rootA, rootB).foreach(r =>
      PartitionedStore.rmTreeForSpec(new java.io.File(r)))
  }

  test("q_sim_index_delete: deleted vectors retrievable from NO serve path, and were retrievable before") {
    // pre-delete serves DID retrieve %10=3 vectors (so the gate's empty
    // intersection is a real removal, not a vacuous query-set artifact)
    val preP = SparkEntry.queries("q_sim_index_persisted")(spark, sfDir)
      .select("neighbor_id").collect().map(_.getLong(0))
    val preT = SparkEntry.queries("q_sim_index_trained")(spark, sfDir)
      .select("neighbor_id").collect().map(_.getLong(0))
    assert((preP ++ preT).exists(_ % 10 == 3),
      "fixture: no %10=3 vector was ever a pre-delete neighbor — gate proves nothing")
    val rows = SparkEntry.queries("q_sim_index_delete")(spark, sfDir)
      .select("path", "query_id", "neighbor_id").collect()
    assert(rows.nonEmpty)
    val paths = rows.map(_.getString(0)).toSet
    assert(paths == Set("persisted", "trained", "routed"),
      s"expected all three serve paths, got $paths")
    val leaked = rows.filter(r =>
      r.getLong(1) % 10 == 3 || r.getLong(2) % 10 == 3)
    assert(leaked.isEmpty,
      s"deleted vectors still retrievable: ${leaked.take(5).toSeq}")
  }

  test("multi-level delete on the (label, cent_id) layout: only touched leaves rewritten; crash recovers") {
    import spark.implicits._
    val rootA = s"/tmp/graft-idxmaint-2lvl-${System.nanoTime()}"
    val rootB = s"$rootA-crash"
    Seq(rootA, rootB).foreach(r => PartitionedStore.copyTree(
      new java.io.File(Q.filteredIvfIndex(spark, sfDir)),
      new java.io.File(r)))
    val del = Q.vectorsForSpec(spark, sfDir).filter(col("vec_id") % 10 === 3)
    def delKeys(root: String) = del.select(col("vec_id"), col("label"))
      .join(Q.assignToCentroids(del,
        spark.read.parquet(s"$root/centroids")), "vec_id")
    // the recomputed (label, cell) resolution equals the STORED pairs
    val storedPairs = spark.read.parquet(s"$rootA/cells")
      .filter(col("vec_id") % 10 === 3)
      .select("vec_id", "label", "cent_id")
    val divergent = delKeys(rootA).as("a")
      .join(storedPairs.as("s"), "vec_id")
      .filter(col("a.cent_id") =!= col("s.cent_id")
        || col("a.label") =!= col("s.label")).count()
    assert(divergent == 0,
      s"$divergent delete vectors resolve to a different (label, cell) than stored")
    val touched = delKeys(rootA).select("label", "cent_id").distinct()
      .collect().map(r => s"label=${r.get(0)}/cent_id=${r.get(1)}/").toSet
    assert(touched.size >= 2, s"fixture needs >= 2 touched leaves: $touched")
    val before = fileState(s"$rootA/cells")
    PartitionedStore.deleteKeys(spark, s"$rootA/cells",
      Seq("label", "cent_id"), delKeys(rootA), Seq("vec_id"), Int.MaxValue)
    val after = fileState(s"$rootA/cells")
    val unBefore = before.filter { case (p, _) => !touched.exists(p.startsWith) }
    val unAfter = after.filter { case (p, _) => !touched.exists(p.startsWith) }
    assert(unBefore == unAfter,
      "two-level delete rewrote leaves outside the delete set's (label, cell) resolution")
    val wantIds = Q.vectorsForSpec(spark, sfDir).select("vec_id")
      .as[Long].collect().toSet.filterNot(_ % 10 == 3)
    assert(spark.read.parquet(s"$rootA/cells").select("vec_id")
      .as[Long].collect().toSet == wantIds,
      "two-level delete content diverged from set difference")
    // crash after ONE swap on the second copy: the marker-driven
    // recovery must complete the remaining leaf swaps exactly
    PartitionedStore.deleteKeys(spark, s"$rootB/cells",
      Seq("label", "cent_id"), delKeys(rootB), Seq("vec_id"),
      crashAfterSwaps = 1)
    assert(new java.io.File(
      s"$rootB/cells/_graft_staging_delete/_graft_touched").exists(),
      "committed staging missing after injected crash")
    PartitionedStore.recoverPendingDelete(s"$rootB/cells")
    assert(spark.read.parquet(s"$rootB/cells").select("vec_id")
      .as[Long].collect().toSet == wantIds,
      "two-level crash-point recovery diverged from set difference")
    assert(!new java.io.File(s"$rootB/cells/_graft_staging_delete").exists())
    Seq(rootA, rootB).foreach(r =>
      PartitionedStore.rmTreeForSpec(new java.io.File(r)))
  }

  test("q_sim_index_delete_all: deleted vectors retrievable from NONE of the five persisted serve paths") {
    // pre-delete, the pq and filtered serves DID retrieve %10=3 vectors
    // (so the post-delete empty intersection is a real removal)
    val prePq = SparkEntry.queries("q_sim_index_pq")(spark, sfDir)
      .select("cand_id").collect().map(_.getLong(0))
    val preF = SparkEntry.queries("q_sim_index_filtered")(spark, sfDir)
      .select("neighbor_id").collect().map(_.getLong(0))
    assert(prePq.exists(_ % 10 == 3) && preF.exists(_ % 10 == 3),
      "fixture: no %10=3 vector was a pre-delete pq/filtered neighbor — gate proves nothing")
    val rows = SparkEntry.queries("q_sim_index_delete_all")(spark, sfDir)
      .select("path", "query_id", "neighbor_id").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSet == Set("pq", "filtered"),
      s"expected the pq and filtered serve paths: ${rows.map(_.getString(0)).toSet}")
    val leaked = rows.filter(r =>
      r.getLong(1) % 10 == 3 || r.getLong(2) % 10 == 3)
    assert(leaked.isEmpty,
      s"deleted vectors still retrievable from compressed/filtered layouts: ${leaked.take(5).toSeq}")
    // the set-level claim across ALL FIVE paths: union this gate with
    // q_sim_index_delete's three raw-layout serves
    val all5 = rows ++ SparkEntry.queries("q_sim_index_delete")(spark, sfDir)
      .select("path", "query_id", "neighbor_id").collect()
    assert(all5.map(_.getString(0)).toSet
      == Set("persisted", "trained", "routed", "pq", "filtered"))
    assert(!all5.exists(r => r.getLong(1) % 10 == 3 || r.getLong(2) % 10 == 3),
      "a deleted vector is retrievable from at least one of the five serve paths")
  }

  test("maintenance planner: wear triggers fold (not retrain); post-repair signals read back in-bound") {
    val (root, pre, post) = Q.plannedIvfIndex(spark, sfDir)
    info(s"pre=$pre -> actions=${pre.actions.mkString(",")}; post=$post")
    assert(pre.pendingGens > 0 && pre.fold,
      "scenario lost its pending ingest generations — fold trigger unproven")
    assert(!pre.retrain,
      s"healthy layout tripped the retrain dial: imbalance=${pre.imbalance}")
    assert(pre.actions.headOption.contains("fold"))
    // decisions are pure functions of the signals — what ran is exactly
    // what the signals triggered; the post-read certifies the repairs
    assert(post.pendingGens == 0, s"fold left pending generations: $post")
    assert(post.overBound.isEmpty, s"file bound violated post-repair: $post")
    assert(post.imbalance <= Q.PLANNER_IMBALANCE_MAX)
    assert(post.actions.isEmpty, s"planner did not converge: ${post.actions}")
    assert(!new java.io.File(s"$root/ingest").exists(),
      "ingest dirs survived the planned fold")
  }

  test("maintenance planner: a corrupted assignment trips the retrain dial; the seeded round repairs it") {
    // sf0.01: 20 cells / 500 rows — enough cells that merging half of
    // them into one dir pushes the imbalance factor over the 4.0 dial
    // (sf0.001's 7 cells mathematically cannot: max(k+1)(C-k)/C < 2.3)
    val dir01 = "/root/testdata/sf0.01"
    val root = s"/tmp/graft-idxmaint-planner-${System.nanoTime()}"
    PartitionedStore.copyTree(
      new java.io.File(Q.upsertedIvfIndex(spark, dir01)),
      new java.io.File(root))
    // corrupt the STORED assignment physically: move half the cells'
    // files into the first cell's dir — the partition value is derived
    // from the dir name, so moved rows read back as (wrong) members of
    // the target cell, exactly the drift shape retrain exists to repair
    val cellsDir = new java.io.File(s"$root/cells")
    val dirs = cellsDir.listFiles().filter(_.getName.startsWith("cent_id="))
      .sortBy(_.getName.stripPrefix("cent_id=").toLong)
    val target = dirs.head
    dirs.tail.take(dirs.length / 2).foreach { d =>
      val cellId = d.getName.stripPrefix("cent_id=")
      Option(d.listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".parquet"))
        .foreach { f =>
          // unique target name (partitionBy reuses part-names across
          // cell dirs) and drop the .crc sidecar (its name no longer
          // matches, and LocalFS would flag the stale checksum)
          new java.io.File(d, s".${f.getName}.crc").delete()
          assert(f.renameTo(new java.io.File(target, s"c$cellId-${f.getName}")))
        }
    }
    val n0 = spark.read.parquet(s"$root/cells").count()
    val pre = Q.planMaintenance(spark, root)
    info(s"corrupted: imbalance=${pre.imbalance} actions=${pre.actions.mkString(",")}")
    assert(pre.retrain,
      s"corruption did not trip the retrain dial: imbalance=${pre.imbalance}")
    assert(!pre.fold, "no ingest exists — fold must not trigger")
    Q.runMaintenance(spark, dir01, root, pre)
    val post = Q.planMaintenance(spark, root)
    info(s"repaired: imbalance=${post.imbalance}")
    assert(post.imbalance < pre.imbalance,
      s"retrain did not reduce imbalance: ${pre.imbalance} -> ${post.imbalance}")
    assert(!post.retrain,
      s"post-repair imbalance still over the dial: ${post.imbalance}")
    // repair moved rows between cells, never lost or invented any
    assert(spark.read.parquet(s"$root/cells").count() == n0)
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("streaming serve: a crashed fold between serve reads never changes results (read-path recovery)") {
    import org.apache.spark.sql.functions.col
    val root = s"/tmp/graft-idxmaint-servefold-${System.nanoTime()}"
    PartitionedStore.copyTree(
      new java.io.File(Q.streamUpsertedIvfIndex(spark, sfDir)),
      new java.io.File(root))
    // one serve read = what a streaming-serve micro-batch does: the
    // crash-consistent keyed read, then the pruned probe
    def serveAll(): Set[Seq[Any]] = {
      val all = Q.readIndexCells(spark, root)
      val probes = all.filter(col("vec_id") % 25 === 19)
        .select(col("vec_id").as("query_id"), col("cent_id").as("cell"),
          col("embedding").as("qemb"), col("norm2").as("qnorm2"))
      Q.probeServeFrames(spark, all, "cent_id", probes, "cos", 3)
        .collect().map(_.toSeq).toSet
    }
    val before = serveAll()
    assert(before.nonEmpty)
    // maintenance crashes mid-fold: staging COMMITTED but only one swap
    // done, ingest dirs still present — the worst read-side moment
    Q.foldIngest(spark, root, crashAfterSwaps = 1)
    assert(new java.io.File(
      s"$root/cells/_graft_staging_delete/_graft_touched").exists(),
      "crash injection left no committed staging")
    val during = serveAll()
    assert(during == before,
      "serve read during the mid-fold crash window diverged")
    assert(!new java.io.File(s"$root/cells/_graft_staging_delete").exists(),
      "read path did not complete the committed staging")
    // the fold retry converges; the post-fold serve is still identical
    Q.foldIngest(spark, root)
    assert(!new java.io.File(s"$root/ingest").exists())
    assert(serveAll() == before, "post-fold serve diverged")
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("PQ-encode-on-ingest: streamed codes equal a from-scratch batch encode against the same codebook") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = Q.streamPqIndex(spark, sfDir)
    val cb = spark.read.parquet(s"$root/codebook")
    val cents = spark.read.parquet(s"$root/centroids")
    val v = Q.vectorsForSpec(spark, sfDir)
    val b = v.count() * 9 / 10
    // the streamed slice landed completely, across >= 2 micro-batches
    val ingest = spark.read.parquet(s"$root/codes_ingest")
    assert(ingest.select("bid").distinct().count() >= 2,
      "expected >= 2 encode micro-batches")
    assert(ingest.select("vec_id").as[Long].collect().toSet
      == v.filter(col("vec_id") >= b).select("vec_id")
        .as[Long].collect().toSet,
      "streamed slice incompletely encoded")
    def codeSet(df: org.apache.spark.sql.DataFrame) =
      // partition-dir inference types cent_id as int on read-back —
      // normalize to long before comparing against the in-memory side
      df.select(col("vec_id"), col("codes"), col("cent_id").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2)))
        .toSet
    // base codes ∪ streamed codes == one batch encode of the FULL
    // corpus against the same frozen codebook + routing table: the
    // "streamed equals rebuilt" claim at the code level, bit-exact
    val stored = codeSet(spark.read.parquet(s"$root/codes")
      .unionByName(ingest.drop("bid")))
    val (codesAll, _) = Q.pqCodesLuts(Q.pqSlices(v), cb)
    val expected = codeSet(
      codesAll.join(Q.assignToCentroids(v, cents), "vec_id"))
    assert(stored == expected,
      s"streamed codes diverge from the batch rebuild: extra=${(stored -- expected).take(3)} missing=${(expected -- stored).take(3)}")
  }

  test("codes-tier fold: planner triggers it, staged swap merges code generations, untouched cells byte-identical") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val root = s"/tmp/graft-idxmaint-pqfold-${System.nanoTime()}"
    PartitionedStore.copyTree(
      new java.io.File(Q.streamPqIndex(spark, sfDir)),
      new java.io.File(root))
    def codeSet(df: DataFrame) =
      df.select(col("vec_id"), col("codes"), col("cent_id").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2)))
        .toSet
    val want = codeSet(spark.read.parquet(s"$root/codes")
      .unionByName(spark.read.parquet(s"$root/codes_ingest").drop("bid")))
    // the planner OBSERVES the codes tier: pending generations trigger
    // the fold; the retrain dial is structurally off (re-clustering
    // would invalidate every stored code)
    val pre = Q.planCodesMaintenance(spark, root)
    info(s"pre=$pre -> actions=${pre.actions.mkString(",")}")
    assert(pre.pendingGens >= 2 && pre.fold,
      s"scenario lost its pending code generations: $pre")
    assert(!pre.retrain && pre.imbalance == 0.0,
      s"codes tier must never trip the retrain dial: $pre")
    val before = fileState(s"$root/codes")
    val touched = Q.foldIngest(spark, root,
        cellsSub = "codes", ingestSub = "codes_ingest")
      .map(_.toString).toSet
    assert(touched.nonEmpty, "fold touched no code cells")
    assert(!new java.io.File(s"$root/codes_ingest").exists(),
      "codes_ingest dirs survived a completed fold")
    // untouched-cell byte identity (fold only — compaction separate)
    val unBefore = before.filter { case (p, _) =>
      !touched.exists(c => p.startsWith(s"cent_id=$c/")) }
    val unAfter = fileState(s"$root/codes").filter { case (p, _) =>
      !touched.exists(c => p.startsWith(s"cent_id=$c/")) }
    assert(unBefore == unAfter, "codes fold rewrote a cell with no landed codes")
    // content: bit-level code equality with the pre-fold union
    assert(codeSet(spark.read.parquet(s"$root/codes")) == want,
      "codes fold lost, invented, or duplicated code rows")
    // planner convergence: fold satisfied; any residual file-bound wear
    // is compact's job, after which all signals read healthy
    val mid = Q.planCodesMaintenance(spark, root)
    assert(!mid.fold, s"fold signal survived the fold: $mid")
    Q.runCodesMaintenance(spark, root, mid)
    val post = Q.planCodesMaintenance(spark, root)
    assert(post.actions.isEmpty, s"codes planner did not converge: $post")
    // gate level: the folded serve is row-identical to the union serve
    val a = SparkEntry.queries("q_stream_index_pq_fold")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val b = SparkEntry.queries("q_stream_index_pq")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(a == b,
      s"folded PQ serve diverges from union serve: only-fold=${(a -- b).take(3)} only-union=${(b -- a).take(3)}")
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("planner on empty/missing layouts: all signals read healthy instead of throwing") {
    val ghost = s"/tmp/graft-idxmaint-ghost-${System.nanoTime()}"
    val plan = Q.planMaintenance(spark, ghost)
    assert(plan.actions.isEmpty && plan.imbalance == 0.0,
      s"missing layout must plan 'nothing': $plan")
    // fully-deleted cells layout: dirs exist, zero parquet files
    new java.io.File(s"$ghost/cells/cent_id=0").mkdirs()
    val plan2 = Q.planMaintenance(spark, ghost)
    assert(plan2.actions.isEmpty && plan2.imbalance == 0.0,
      s"emptied layout must plan 'nothing': $plan2")
    PartitionedStore.rmTreeForSpec(new java.io.File(ghost))
  }

  test("streaming serve × concurrent maintenance: a committed mid-stream fold crash is invisible to served batches") {
    val (out, trace) = Q.streamServeMaintIndex(spark, sfDir)
    info(s"trace=$trace")
    assert(trace.gensAtStart >= 2,
      "scenario lost its pending ingest generations — serve ran quiescent")
    assert(trace.crashTouched > 0, "the mid-stream fold touched no cells")
    assert(trace.stagingAfterCrash,
      "injected crash left no committed staging before the serving trigger")
    assert(!trace.stagingAfterServe,
      "the serving trigger's read did not complete the committed staging")
    assert(spark.read.parquet(out).select("bid").distinct().count() >= 2,
      "expected >= 2 served micro-batches")
    // served union == the quiescent folded serve, row for row
    val a = SparkEntry.queries("q_stream_index_serve_maint")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val b = SparkEntry.queries("q_stream_index_fold")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(a == b,
      s"mid-maintenance streaming serve diverges from the quiescent serve: only-maint=${(a -- b).take(3)} only-quiescent=${(b -- a).take(3)}")
  }

  test("multi-round retrain: per-round unmoved-cell byte identity; trace matches the gate's execution") {
    import spark.implicits._
    val root = s"/tmp/graft-idxmaint-retrain2-${System.nanoTime()}"
    PartitionedStore.copyTree(
      new java.io.File(Q.upsertedIvfIndex(spark, sfDir)),
      new java.io.File(root))
    // drive the rounds by hand so each round's byte stability is
    // observable; record the same trace the memoized gate builds
    val trace = Seq.newBuilder[(Int, Long, Long)]
    var lastAsg: org.apache.spark.sql.DataFrame = null
    var go = true
    var r = 0
    while (go && r < Q.RETRAIN_MAX_ROUNDS) {
      val before = fileState(s"$root/cells")
      val (asg0, asg1, changed) = Q.warmStartRetrain(spark, sfDir, root)
      val changedSet = changed.map(_.toString).toSet
      val unBefore = before.filter { case (p, _) =>
        !changedSet.exists(c => p.startsWith(s"cent_id=$c/")) }
      val unAfter = fileState(s"$root/cells").filter { case (p, _) =>
        !changedSet.exists(c => p.startsWith(s"cent_id=$c/")) }
      assert(unBefore == unAfter,
        s"round ${r + 1} rewrote a cell whose membership did not change")
      val moved = asg0.as("a").join(asg1.as("b"), "vec_id")
        .filter(col("a.cent_id") =!= col("b.cent_id")).count()
      trace += ((r + 1, moved, changed.size.toLong))
      lastAsg = asg1
      go = changed.nonEmpty
      r += 1
    }
    assert(r > 1, "fixture reached the fixed point in one round — multi-round path unproven")
    // the final layout IS the last round's assignment
    val stored = spark.read.parquet(s"$root/cells")
      .select("vec_id", "cent_id").as[(Long, Long)].collect().toSet
    val want = lastAsg.select("vec_id", "cent_id")
      .as[(Long, Long)].collect().toSet
    assert(stored == want, "final layout diverges from the last assignment")
    // the hand-driven trace equals the memoized gate's (same data, same
    // deterministic rounds, independent root)
    val (_, rounds) = Q.multiRoundRetrainedIndex(spark, sfDir)
    assert(rounds == trace.result(),
      s"gate trace ${rounds} diverges from hand-driven rounds ${trace.result()}")
    assert(rounds.head._2 > 0, "round 1 moved nothing — retrain2 gate proves nothing")
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("filtered prune is batched per label: one disjunct per distinct label, O(labels) plan size") {
    // r10 judge item #6, pinned on the predicate itself (explain()
    // truncates IN lists, so plan text can't carry this): 3 labels
    // over 7 pairs must yield exactly 3 disjuncts (2 ORs), each a
    // label-equality AND its own cent_id IN list
    val pairs: Seq[(Any, Any)] = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 13L),
      (3L, 14L), (3L, 15L))
    val prune = Q.labelBatchedPrune(pairs)
    // Column.toString renders the full predicate function-style with
    // no explain-style truncation — e.g. or(or(and(=(label, 1),
    // in(cent_id, 10, 11, 12)), …)): 3 labels -> exactly 2 or() nodes
    // and one in(cent_id, …) list per label
    val rendered = prune.toString
    assert(rendered.sliding(3).count(_ == "or(") == 2,
      s"expected one disjunct per label (2 ors for 3 labels), got: $rendered")
    assert(rendered.sliding(11).count(_ == "in(cent_id,") == 3,
      s"expected one IN list per label, got: $rendered")
    // and the predicate covers exactly the input pair set
    import spark.implicits._
    val all = for (l <- 1L to 3L; c <- 10L to 15L) yield (l, c)
    val kept = all.toDF("label", "cent_id").filter(prune)
      .as[(Long, Long)].collect().toSet
    assert(kept == pairs.map { case (l, c) => (l, c) }.toSet.asInstanceOf[Set[(Long, Long)]],
      s"batched prune covers a different pair set: $kept")
  }

  test("filtered-layout planner: two-level wear triggers fold+compact; untouched leaves byte-identical; fold crash-retry converges") {
    val root = s"/tmp/graft-idxmaint-filtplan-${System.nanoTime()}"
    Q.wearFilteredLayout(spark, sfDir, root)
    // decisions: pending generations -> fold; disjoint split leaves ->
    // compact; imbalance is observability only (no retrain action on
    // the filtered tier — centroids are shared across labels)
    val pre = Q.planFilteredMaintenance(spark, root)
    info(s"pre=$pre -> actions=${pre.actions.mkString(",")}")
    assert(pre.pendingGens == 2 && pre.fold,
      s"scenario lost its pending generations: $pre")
    assert(pre.overBound.nonEmpty && pre.compact,
      s"scenario lost its multi-file leaves: $pre")
    assert(pre.actions == Seq("fold", "compact"), s"wrong decisions: $pre")
    // pre-fold content claim: cells ∪ ingest (keyed) = the full corpus
    val want = spark.read.parquet(s"$root/cells")
      .unionByName(spark.read.parquet(s"$root/ingest").drop("bid"))
      .select("vec_id").distinct().count()
    // fold with an injected crash after ONE swap: committed staging,
    // ingest still present — the retry completes and converges
    val touched1 = Q.foldFilteredIngest(spark, root, crashAfterSwaps = 1)
    assert(touched1.nonEmpty, "crashed fold reported no touched leaves")
    assert(new java.io.File(s"$root/ingest").exists(),
      "crashed fold must leave the landed generations in place")
    val before = fileState(s"$root/cells")
    val touched = Q.foldFilteredIngest(spark, root)
    assert(touched.nonEmpty, "fold retry touched no leaves")
    assert(!new java.io.File(s"$root/ingest").exists(),
      "ingest dirs survived a completed fold")
    // untouched-leaf byte identity across the RETRY (leaves outside the
    // touched pair set keep their files byte-identical)
    val touchedRels = touched.map { case (l, c) => s"label=$l/cent_id=$c/" }
    // the crashed fold's committed staging is transient swap state, not
    // leaf content — exclude it from the identity comparison
    val unBefore = before.filter { case (p, _) =>
      !touchedRels.exists(p.startsWith) &&
        !p.startsWith("_graft_staging_delete/") }
    val unAfter = fileState(s"$root/cells").filter { case (p, _) =>
      !touchedRels.exists(p.startsWith) &&
        !p.startsWith("_graft_staging_delete/") }
    assert(unBefore == unAfter,
      "filtered fold rewrote a leaf with no landed rows")
    // fold converged to exactly the keyed union — no dupes, no losses
    val cells = spark.read.parquet(s"$root/cells")
    assert(cells.count() == cells.select("vec_id").distinct().count(),
      "fold duplicated vec_ids across leaves")
    assert(cells.select("vec_id").distinct().count() == want,
      "fold lost or invented rows")
    // compact repairs the file bound; planner converges to nothing
    val mid = Q.planFilteredMaintenance(spark, root)
    assert(!mid.fold, s"fold signal survived the fold: $mid")
    Q.runFilteredMaintenance(spark, root, mid)
    val post = Q.planFilteredMaintenance(spark, root)
    assert(post.actions.isEmpty, s"filtered planner did not converge: $post")
    assert(post.maxImbalance > 0.0 && post.maxImbalance < Q.PLANNER_IMBALANCE_MAX,
      s"per-label imbalance should read healthy on real data: $post")
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("streaming graph upsert: redelivery idempotent; planner folds landed generations via staged swaps; serve invariant") {
    import org.apache.spark.sql.functions._
    val Qs = graft.queries.SimilarityQueries
    val src = Qs.streamUpsertedHnswIndex(spark, sfDir)
    val root = s"/tmp/graft-idxmaint-hnswstream-${System.nanoTime()}"
    PartitionedStore.copyTree(new java.io.File(src), new java.io.File(root))
    def serve() = Qs.hnswLayoutServe(spark, sfDir, root, beamWidth = 8,
        qPred = col("vec_id") % 25 === 19)
      .collect().map(_.toSeq).toSet
    // pre-fold: landed arrivals are already searchable — the serve over
    // base ∪ landed equals the one-shot batch upsert's gate rows
    val preFold = serve()
    val batchGate = SparkEntry.queries("q_sim_index_hnsw_upsert")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(preFold == batchGate,
      "pre-fold streamed serve diverges from the batch upsert serve")
    // redelivery: re-land batch 0 from its own landed payloads — the
    // bid= overwrite must be content-idempotent
    def rowSet(path: String) = spark.read.parquet(path)
      .collect().map(_.toSeq).toSet
    val adjBefore = rowSet(s"$root/ingest_adj")
    val nodesBefore = rowSet(s"$root/ingest_nodes")
    val batch0 = spark.read.parquet(s"$root/ingest_nodes")
      .filter(col("bid") === 0).select("vec_id")
      .join(graft.Tables(spark, sfDir).embeddings, "vec_id")
      .select(col("vec_id"), col("label"), col("embedding"))
    Qs.landGraphIngestBatch(batch0, 0, root)
    assert(rowSet(s"$root/ingest_adj") == adjBefore,
      "redelivered batch changed the landed edge content")
    assert(rowSet(s"$root/ingest_nodes") == nodesBefore,
      "redelivered batch changed the landed payload content")
    // planner observes the pending generations
    val pre = Qs.planGraphMaintenance(spark, root)
    info(s"pre=$pre -> actions=${pre.actions.mkString(",")}")
    assert(pre.pendingGens == 2 && pre.fold,
      s"planner missed the landed generations: $pre")
    // fold with an injected crash after ONE adj swap: committed
    // staging + landed dirs still present; the retry converges
    Qs.foldGraphIngest(spark, root, crashAfterSwaps = 1)
    assert(new java.io.File(s"$root/ingest_adj").exists(),
      "crashed fold must leave the landed generations in place")
    val before = fileState(s"$root/adj")
    val touched = Qs.foldGraphIngest(spark, root).map(_.toString).toSet
    assert(touched.nonEmpty, "fold retry touched no buckets")
    assert(!new java.io.File(s"$root/ingest_adj").exists()
      && !new java.io.File(s"$root/ingest_nodes").exists(),
      "landed dirs survived a completed fold")
    // untouched adj buckets byte-identical across the retry
    val unBefore = before.filter { case (p, _) =>
      !touched.exists(b => p.startsWith(s"sb=$b/")) &&
        !p.startsWith("_graft_staging_delete/") }
    val unAfter = fileState(s"$root/adj").filter { case (p, _) =>
      !touched.exists(b => p.startsWith(s"sb=$b/")) &&
        !p.startsWith("_graft_staging_delete/") }
    assert(unBefore == unAfter, "graph fold rewrote an untouched bucket")
    // the fold is invisible to the serve
    assert(serve() == preFold, "fold changed served rows")
    // planner converges (any residual file wear is compact's job)
    val mid = Qs.planGraphMaintenance(spark, root)
    assert(!mid.fold, s"fold signal survived the fold: $mid")
    Qs.runGraphMaintenance(spark, root, mid)
    val post = Qs.planGraphMaintenance(spark, root)
    assert(!post.fold && !post.compact,
      s"graph planner did not converge: $post")
    assert(serve() == preFold, "maintenance changed served rows")
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("HNSW delete + repair: payload and both edge directions gone; dead-hub cells re-elected and re-meshed") {
    import spark.implicits._
    val clean = graft.queries.SimilarityQueries.persistedHnswIndex(spark, sfDir)
    val root = graft.queries.SimilarityQueries.deletedHnswIndex(spark, sfDir)
    val allIds = spark.read.parquet(s"$clean/nodes")
      .select("vec_id").as[Long].collect().toSet
    val delIds = allIds.filter(_ % 10 == 3)
    assert(delIds.nonEmpty)
    val oldHubs = spark.read.parquet(s"$clean/hubs")
      .select("cent_id", "hub_id").as[(Long, Long)].collect().toMap
    assert(oldHubs.values.exists(delIds), "fixture: no hub died — repair path unproven")
    // payload: exactly the survivors remain
    assert(spark.read.parquet(s"$root/nodes").select("vec_id")
      .as[Long].collect().toSet == allIds -- delIds)
    // adjacency: no deleted endpoint on either side, symmetry intact
    val adj = spark.read.parquet(s"$root/adj").select("src", "dst")
      .as[(Long, Long)].collect().toSet
    assert(!adj.exists(e => delIds(e._1) || delIds(e._2)),
      "a deleted node survives in the adjacency")
    assert(adj == adj.map(e => (e._2, e._1)),
      "delete/repair broke adjacency symmetry")
    // hubs: live-hub cells unchanged; dead-hub cells re-elected among
    // survivors; every new hub meshed to every other hub both ways
    val newHubs = spark.read.parquet(s"$root/hubs")
      .select("cent_id", "hub_id").as[(Long, Long)].collect().toMap
    oldHubs.foreach { case (cell, h) =>
      if (!delIds(h))
        assert(newHubs.get(cell).contains(h), s"live hub of cell $cell changed")
    }
    val deadCells = oldHubs.filter { case (_, h) => delIds(h) }.keys.toSeq
    val hubSet = newHubs.values.toSet
    deadCells.foreach { cell =>
      newHubs.get(cell).foreach { h2 =>
        assert(!delIds(h2), s"re-elected hub of cell $cell is deleted")
        hubSet.filter(_ != h2).foreach { other =>
          assert(adj((h2, other)) && adj((other, h2)),
            s"new hub $h2 not meshed to $other")
        }
      }
    }
    // the served results contain no deleted vector
    val rows = SparkEntry.queries("q_sim_index_hnsw_delete")(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(r => r.getLong(0) % 10 == 3 || r.getLong(1) % 10 == 3),
      "a deleted vector is retrievable through the repaired graph")
  }

  test("HNSW upsert: frozen-base linking is append-only; arrivals linked both ways into base only") {
    import spark.implicits._
    val root = s"/tmp/graft-idxmaint-hnswup-${System.nanoTime()}"
    graft.queries.SimilarityQueries.buildBaseHnswIndex(spark, sfDir, root)
    val before = fileState(root)
    assert(before.nonEmpty)
    graft.queries.SimilarityQueries.upsertHnswIncoming(spark, sfDir, root)
    val after = fileState(root)
    // append-only: every pre-existing file byte-identical
    before.foreach { case (p, st) =>
      assert(after.get(p).contains(st), s"upsert rewrote pre-existing file $p")
    }
    val newIds = Q.vectorsForSpec(spark, sfDir)
      .filter(col("vec_id") % 10 === 9)
      .select("vec_id").as[Long].collect().toSet
    assert(newIds.nonEmpty)
    // payload: arrivals landed exactly once
    val stored = spark.read.parquet(s"$root/nodes").select("vec_id")
      .as[Long].collect().toSeq
    assert(stored.size == stored.distinct.size)
    assert(newIds.subsetOf(stored.toSet), "an arrival's payload is missing")
    // edges: each arrival has 1..8 out-edges, all into BASE, each with
    // its reverse present (navigability)
    val adj = spark.read.parquet(s"$root/adj").select("src", "dst")
      .as[(Long, Long)].collect().toSet
    newIds.foreach { id =>
      val out = adj.filter(_._1 == id)
      assert(out.nonEmpty && out.size <= 8, s"arrival $id has ${out.size} out-edges")
      out.foreach { case (s, d) =>
        assert(!newIds(d), s"arrival $s linked to another arrival $d — base-only linking violated")
        assert(adj((d, s)), s"reverse edge $d -> $s missing")
      }
    }
    // arrivals are retrievable through the gate's grown-graph serve
    val rows = SparkEntry.queries("q_sim_index_hnsw_upsert")(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
    assert(rows.exists(_.getLong(0) % 10 == 9), "no arrival ever queried the graph")
    assert(rows.exists(_.getLong(1) % 10 == 9), "no arrival was retrieved as a neighbor")
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("graph repair: planner reads real wear; repair restores the degree bound, entries, and file bound") {
    import spark.implicits._
    val (root, pre, post) = Q.repairedHnswIndex(spark, sfDir)
    info(s"pre=$pre -> actions=${pre.actions.mkString(",")}; post=$post")
    // the wear is real: the delete wave degraded neighborhoods
    assert(pre.degraded > 0,
      "delete wave degraded no neighborhoods — repair gate proves nothing")
    assert(pre.repair, "planner did not trigger the repair")
    // post-repair: every signal reads healthy (degree bound restored by
    // the fresh top-8 overlays, entries live by re-election, file bound
    // by the closing compaction)
    assert(post.degraded == 0, s"repair left degraded neighborhoods: $post")
    assert(post.deadHubs == 0, s"repair left dead hub entries: $post")
    assert(post.actions.isEmpty, s"graph planner did not converge: $post")
    // no deleted endpoint anywhere; hubs all live
    val adj = spark.read.parquet(s"$root/adj").select("src", "dst")
      .as[(Long, Long)].collect().toSet
    assert(!adj.exists(e => e._1 % 10 == 3 || e._2 % 10 == 3),
      "a deleted node survives in the repaired adjacency")
    val hubs = spark.read.parquet(s"$root/hubs").select("hub_id")
      .as[Long].collect()
    assert(!hubs.exists(_ % 10 == 3), "a deleted node is a hub entry")
    // the r11 gap: arrival-arrival links now exist (degraded arrivals
    // re-kNN over the live corpus, which includes other arrivals)
    assert(adj.exists(e => e._1 % 10 == 9 && e._2 % 10 == 9),
      "repair created no arrival-arrival links")
    // repaired-graph serve: no deleted vector served; arrivals retrievable
    val rows = SparkEntry.queries("q_sim_index_hnsw_repair")(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(r => r.getLong(0) % 10 == 3 || r.getLong(1) % 10 == 3),
      "a deleted vector is retrievable through the repaired graph")
    assert(rows.exists(_.getLong(1) % 10 == 9),
      "no arrival retrieved through the repaired graph")
  }

  test("healthy graph: the planner plans nothing (repair is not a standing tax)") {
    import graft.streaming.PartitionedStore
    val root = s"/tmp/graft-idxmaint-ghealthy-${System.nanoTime()}"
    Q.buildBaseHnswIndex(spark, sfDir, root)
    val plan = Q.planGraphMaintenance(spark, root)
    info(s"healthy plan=$plan")
    assert(plan.degraded == 0,
      s"pristine graph reports degraded neighborhoods: $plan")
    assert(plan.deadHubs == 0, s"pristine graph reports dead hubs: $plan")
    assert(!plan.repair, s"planner taxes a healthy graph: $plan")
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("streaming graph serve: micro-batched beam results equal the batch beam serve") {
    val out = Q.streamHnswServedIndex(spark, sfDir)
    assert(spark.read.parquet(out).select("bid").distinct().count() >= 2,
      "expected >= 2 served micro-batches")
    val a = spark.read.parquet(out).drop("bid")
      .collect().map(_.toSeq).toSet
    val b = graft.queries.GraftQuery.withShufflePartitions(spark, 8) {
      Q.hnswLayoutServe(spark, sfDir,
        Q.persistedHnswIndex(spark, sfDir), beamWidth = 32,
        qPred = col("vec_id") % 50 === 45)
    }.collect().map(_.toSeq).toSet
    assert(a == b,
      s"streamed beam serve diverges from batch serve: only-stream=${(a -- b).take(3)} only-batch=${(b -- a).take(3)}")
  }

  test("persisted HNSW: the layout roundtrip is invisible — serve rows equal the in-memory gate's") {
    val a = SparkEntry.queries("q_sim_index_hnsw")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val b = SparkEntry.queries("q_sim_hnsw")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(a == b,
      s"persisted beam serve diverges from in-memory: only-persisted=${(a -- b).take(3)} only-memory=${(b -- a).take(3)}")
    // the durable layout is complete: every adjacency edge and node
    // payload round-trips (counts vs the layout's own invariants)
    val root = graft.queries.SimilarityQueries.persistedHnswIndex(spark, sfDir)
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(spark.read.parquet(s"$root/nodes").count() == n)
    assert(spark.read.parquet(s"$root/hubs").count()
      == spark.read.parquet(s"$root/centroids").count())
  }

  test("streaming hier serve: micro-batched layer-descent results equal the batch hier serve") {
    val out = Q.streamHierServedIndex(spark, sfDir)
    assert(spark.read.parquet(out).select("bid").distinct().count() >= 2,
      "expected >= 2 served micro-batches")
    val a = spark.read.parquet(out).drop("bid")
      .collect().map(_.toSeq).toSet
    val (rootF, _) = Q.hierHnswIndexes(spark, sfDir)
    val b = graft.queries.GraftQuery.withShufflePartitions(spark, 8) {
      Q.hierHnswServe(spark, rootF,
        Q.vectorsForSpec(spark, sfDir).filter(col("vec_id") % 50 === 45),
        beamWidth = 32)
    }.collect().map(_.toSeq).toSet
    assert(a == b,
      s"streamed hier serve diverges from batch: only-stream=${(a -- b).take(3)} only-batch=${(b -- a).take(3)}")
  }

  test("hier layer maintenance: non-entry hub death -> refresh swaps only touched eh partitions, lands the rebuilt fixed point") {
    val root = s"/tmp/graft-idxmaint-hierrefresh-${System.nanoTime()}"
    val v = Q.vectorsForSpec(spark, sfDir)
    Q.buildHierHnswIndex(spark, v, root)
    // a pristine hier layout plans nothing — neither tier
    assert(!Q.planGraphMaintenance(spark, root).hier,
      "pristine hier layout reports layer staleness")
    assert(Q.planHierMaintenance(spark, root).actions.isEmpty,
      "pristine hier layout plans layer work")
    val buckets = spark.read.parquet(s"$root/centroids").count()
    val es = math.ceil(math.sqrt(buckets.toDouble)).toLong
    // victim: the hub of the LAST cell — cent_id >= S keeps the entry
    // set intact, so the planner must choose refresh, never reelect
    val victim = spark.read.parquet(s"$root/hubs")
      .filter(col("cent_id") >= es)
      .orderBy(col("cent_id").desc).limit(1).collect().head
    val victimCell = victim.getAs[Long]("cent_id")
    val victimHub = victim.getAs[Long]("hub_id")
    import spark.implicits._
    val del = Seq(victimHub).toDF("vec_id")
    Q.deleteHnswNodes(spark, root, del, buckets)
    Q.repairDeadHubs(spark, root, del,
      v.filter(col("vec_id") =!= victimHub), buckets)
    // the graph planner surfaces the combined staleness; the hier
    // planner splits it into the refresh decision with the exact cell
    assert(Q.planGraphMaintenance(spark, root).hier,
      "graph planner missed the layer staleness")
    val plan = Q.planHierMaintenance(spark, root)
    info(s"post-wear hier plan=$plan")
    assert(plan.refresh && !plan.reelect,
      s"non-entry hub death must trigger refresh, not reelect: $plan")
    assert(plan.staleCells == Seq(victimCell),
      s"stale set should be exactly the victim's cell: $plan")
    val before = fileState(s"$root/hubs2")
    val oldEhs = spark.read.parquet(s"$root/hubs2")
      .filter(col("cent_id") === victimCell)
      .select("eh").collect().map(_.get(0)).toSet
    Q.refreshHierLayer(spark, root, plan.staleCells)
    val newEhs = spark.read.parquet(s"$root/hubs2")
      .filter(col("cent_id") === victimCell)
      .select("eh").collect().map(_.get(0)).toSet
    val touched = (oldEhs ++ newEhs).map(e => s"eh=$e/")
    val after = fileState(s"$root/hubs2")
    before.foreach { case (rel, st) =>
      if (!touched.exists(rel.startsWith))
        assert(after.get(rel).contains(st),
          s"untouched partition file changed under refresh: $rel")
    }
    // fixed point: the incremental refresh equals a wholesale rebuild
    val rebuilt = s"/tmp/graft-idxmaint-hierrebuild-${System.nanoTime()}"
    PartitionedStore.copyTree(new java.io.File(root),
      new java.io.File(rebuilt))
    Q.reelectHierEntries(spark, rebuilt)
    def layerRows(r: String): Set[Seq[Any]] = spark.read
      .parquet(s"$r/hubs2")
      .select(col("eh").cast("long"), col("cent_id"), col("hub_id"))
      .collect().map(_.toSeq).toSet
    assert(layerRows(root) == layerRows(rebuilt),
      "refresh diverged from the wholesale layer rebuild")
    // converged: neither planner sees residual layer work
    assert(Q.planHierMaintenance(spark, root).actions.isEmpty,
      "hier planner did not converge after refresh")
    assert(!Q.planGraphMaintenance(spark, root).hier,
      "graph planner still reports layer staleness after refresh")
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
    PartitionedStore.rmTreeForSpec(new java.io.File(rebuilt))
  }

  test("hier layer maintenance: entry-hub death -> reelect rebuilds both layer tables onto live identities") {
    val root = s"/tmp/graft-idxmaint-hierreelect-${System.nanoTime()}"
    val v = Q.vectorsForSpec(spark, sfDir)
    Q.buildHierHnswIndex(spark, v, root)
    val buckets = spark.read.parquet(s"$root/centroids").count()
    // victim: the first ENTRY's own hub — its death re-elects a cell
    // < S, so the stored entry embeddings are invalid and the planner
    // must choose the wholesale reelect
    val entry = spark.read.parquet(s"$root/entryhubs")
      .orderBy("eh").limit(1).collect().head
    val deadEntryHub = entry.getAs[Long]("ehub")
    import spark.implicits._
    val del = Seq(deadEntryHub).toDF("vec_id")
    Q.deleteHnswNodes(spark, root, del, buckets)
    Q.repairDeadHubs(spark, root, del,
      v.filter(col("vec_id") =!= deadEntryHub), buckets)
    val plan = Q.planHierMaintenance(spark, root)
    info(s"post-wear hier plan=$plan")
    assert(plan.reelect,
      s"entry-hub death must trigger reelect: $plan")
    Q.reelectHierEntries(spark, root)
    // converged, and no stored identity references the dead hub
    assert(Q.planHierMaintenance(spark, root).actions.isEmpty,
      "hier planner did not converge after reelect")
    assert(spark.read.parquet(s"$root/entryhubs")
      .filter(col("ehub") === deadEntryHub).count() == 0,
      "entry table still references the dead hub")
    assert(spark.read.parquet(s"$root/hubs2")
      .filter(col("hub_id") === deadEntryHub).count() == 0,
      "layer-0 table still references the dead hub")
    // the refreshed layer routes end to end: a live query set serves
    val served = graft.queries.GraftQuery.withShufflePartitions(spark, 8) {
      Q.hierHnswServe(spark, root,
        v.filter(col("vec_id") % 50 === 0), beamWidth = 8)
    }
    assert(served.count() > 0, "hier serve over the reelected layer is empty")
    PartitionedStore.rmTreeForSpec(new java.io.File(root))
  }

  test("graph-tier label contract (r13 ADVICE): every node-payload generation carries a non-null label") {
    import org.apache.spark.sql.functions._
    // landed (un-folded) generations
    val upRoot = Q.streamUpsertedHnswIndex(spark, sfDir)
    val landed = spark.read.parquet(s"$upRoot/ingest_nodes")
    assert(landed.columns.contains("label"),
      "landed arrival payloads lost the label column")
    assert(landed.filter(col("label").isNull).count() == 0,
      "a landed arrival has a null label — filtered serve would drop it")
    // the combined base ∪ landed view the filtered serve actually reads
    assert(Q.graphNodes(spark, upRoot).filter(col("label").isNull)
      .count() == 0, "base ∪ landed payload view has null labels")
    // and the filtered serve over the upserted layout runs end to end
    val served = graft.queries.GraftQuery.withShufflePartitions(spark, 8) {
      Q.hnswFilteredServe(spark, upRoot,
        Q.vectorsForSpec(spark, sfDir).filter(col("vec_id") % 25 === 19),
        beamWidth = 8)
    }
    assert(served.count() > 0,
      "filtered serve over the upserted layout is empty")
  }

  test("streaming fold path heals the hier layers (r13 judge item #5): runner-driven, converged, arrivals served") {
    import org.apache.spark.sql.functions._
    val root = Q.streamFoldedHierIndex(spark, sfDir)
    // the landed generations are gone (folded) and the layer tables
    // read clean against the repaired hub table
    assert(!new java.io.File(s"$root/ingest_adj").exists()
      && !new java.io.File(s"$root/ingest_nodes").exists(),
      "fold left landed generations behind")
    val hp = Q.planHierMaintenance(spark, root)
    assert(hp.entryChanged == 0 && hp.staleCells.isEmpty,
      s"runner left the hier layers stale: $hp")
    // the serve proves the lifecycle end to end: no deleted vector
    // anywhere, streamed arrivals retrievable through the layer descent
    val rows = SparkEntry.queries("q_stream_index_hnsw_hier_fold")(
      spark, sfDir).select("query_id", "neighbor_id").collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(r => r.getLong(0) % 10 == 3 || r.getLong(1) % 10 == 3),
      "a deleted vector survives the folded+repaired hier serve")
    assert(rows.exists(_.getLong(1) % 10 == 9),
      "no streamed arrival retrieved through the refreshed hier layers")
  }
}
