package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Timeout-proofing (r13 judge item #1 — that round's driver run was
  * killed mid-loop and the artifact degraded to `{}`):
  *   1. `oracle_sql.json` is written FIRST, before any query runs — the
  *      compare needs it to score whatever result dirs exist, so a kill
  *      at ANY later point yields a PARTIAL correctness artifact, never
  *      an empty one.
  *   2. Gates run CHEAPEST-FIRST by their historical per-gate cost
  *      (BASELINE.md's closing tables via [[Bench.baselineMedians]];
  *      gates with no row yet — i.e. the round's NEW gates — run first,
  *      they are exactly what a fresh round most needs verified). A kill
  *      at minute T therefore loses only the most expensive tail.
  *   3. Each gate's result dir is complete the moment its write commits
  *      (no end-of-run finalization step), and the loop bails out as
  *      soon as the SparkContext is stopped (a TERM from the driver's
  *      timeout) instead of burning the shutdown window on gates that
  *      can only fail.
  *   4. Error messages are truncated to one short line — a multi-KB
  *      "stopped SparkContext" stack in stderr is what flooded the
  *      r13 bench artifact's 2000-char tail-capture.
  */
object Verify {
  /** One-line, bounded rendering of a failure for the driver's
    * tail-capture: first line of the message, hard-capped. */
  private[graft] def brief(e: Throwable): String = {
    val m = Option(e.getMessage).getOrElse(e.getClass.getName)
    m.linesIterator.take(1).mkString.take(160)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    new java.io.File(outDir).mkdirs()
    // ---- oracle_sql.json FIRST (see header #1).
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = Engine.ready(Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-verify"),
      cpus.toInt).getOrCreate())

    // dev loop: SPARK_GRAFT_VERIFY_ONLY=q_a,q_b restricts the dump set
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY").map(_.split(",").toSet)
    // cheapest-first (see header #2): historical seconds from the same
    // closing tables the bench's ratio gate reads; absent row → 0.0 →
    // new gates lead the order.
    val refs = Bench.baselineMedians(
      sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BASELINE.md"))
    val names = SparkEntry.queries.keys.toSeq
      .filter(n => only.forall(_.contains(n)))
      .sortBy(n => (refs.getOrElse(n, 0.0), n))

    val t0 = System.nanoTime()
    var done = 0
    names.foreach { name =>
      if (!spark.sparkContext.isStopped) {
        val g0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir).coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
          done += 1
          System.err.println(f"[verify] $done/${names.size} $name " +
            f"${(System.nanoTime() - g0) / 1e9}%.1fs " +
            f"(total ${(System.nanoTime() - t0) / 1e9}%.0fs)")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${brief(e)}")
        }
        finally graft.queries.Scratch.release(spark)
      }
    }
    System.err.println(f"[verify] completed $done/${names.size} in " +
      f"${(System.nanoTime() - t0) / 1e9}%.0fs")
    spark.stop()
  }
}
