package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's self-certification reference: the parser must find
  * the LAST closing table in BASELINE.md (the quiet-window per-query
  * medians that drive the >2x re-measure phase). A silent parse failure
  * would disable re-measurement entirely — flagged queries would ship
  * uncertified — so the shape is asserted here. */
class BenchBaselineSpec extends AnyFunSuite {

  test("baselineMedians parses the last closing table of BASELINE.md") {
    val refs = Bench.baselineMedians("BASELINE.md")
    assert(refs.size >= 150,
      s"expected the full closing-table inventory, got ${refs.size} rows")
    assert(refs.contains("q1_agg"), "flagship query missing from reference")
    refs.values.foreach(v => assert(v > 0 && v < 600, s"implausible median $v"))
    // the reference is the LATEST table: it must include gates that only
    // exist in the newest closing table, not just round-1 survivors
    assert(refs.contains("q_sim_hnsw") && refs.contains("q_stream_ivm"),
      "reference table predates round 7 — wrong section parsed")
  }

  test("baselineMedians is empty (not a crash) when the file is absent") {
    assert(Bench.baselineMedians("/nonexistent/BASELINE.md").isEmpty)
  }

  test("reference minimum is bounded to the trailing tables (ADVICE r10)") {
    // five sections; q_x's global minimum (0.1) lives in the OLDEST one
    // and must age out of the bounded window, while the in-window
    // minimum (0.3 from section 3) must win over later values
    val md = (1 to 5).map { i =>
      val v = Seq(0.1, 0.9, 0.3, 0.8, 0.7)(i - 1)
      s"## BENCH baseline v$i\n\n| query | sec |\n|---|---|\n| q_x | $v |\n"
    }.mkString("\n")
    val f = java.nio.file.Files.createTempFile("baseline-spec", ".md")
    java.nio.file.Files.writeString(f, md)
    try {
      val refs = Bench.baselineMedians(f.toString)
      assert(refs("q_x") == 0.3,
        s"expected min over last ${Bench.BASELINE_TABLES} tables, got ${refs("q_x")}")
    } finally java.nio.file.Files.delete(f)
  }
}
