package graft

import graft.operators.{KllLevels, QuantileSketchAgg}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Laws of the deterministic KLL sketch, driven directly (no Spark):
  * the rank-error bound must hold under ANY merge tree — sequential
  * insertion, chunked merges, and shuffled merge orders — because
  * Spark's partial-aggregate merge order is not deterministic and the
  * gate's correctness contract is the bound, not the estimate. */
class QuantileSketchSpec extends AnyFunSuite {

  private val k = 64
  private val agg = new QuantileSketchAgg(k)

  private def insertAll(xs: Seq[Double]): KllLevels =
    xs.foldLeft(agg.zero)(agg.reduce)

  /** Tie-correct audit: the target rank must fall within eps of the
    * estimate's rank INTERVAL [count(<v), count(<=v)] — with duplicated
    * values a point-rank check would reject a perfectly good estimate
    * (for an all-constant stream every estimate has hi-rank n). */
  private def checkBound(xs: Array[Double], sketch: KllLevels,
      label: String): Unit = {
    val out = agg.finish(sketch)
    val n = xs.length
    assert(out(0) == n.toDouble, s"$label: weight not conserved: ${out(0)} != $n")
    val eps = 0.12 * n + 1
    def ok(v: Double, q: Double): Boolean = {
      val lo = xs.count(_ < v)
      val hi = xs.count(_ <= v)
      val target = q * n
      lo - eps <= target && target <= hi + eps
    }
    assert(ok(out(1), 0.5), s"$label: p50 estimate ${out(1)} out of bound")
    assert(ok(out(2), 0.95), s"$label: p95 estimate ${out(2)} out of bound")
  }

  test("rank-error bound holds for sequential insertion") {
    for (seed <- 1 to 3; n <- Seq(100, 1000, 5000)) {
      val r = new Random(seed * 1000 + n)
      val xs = Array.fill(n)(r.nextDouble() * 100)
      checkBound(xs, insertAll(xs.toSeq), s"seq seed=$seed n=$n")
    }
  }

  test("rank-error bound holds under chunked merges in shuffled orders") {
    val n = 5000
    val r7 = new Random(7)
    val xs = Array.fill(n)(r7.nextDouble() * 100)
    val chunks = xs.grouped(n / 16).map(c => insertAll(c.toSeq)).toSeq
    // three different merge trees over the same partials
    val ltr = chunks.reduce(agg.merge)
    val rtl = chunks.reverse.reduce(agg.merge)
    val shuffled = new Random(11).shuffle(chunks).reduce(agg.merge)
    checkBound(xs, ltr, "merge L->R")
    checkBound(xs, rtl, "merge R->L")
    checkBound(xs, shuffled, "merge shuffled")
  }

  test("weight conservation survives skewed and tiny inputs") {
    // constant stream (every compaction ties), single element, two
    // elements — degenerate shapes must keep exact weight and return
    // sane estimates
    val const = insertAll(Seq.fill(1000)(42.0))
    val cOut = agg.finish(const)
    assert(cOut(0) == 1000.0 && cOut(1) == 42.0 && cOut(2) == 42.0)
    val one = agg.finish(insertAll(Seq(3.14)))
    assert(one(0) == 1.0 && one(1) == 3.14)
    val empty = agg.finish(agg.zero)
    assert(empty(0) == 0.0 && empty(1).isNaN)
  }

  test("sketch size stays logarithmic: levels x k, not n") {
    val n = 20000
    val xs = Seq.fill(n)(new Random(23).nextDouble())
    val sk = insertAll(xs)
    val retained = sk.levels.map(_.length).sum
    // L ~ log2(n/k) + 1 levels of <= k items each, far below n
    assert(retained <= (math.log(n.toDouble / k) / math.log(2) + 2) * k,
      s"sketch holds $retained items for n=$n — not sublinear")
    assert(retained < n / 20, s"sketch not compact: $retained items")
  }
}
