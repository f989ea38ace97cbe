package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable levels buffer of the deterministic quantile sketch: items
  * at level i carry weight 2^i. */
final case class KllLevels(levels: Array[Array[Double]])

/** Deterministic KLL-style quantile sketch (Karnin-Lang-Liberty 2016,
  * with the randomness removed): fixed capacity `k` per level; a full
  * level sorts and keeps the ODD-indexed half, promoting it one level up
  * at doubled weight. Without coin flips the guarantee degrades from
  * probabilistic to WORST-CASE — each compaction of level i perturbs any
  * rank by at most 2^i, and level i compacts at most n/(k·2^i) times, so
  * the total rank error is bounded by n·L/(2k) for L ≈ log2(n/k) levels
  * REGARDLESS of insertion or merge order. That order-independence of
  * the BOUND (not the estimate) is what makes the sketch usable under
  * Spark's nondeterministic partial-aggregate merge tree: two runs may
  * produce different estimates, but both are within ε·n ranks of truth,
  * and the gate asserts exactly that (the q_approx_sketches bound
  * pattern). Weight is conserved exactly (compaction halves an even
  * count at doubled weight; an odd element stays behind), so cumulative
  * weights sum to n and quantile extraction needs no normalization
  * fudge.
  *
  * Why this over Spark's approx_percentile: this sketch is a first-class
  * AGGREGATOR whose partials merge associatively through the shuffle —
  * the shape a 1000-executor percentile job needs — and its error
  * contract is auditable in-row against the exact answer.
  *
  * Reference analog: none (the reference has no aggregate library at
  * all — SURVEY §2.4); this extends the sketch family (HLL, CMS)
  * with the quantile member.
  */
class QuantileSketchAgg(k: Int)
    extends Aggregator[Double, KllLevels, Array[Double]] {
  require(k >= 8 && k % 2 == 0, s"k must be even and >= 8, got $k")

  override def zero: KllLevels = KllLevels(Array(Array.emptyDoubleArray))

  /** Sort a full level, keep the odd-indexed half (deterministic
    * compactor), return (kept-for-promotion, leftover). An odd count
    * leaves its minimum behind so compaction always halves an even
    * count and weight is conserved exactly. */
  private def compact(xs: Array[Double]): (Array[Double], Array[Double]) = {
    val sorted = xs.sorted
    val (evenCnt, leftover) =
      if (sorted.length % 2 == 0) (sorted, Array.emptyDoubleArray)
      else (sorted.drop(1), Array(sorted(0)))
    val kept = new Array[Double](evenCnt.length / 2)
    var i = 1
    var j = 0
    while (i < evenCnt.length) { kept(j) = evenCnt(i); j += 1; i += 2 }
    (kept, leftover)
  }

  /** Restore the capacity invariant bottom-up: any level over k compacts
    * into the next. */
  private def normalize(levels: Array[Array[Double]]): KllLevels = {
    val out = scala.collection.mutable.ArrayBuffer(levels.toSeq: _*)
    var i = 0
    while (i < out.length) {
      if (out(i).length > k) {
        val (promoted, leftover) = compact(out(i))
        out(i) = leftover
        if (i + 1 >= out.length) out += Array.emptyDoubleArray
        out(i + 1) = out(i + 1) ++ promoted
      }
      i += 1
    }
    KllLevels(out.toArray)
  }

  override def reduce(b: KllLevels, x: Double): KllLevels = {
    val levels = b.levels.clone()
    levels(0) = levels(0) :+ x
    // compaction only when the insert level spills — amortized O(1)
    // appends between sorts
    if (levels(0).length > k) normalize(levels) else KllLevels(levels)
  }

  override def merge(a: KllLevels, b: KllLevels): KllLevels = {
    val n = math.max(a.levels.length, b.levels.length)
    val merged = Array.tabulate(n) { i =>
      val xs = if (i < a.levels.length) a.levels(i) else Array.emptyDoubleArray
      val ys = if (i < b.levels.length) b.levels(i) else Array.emptyDoubleArray
      xs ++ ys
    }
    normalize(merged)
  }

  /** (totalWeight, q50 estimate, q95 estimate): expand to (value,
    * 2^level) pairs, sort by value (ties keep the lower level first —
    * fully deterministic given the levels), walk cumulative weight to
    * the target rank. */
  override def finish(r: KllLevels): Array[Double] = {
    val pairs = r.levels.iterator.zipWithIndex.flatMap { case (xs, lvl) =>
      val w = 1L << lvl
      xs.iterator.map(x => (x, w))
    }.toArray.sortBy(_._1)
    val total = pairs.iterator.map(_._2).sum
    def at(q: Double): Double = {
      if (pairs.isEmpty) return Double.NaN
      val target = q * total
      var cum = 0L
      var i = 0
      while (i < pairs.length) {
        cum += pairs(i)._2
        if (cum >= target) return pairs(i)._1
        i += 1
      }
      pairs.last._1
    }
    Array(total.toDouble, at(0.5), at(0.95))
  }

  override def bufferEncoder: Encoder[KllLevels] = Encoders.product[KllLevels]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
