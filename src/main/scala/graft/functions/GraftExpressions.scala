package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the two per-pair hot loops where the
  * built-in higher-order functions (`aggregate`/`transform` — interpreted,
  * CodegenFallback) and set functions (`array_intersect`/`array_union` —
  * materialize result arrays just to count them) dominate runtime in the
  * O(n²) similarity/dedup paths. Both are full `doGenCode` implementations,
  * so they stay inside WholeStageCodegen (SURVEY.md §4.1: widen the
  * codegen spans).
  *
  * Determinism contracts (what makes the DuckDB oracle still match):
  *  - `vector_dot` is a strict sequential left fold of per-element double
  *    products — the same op order as the oracle's `list_reduce` lambda;
  *    the JVM does not contract a*b+acc into fma, so results are
  *    bit-identical.
  *  - `array_jaccard` computes |A∩B| / |A∪B| on DISTINCT elements —
  *    integer counts, one IEEE division.
  */
object GraftExpressions {

  /** Hash-set intersection/union counting used by ArrayJaccard's generated
    * code (codegen calls a static method; the loop body stays branch-free
    * in the generated class). */
  def jaccardCount(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[Any](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { sa.add(a.getUTF8String(i)); i += 1 }
    i = 0
    var inter = 0
    val seen = new java.util.HashSet[Any](b.numElements() * 2)
    while (i < b.numElements()) {
      val e = b.getUTF8String(i)
      if (seen.add(e) && sa.contains(e)) inter += 1
      i += 1
    }
    val union = sa.size() + seen.size() - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  /** Ragged-input guard shared by the dot products: the interpreted ANSI
    * folds they replace index both arrays by the FIRST array's positions,
    * so a length mismatch throws (`element_at` past the end) rather than
    * silently truncating — malformed embedding data must be loud, not a
    * plausible wrong cosine. */
  private def dotLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vector dot: ragged arrays ($n vs ${b.numElements()} elements)")
    n
  }

  /** Strict sequential left fold of per-element double products — the
    * same op order as the oracle's `list_reduce` lambda; the JVM does not
    * contract a*b+acc into fma, so results are bit-identical. Throws on
    * ragged inputs; a null element null-propagates the whole result (a
    * null product poisons the fold on both engines). */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = dotLen(a, b)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  /** Decimal-exact dot product: sum_i of CAST(a[i]*b[i] AS DECIMAL(38,12)),
    * returned as DOUBLE — bit-identical to the DuckDB oracle's
    * `list_reduce(list_transform(...), (acc, x) -> acc + x)` (an EXACT sum
    * of the per-product quantizations; list_reduce, NOT list_sum, because
    * list_sum SKIPS null elements while this fold null-propagates — the
    * oracle must diverge-or-agree exactly as the engine does on malformed
    * data; pinned by spec against Spark's exact decimal SUM), and
    * a single primitive loop instead of per-element array allocation +
    * interpreted lambda evaluation + Decimal object churn. The interpreted
    * r2 `aggregate(...)` fold this replaced was NOT itself exact — Catalyst
    * rescales the fold's (38,12)+(38,12) intermediate to scale 11 each
    * step — so the native loop is both faster and closer to the oracle.
    *
    * Semantics matched precisely:
    *  - Spark's CAST(double AS DECIMAL) goes through
    *    `Decimal(BigDecimal(d))` where Scala's `BigDecimal(d: Double)` uses
    *    `java.math.BigDecimal(Double.toString(d))` — i.e. `valueOf`
    *    semantics — then `changePrecision(38,12)` rounds HALF_UP. So:
    *    `BigDecimal.valueOf(p).setScale(12, HALF_UP)`.
    *  - decimal addition at scale 12 is exact (64 terms nowhere near 38
    *    digits), same as the fold's CAST(acc + x AS DECIMAL(38,12)).
    *  - CAST(decimal AS DOUBLE) = BigDecimal.doubleValue().
    *  - ragged inputs throw, null elements null-propagate (see dot). */
  def dotDec(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = dotLen(a, b)
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      acc = acc.add(java.math.BigDecimal.valueOf(p)
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  /** Merge-count Jaccard over two SORTED DISTINCT long arrays — the
    * O(n²)-pair hot path of the brute-force dedup baselines. Callers hash
    * each shingle to a 60-bit integer once per DOCUMENT (md5-prefix, so
    * the DuckDB oracle derives the identical value) and sort; the per-PAIR
    * work is then a primitive two-pointer merge with no allocation, no
    * string hashing, no HashSet — ~20× cheaper than set-intersecting the
    * raw shingle strings. */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Sorted distinct 60-bit hashes of all k-word shingles of `ws`:
    * h = first 15 hex chars of md5("w_i w_{i+1} … w_{i+k-1}") as a BIGINT —
    * byte-identical to the SQL spec
    * `array_sort(array_distinct(transform(shingles(ws, k), s ->
    *    CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT))))`
    * (and to DuckDB's `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`),
    * but one digest pass per shingle over reused word bytes instead of an
    * interpreted transform chain building a string per shingle. The first
    * 15 hex chars of the digest are the top 60 bits of its first 8 bytes.
    * Returns an empty array when fewer than k words. */
  def shingleHashes(ws: ArrayData, k: Int): ArrayData = {
    val n = ws.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.emptyLongArray)
    val out = rawGramHashes(ws, k)
    java.util.Arrays.sort(out)
    var m = 0
    var i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(m) = out(i); m += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  /** POSITIONAL md5-prefix gram hashes: element i is the 60-bit hash of
    * the k-word gram starting at word i — index order preserved, no
    * distinct (unlike [[shingleHashes]], whose set semantics feed
    * Jaccard/MinHash; this feeds positional posting lists, where WHERE a
    * gram occurs matters). Empty array when fewer than k words. */
  def gramHashes(ws: ArrayData, k: Int): ArrayData = {
    val n = ws.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.emptyLongArray)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rawGramHashes(ws, k))
  }

  /** Shared digest loop: one md5 per k-word window over reused word
    * bytes; h_i = top 60 bits (15 hex nibbles) of md5("w_i … w_{i+k-1}"),
    * byte-identical to the SQL spec `transform(shingles(ws, k), s ->
    * CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT))` (and DuckDB's
    * `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`). Requires
    * n >= k. */
  private def rawGramHashes(ws: ArrayData, k: Int): Array[Long] = {
    val n = ws.numElements()
    val wordBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val w = ws.getUTF8String(i)
      wordBytes(i) = if (w == null) null else w.getBytes
      i += 1
    }
    val md = md5Local.get()
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      md.reset()
      // concat_ws parity: null words are SKIPPED entirely (no extra
      // separator), matching the SQL spec this replaces
      var j = 0
      var wrote = false
      while (j < k) {
        val wb = wordBytes(i + j)
        if (wb != null) {
          if (wrote) md.update(' '.toByte)
          md.update(wb)
          wrote = true
        }
        j += 1
      }
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = v >>> 4 // first 15 hex nibbles of the digest
      i += 1
    }
    out
  }

  private val POW10 = Array.tabulate(19)(i => math.pow(10, i))

  /** Exact scaled-long value of CAST(x AS DECIMAL(_, s)) — i.e.
    * BigDecimal.valueOf(x).setScale(s, HALF_UP).unscaledValue(), which is
    * precisely Spark's double→decimal cast semantics (Cast goes through
    * Decimal(BigDecimal(d)) = Double.toString-based valueOf, then
    * changePrecision rounds HALF_UP). The fast path avoids the
    * Double.toString/BigDecimal parse per row: y = x·10^s determines the
    * rounded value whenever y is clearly away from a .5 tie — the combined
    * relative error of the multiply and of the shortest-repr gap is a few
    * ulp, so a guard band of 4 ulp (+1e-9 absolute) around the tie point
    * is conservative; ties and near-ties take the exact slow path.
    *
    * Summing these longs IS the exact decimal sum (order-insensitive);
    * magnitude bound: |total| must stay below 2^63/10^s — ANSI sum
    * overflow throws rather than wraps, so a violation is loud. */
  def decScaled(x: Double, s: Int): Long = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      throw new ArithmeticException(
        s"dec_scaled: cannot represent $x as DECIMAL (ANSI-loud, like CAST)")
    val y = x * POW10(s)
    val ay = math.abs(y)
    if (ay < 1e14) {
      val f = math.floor(y)
      val frac = y - f
      val band = 4 * math.ulp(ay) + 1e-9
      if (frac > 0.5 + band) return f.toLong + 1
      if (frac < 0.5 - band) return f.toLong
    }
    java.math.BigDecimal.valueOf(x)
      .setScale(s, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  /** CAST(DECIMAL(_,s) AS DOUBLE) of a scaled-long decimal value:
    * BigDecimal(unscaled, s).doubleValue(). */
  def scaledToDouble(v: Long, s: Int): Double =
    java.math.BigDecimal.valueOf(v, s).doubleValue()

  /** Same, for an aggregated DECIMAL(38,0) unscaled total (the unbounded-
    * headroom sum path): movePointLeft is exact, doubleValue is the single
    * correct rounding — `CAST(sum AS DOUBLE)/10^s` would round TWICE once
    * the unscaled total exceeds 2^53. */
  def scaledToDouble(v: org.apache.spark.sql.types.Decimal, s: Int): Double =
    v.toJavaBigDecimal.movePointLeft(s).doubleValue()

  /** Unicode NFC normalization (canonical composition) of a UTF8String.
    * java.text.Normalizer implements the same Unicode standard as
    * DuckDB's utf8proc-backed nfc_normalize, so md5 fingerprints of
    * normalized text agree byte-for-byte across engines — gated by
    * q_text_normalize. Compatibility (NFKC) folding is NOT done here:
    * DuckDB exposes no NFKC, so the width/confusable tier is an explicit
    * translate table both engines share (TextQueries.normalizeText). */
  def nfcNormalize(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString,
        java.text.Normalizer.Form.NFC))

  /** Every native function as (SQL name, expression class, builder) —
    * the single source of truth for BOTH registration surfaces
    * (Engine.ready's function registry and the SparkSessionExtensions
    * path), so the two can't drift. */
  val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("vector_dot", classOf[VectorDot],
      (c: Seq[Expression]) => VectorDot(c(0), c(1))),
    ("array_jaccard", classOf[ArrayJaccard],
      (c: Seq[Expression]) => ArrayJaccard(c(0), c(1))),
    ("array_jaccard_sorted", classOf[SortedLongJaccard],
      (c: Seq[Expression]) => SortedLongJaccard(c(0), c(1))),
    ("vector_dot_dec", classOf[VectorDotDecimal],
      (c: Seq[Expression]) => VectorDotDecimal(c(0), c(1))),
    ("shingle_hashes", classOf[ShingleHashes],
      (c: Seq[Expression]) => ShingleHashes(c(0), c(1))),
    ("gram_hashes", classOf[GramHashes],
      (c: Seq[Expression]) => GramHashes(c(0), c(1))),
    ("dec_scaled", classOf[DecScaled],
      (c: Seq[Expression]) => DecScaled(c(0), c(1))),
    ("scaled_double", classOf[ScaledDouble],
      (c: Seq[Expression]) => ScaledDouble(c(0), c(1))),
    ("nfc_normalize", classOf[NfcNormalize],
      (c: Seq[Expression]) => NfcNormalize(c(0))),
    // Spark's OWN runtime-filter machinery (the expressions behind
    // InjectRuntimeFilter), surfaced as SQL functions so pipelines can
    // build an EXPLICIT bloom prefilter: aggregate a key column into a
    // bloom sketch (associative bit-OR merge — partial-aggregable, a few
    // MB for millions of keys), broadcast it via an uncorrelated scalar
    // subquery, and prefilter a huge scan with `might_contain` BEFORE any
    // join/shuffle. might_contain requires the bloom side to be foldable
    // or a scalar subquery — exactly the broadcast-scalar idiom the rest
    // of this engine uses. Used by q_decontaminate_bloom.
    ("bloom_filter_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
      (c: Seq[Expression]) => c match {
        case Seq(x) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(x)
        case Seq(x, e) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(x, e)
        case Seq(x, e, n) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(x, e, n)
        case other => throw new IllegalArgumentException(
          s"bloom_filter_agg expects 1-3 args, got ${other.size}")
      }),
    ("might_contain",
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain],
      (c: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(c(0), c(1))))

  /** Register graft functions on a session (SQL name surface). */
  def register(extensions: SparkSessionExtensions): Unit =
    functions.foreach { case (name, cls, builder) =>
      extensions.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
}

/** `spark.sql.extensions` provider: enables every graft native function on
  * any SparkSession with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")` —
  * the standard injection point for a cluster-wide deployment (set once in
  * spark-defaults.conf; no code dependency on graft.Engine). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftExpressions.register(extensions)
}

/** Unicode NFC normalization of a string column (canonical composition:
  * base char + combining marks → precomposed forms). The codegen'd tier
  * below the explicit width/confusable translate table — see
  * GraftExpressions.nfcNormalize for the cross-engine contract. Named
  * nfc_normalize to match DuckDB's function surface. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    GraftExpressions.nfcNormalize(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.GraftExpressions.nfcNormalize($s);")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

/** Scaled-long value of CAST(double AS DECIMAL(_, s)) — see
  * GraftExpressions.decScaled for the exactness contract. Feeding SUM(long)
  * with this replaces the decimal cast + decimal-sum hot loop of every
  * exact money/value aggregate (the per-row Double.toString → BigDecimal
  * parse dominated q1_agg at round 3). */
case class DecScaled(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == IntegerType
        && right.foldable) {
      // resolve the scale at analysis: POW10 indexing and long headroom
      // both require 0..18 — fail the query plan, not the executor
      right.eval() match {
        case s: java.lang.Integer if s >= 0 && s <= 18 =>
          TypeCheckResult.TypeCheckSuccess
        case s => TypeCheckResult.TypeCheckFailure(
          s"dec_scaled scale must be in [0, 18], got $s")
      }
    } else TypeCheckResult.TypeCheckFailure(
      s"dec_scaled requires (DOUBLE, INT literal), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any, s: Any): Any =
    GraftExpressions.decScaled(x.asInstanceOf[Double], s.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, s) =>
      s"${ev.value} = graft.functions.GraftExpressions.decScaled($x, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecScaled =
    copy(left = newLeft, right = newRight)
}

/** CAST(DECIMAL AS DOUBLE) of a scaled decimal value (companion of
  * DecScaled, applied to the aggregated sum — per GROUP, not per row).
  * Accepts BIGINT (bounded-headroom fast path: typed folds) or
  * DECIMAL(_, 0) (the unbounded-headroom SUM path dsum uses). */
case class ScaledDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  private def leftOk: Boolean = left.dataType match {
    case LongType => true
    case d: DecimalType => d.scale == 0
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (leftOk && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"scaled_double requires (BIGINT | DECIMAL(_,0), INT literal), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any, s: Any): Any = v match {
    case l: java.lang.Long =>
      GraftExpressions.scaledToDouble(l.longValue(), s.asInstanceOf[Int])
    case d: org.apache.spark.sql.types.Decimal =>
      GraftExpressions.scaledToDouble(d, s.asInstanceOf[Int])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, s) =>
      s"${ev.value} = graft.functions.GraftExpressions.scaledToDouble($v, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScaledDouble =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two float-array columns as a double — strict sequential
  * left fold, codegen'd to a tight primitive loop (GraftExpressions.dot).
  * Ragged inputs throw (ANSI-loud, like the fold it replaces); a null
  * element null-propagates the result. */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot requires two ARRAY<FLOAT> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  // null element inputs can null the result even when both arrays are
  // non-null columns
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftExpressions.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.GraftExpressions.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Decimal-exact dot product of two float-array columns (see
  * GraftExpressions.dotDec for the precision contract). Replaces the
  * interpreted HOF decimal fold in every q_sim_* / q_dedup_embedding
  * cosine — the dominant cost of the ANN family at round 2. */
case class VectorDotDecimal(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot_dec requires two ARRAY<FLOAT> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  // null element inputs can null the result even when both arrays are
  // non-null columns
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftExpressions.dotDec(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.GraftExpressions.dotDec($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotDecimal =
    copy(left = newLeft, right = newRight)
}

/** Sorted distinct md5-prefix hashes of the k-word shingles of a word
  * array (see GraftExpressions.shingleHashes for the exact byte contract).
  * Replaces the interpreted shingle → concat_ws → md5 → conv HOF chain of
  * the dedup/decontamination pipelines with one digest loop per row. */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okWords = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (okWords && right.dataType == IntegerType && right.foldable) {
      // resolve k at analysis (mirrors DecScaled's scale check): k = 0
      // would silently emit n+1 hashes of md5(""), negative k oversized
      // garbage arrays — fail the query plan, not the executor
      right.eval() match {
        case k: java.lang.Integer if k >= 1 && k <= 100 =>
          TypeCheckResult.TypeCheckSuccess
        case k => TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes k must be in [1, 100], got $k")
      }
    } else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires (ARRAY<STRING>, INT literal), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(ws: Any, k: Any): Any =
    GraftExpressions.shingleHashes(
      ws.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ws, k) =>
      s"${ev.value} = graft.functions.GraftExpressions.shingleHashes($ws, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

/** POSITIONAL md5-prefix hashes of the k-word grams of a word array —
  * element i hashes the gram starting at word i, index order preserved,
  * duplicates kept (see GraftExpressions.gramHashes). Feeds positional
  * posting lists (exact-substring dedup), where shingle_hashes' sorted
  * set semantics would lose WHERE each gram occurs. */
case class GramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okWords = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (okWords && right.dataType == IntegerType && right.foldable) {
      right.eval() match {
        case k: java.lang.Integer if k >= 1 && k <= 100 =>
          TypeCheckResult.TypeCheckSuccess
        case k => TypeCheckResult.TypeCheckFailure(
          s"gram_hashes k must be in [1, 100], got $k")
      }
    } else TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires (ARRAY<STRING>, INT literal), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(ws: Any, k: Any): Any =
    GraftExpressions.gramHashes(
      ws.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ws, k) =>
      s"${ev.value} = graft.functions.GraftExpressions.gramHashes($ws, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramHashes =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity of two string-array columns on distinct elements —
  * counts only, never materializes intersection/union arrays. */
case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case ArrayType(NullType, _) => true // array() literal
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_jaccard requires two ARRAY<STRING> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftExpressions.jaccardCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftExpressions.jaccardCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayJaccard =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity of two sorted, distinct ARRAY<BIGINT> columns via
  * two-pointer merge count. Contract: both inputs are sorted ascending
  * with no duplicates (build them with array_sort(array_distinct(...))) —
  * unsorted input silently undercounts, which is why this is a separate
  * function instead of a fast path inside array_jaccard. */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case ArrayType(NullType, _) => true // array() literal
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_jaccard_sorted requires two ARRAY<BIGINT> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftExpressions.sortedJaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftExpressions.sortedJaccard($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongJaccard =
    copy(left = newLeft, right = newRight)
}
