package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: one-pass cosine similarity over two
  * `Array[Float]` columns, accumulating dot product and both norms in a
  * single tight loop over the unsafe array data — no intermediate array
  * allocation (`zip_with`+`aggregate` allocates a 64-element array per
  * row) and no quantization detour. Emits straight-line Java inside
  * whole-stage codegen; the interpreted `nullSafeEval` is the fallback
  * and the semantic reference.
  *
  * Accumulation is in ascending index order, so the result is the exact
  * left-associated fold — reproducible anywhere, and mirrored in SQL by
  * an explicit 64-term sum (float→double casts are exact; float×float
  * products are exact in double).
  *
  * Null elements inside the arrays are not expected (embedding columns);
  * a shorter array truncates the loop.
  */
case class CosineSimFloat(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = (double) $a.getFloat($i);
         |  final double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot /
         |  (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimFloat =
    copy(left = newLeft, right = newRight)
}

/** Native integer dot product over two `Array[Long]` columns — the hot
  * primitive of the quantized similarity paths. Integer addition is
  * associative, so the fused loop returns the SAME value as the
  * `zip_with`+`aggregate` fold it replaces (bit-for-bit, oracle
  * equality preserved) while skipping the per-row intermediate array
  * allocation. */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L; var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

/** Native sliding-window minimum over an `Array[Long]` column — the
  * winnowing primitive (Schleimer SIGMOD'03): `out[i] = min(in[i ..
  * i+w-1])` (trailing windows shrink), with consecutive repeats
  * collapsed in-loop (adjacent windows usually share their minimum, so
  * this cuts the emitted array ~w× before the `array_distinct` that
  * completes the per-doc dedup). A `transform`+`slice`+`array_min`
  * formulation allocates a w-element array per position — benchmarked
  * ~2× slower than the window-function version it was meant to replace;
  * this loop allocates once per row. */
case class SlidingMinLong(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1, s"window must be >= 1, got $w")
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sliding_min"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = new Array[Long](n)
    var k = 0; var prev = 0L; var i = 0
    while (i < n) {
      var m = arr.getLong(i)
      val end = math.min(i + w, n)
      var j = i + 1
      while (j < end) { val v = arr.getLong(j); if (v < m) m = v; j += 1 }
      if (k == 0 || m != prev) { buf(k) = m; k += 1; prev = m }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val buf = ctx.freshName("buf")
      val k = ctx.freshName("k")
      val prev = ctx.freshName("prev")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val end = ctx.freshName("end")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $c.numElements();
         |final long[] $buf = new long[$n];
         |int $k = 0; long $prev = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $m = $c.getLong($i);
         |  final int $end = java.lang.Math.min($i + $w, $n);
         |  for (int $j = $i + 1; $j < $end; $j++) {
         |    final long $v = $c.getLong($j);
         |    if ($v < $m) $m = $v;
         |  }
         |  if ($k == 0 || $m != $prev) { $buf[$k] = $m; $k++; $prev = $m; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : SlidingMinLong = copy(child = newChild)
}

/** Native multiset statistics over a string array (the repetition
  * filter's hot loop): returns `(n, best, uniq)` = (element count, max
  * multiplicity of any element, distinct count) in one pass — sort a
  * per-row copy (any total order works; only EQUAL-adjacency matters,
  * and `UTF8String` is `Comparable`), then count runs. Replaces an
  * interpreted `array_sort` + higher-order `aggregate` chain (HOFs are
  * CodegenFallback) with straight-line Java inside whole-stage codegen.
  * Values are exact integers — the oracle equality is untouched. Null
  * elements are not expected (gram arrays). */
object GramStats {
  /** The kernel, shared verbatim by the interpreted and codegen paths
    * (the [[SimHash56]] pattern — the two cannot diverge): sort a
    * per-row copy, count runs; returns {n, best, uniq}. */
  def compute(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val buf = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    // null elements skip (r5 ADVICE): the internal call sites never
    // produce them, but this is a public Column API and a null in the
    // sort would NPE — skipping = "no gram there", the only sane read
    var m = 0
    var i = 0
    while (i < n) {
      val v = arr.getUTF8String(i)
      if (v != null) { buf(m) = v; m += 1 }
      i += 1
    }
    java.util.Arrays.sort(buf.asInstanceOf[Array[AnyRef]], 0, m)
    var best = 0L; var uniq = 0L; var run = 0L
    i = 0
    while (i < m) {
      if (i > 0 && buf(i) == buf(i - 1)) run += 1
      else { run = 1L; uniq += 1L }
      if (run > best) best = run
      i += 1
    }
    Array(m.toLong, best, uniq)
  }
}

case class GramStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("best", LongType, nullable = false),
    StructField("uniq", LongType, nullable = false)))
  override def prettyName: String = "gram_stats"

  override def nullSafeEval(input: Any): Any = {
    val r = GramStats.compute(input.asInstanceOf[ArrayData])
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](r(0), r(1), r(2)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |final long[] $r = graft.functions.GramStats.compute($c);
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] {java.lang.Long.valueOf($r[0]),
         |      java.lang.Long.valueOf($r[1]), java.lang.Long.valueOf($r[2])});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : GramStats = copy(child = newChild)
}

/** The 56-bit SimHash kernel (Charikar '02), shared verbatim by the
  * interpreted and codegen paths of [[SimHashTokens]]: for every token
  * OCCURRENCE, hash `"t:" + token` with md5 and take the first 15 hex
  * chars as a 60-bit value (byte-identical to the SQL/Column form
  * `conv(substr(md5(concat('t:', tok)), 1, 15), 16, 10)` — the first 8
  * digest bytes big-endian, shifted right 4); each of the 56 low bits
  * contributes ±1 to its signed sum, and signature bit b is set iff
  * sum(b) ≥ 0. Accumulating per occurrence instead of per distinct
  * token × count is the same integer sum, so the result matches the
  * explode+groupBy formulation bit for bit. */
object SimHash56 {
  val Bits = 56
  private val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(arr: ArrayData): Long = {
    val md = digest.get()
    val sums = new Array[Long](Bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok == null) { i += 1 } else {
      md.reset()
      md.update('t'.toByte)
      md.update(':'.toByte)
      md.update(tok.getBytes)
      val h = md.digest()
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (h(j) & 0xffL); j += 1 }
      val th = v >>> 4 // first 15 hex chars = 60 bits
      var b = 0
      while (b < Bits) {
        sums(b) += (((th >> b) & 1L) * 2L - 1L)
        b += 1
      }
      i += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < Bits) { if (sums(b) >= 0L) sig |= (1L << b); b += 1 }
    sig
  }
}

/** Native per-row SimHash over a token array: the whole signature in
  * one scan-side loop — no (doc, token) explode, no corpus-wide
  * exchange, no 56 separate sum aggregates. Codegen emits a call to
  * the SAME [[SimHash56.compute]] kernel the interpreted path uses, so
  * the two cannot diverge. */
case class SimHashTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash56"

  override def nullSafeEval(input: Any): Any =
    SimHash56.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash56.compute($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHashTokens = copy(child = newChild)
}

/** Native Catalyst GENERATOR — the UDTF half of the §2.10 surface:
  * sliding n-token windows over an `array<string>` column emitted as
  * (pos, gram) rows. The composed form (`transform` + `slice` +
  * `concat_ws` + `posexplode`) materializes every gram in a per-row
  * array BEFORE the Generate; this emits each row straight off the
  * unsafe array data — no intermediate allocation, one UTF8String
  * concat per window.
  *
  * Generators execute inside `GenerateExec`, which calls `eval`
  * row-by-row — only the built-in explode family inlines into
  * whole-stage codegen, so `CodegenFallback` is the supported path for
  * a custom generator (the kernel cost is the string concat either
  * way). Null elements are not expected (tokenizer output); a null
  * input array generates nothing.
  */
case class NgramWindows(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback
    with ExpectsInputTypes {
  require(n >= 1, s"ngram_windows: n must be >= 1, got $n")
  override def inputTypes = Seq(ArrayType(StringType))
  override def prettyName: String = "ngram_windows"

  override def elementSchema: StructType = StructType(
    StructField("pos", IntegerType, nullable = false) ::
      StructField("gram", StringType, nullable = true) :: Nil)

  private lazy val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val a = v.asInstanceOf[ArrayData]
      val m = a.numElements() - n + 1
      if (m <= 0) Iterator.empty
      else Iterator.tabulate(m) { i =>
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = a.getUTF8String(i + j); j += 1 }
        InternalRow(i, UTF8String.concatWs(sep, parts: _*))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NgramWindows = copy(child = newChild)
}

/** Native 2-D Hilbert-curve index (Hilbert 1891; the iterative
  * rotate-and-accumulate form popularized by the public-domain
  * Wikipedia `xy2d` algorithm): maps two `bits`-wide non-negative
  * lanes to the cell's position along the order-`bits` Hilbert curve.
  *
  * Why a second curve next to [[graft.ml.Layout.morton2]]: Morton
  * interleaving takes jumps — adjacent curve positions can sit a whole
  * quadrant apart — while every consecutive Hilbert step moves to a
  * UNIT-adjacent cell (spec-pinned exhaustively), so range-partitioned
  * files get envelopes that are tight rectangles rather than Z-shaped
  * unions. Same contract as the Morton key otherwise: pure integer
  * arithmetic, bit-identical on any engine, one codegen'd scalar per
  * row, no shuffle.
  *
  * The per-level rotation makes the walk STATEFUL (x and y rewrite each
  * level), which is why this is a native expression and not a
  * `functions._` composition: a column-expression unroll would
  * substitute the rewritten x/y into every downstream reference and
  * grow exponentially under CollapseProject. The DuckDB oracle instead
  * unrolls the identical loop as `bits` chained subqueries (one
  * projection per level — linear, each level names its rewritten
  * lanes), generated from the same constants
  * ([[graft.ml.Layout.hilbert2Sql]]). */
case class HilbertIndex2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val n = 1L << bits
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1L - x; y = n - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = 1L << bits
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (long $s = ${n >> 1}L; $s > 0L; $s >>= 1) {
         |  final long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  final long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${n - 1L}L - $x; $y = ${n - 1L}L - $y; }
         |    final long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2 =
    copy(left = newLeft, right = newRight)
}

/** Column-level API for the native vector expressions. */
object VectorFunctions {
  def cosineSimF(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimFloat(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def slidingMin(a: Column, w: Int): Column =
    ColumnBridge.column(SlidingMinLong(ColumnBridge.expression(a), w))

  def gramStats(a: Column): Column =
    ColumnBridge.column(GramStats(ColumnBridge.expression(a)))

  def simhashTokens(a: Column): Column =
    ColumnBridge.column(SimHashTokens(ColumnBridge.expression(a)))

  def ngramWindows(a: Column, n: Int): Column =
    ColumnBridge.column(NgramWindows(ColumnBridge.expression(a), n))

  def hilbert2(a: Column, b: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndex2(
      ColumnBridge.expression(a), ColumnBridge.expression(b), bits))
}
