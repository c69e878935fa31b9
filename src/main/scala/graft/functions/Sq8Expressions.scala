package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** SQ8 scalar-quantization kernels as codegen Catalyst expressions —
  * the materialized-codes form of [[graft.operators.Similarity]]'s SQ8
  * ANN path (the standard per-dimension min/max 8-bit codec of the
  * public ANN literature, e.g. faiss ScalarQuantizer QT_8bit):
  *
  *   - [[Sq8EncodeVec]]  ARRAY<DOUBLE> → BINARY (d bytes/row, 8× the
  *     density of the float64 column — the form that lets a 100 TB
  *     corpus' codes live in cluster memory / a slim parquet column)
  *   - [[Sq8CosineDeq]]  BINARY codes scored against a FULL-PRECISION
  *     query by asymmetric dequantized cosine, one fused primitive
  *     loop, no intermediate array allocation
  *
  * Parity contract: `decode(encode(x))` is BIT-IDENTICAL to the
  * expression-algebra form `mn + round((x−mn)/s·255, 0)·s/255` the
  * one-shot path and the DuckDB oracle compute — encode therefore
  * rounds with the same decimal HALF_UP semantics as Spark's
  * `F.round` (java.math.BigDecimal), not `Math.round`: the two agree
  * almost everywhere on non-negative doubles, but "almost" is not a
  * hash-match, and encode is the once-per-corpus pass where the extra
  * BigDecimal cost is irrelevant. The scan-side dequant is pure
  * primitive arithmetic.
  */
object Sq8Kernels {
  /** Decimal round-half-up to an integer code, clamped to [0, 255] —
    * exactly `F.round(v, 0)` (BigDecimal HALF_UP on the double's
    * canonical decimal form), so materialized codes reproduce the
    * expression-algebra quantizer bit for bit. */
  def code(v: Double): Int = {
    val r = java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    if (r <= 0.0) 0 else if (r >= 255.0) 255 else r.toInt
  }

  def encode(xs: Array[Double], mins: Array[Double], maxs: Array[Double]): Array[Byte] = {
    val d = xs.length
    require(mins.length == d && maxs.length == d,
      s"sq8_encode: vector has $d dims but stats have ${mins.length}/${maxs.length}")
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      val s = maxs(i) - mins(i)
      out(i) = if (s == 0.0) 0 else code((xs(i) - mins(i)) / s * 255.0).toByte
      i += 1
    }
    out
  }

  /** Asymmetric cosine: dequantize each byte (`mn + c·s/255`; a
    * constant dimension dequantizes to the constant) and accumulate
    * against the full-precision query in one loop. Same accumulation
    * order as [[VectorKernels.cosine]], so scores match the one-shot
    * path's `cosine(dq, q)` exactly.
    *
    * ArrayData-direct: q/mins/maxs are read IN PLACE by offset —
    * ZERO per-row allocation. The previous form copied all three into
    * fresh primitive arrays every row (~1.5 KB/row); on a probed scan
    * scoring hundreds of millions of candidate rows that allocation
    * churn, not the arithmetic, dominated the 40× bench profile.
    * Callers must null-scan `q` first (the expression's genNullScan
    * does); a null slot would read as 0 here.
    */
  def cosineDeq(
      codes: Array[Byte], q: ArrayData,
      mins: ArrayData, maxs: ArrayData): Double = {
    val n = math.min(codes.length, q.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val mn = mins.getDouble(i)
      val s = maxs.getDouble(i) - mn
      val x = if (s == 0.0) mn else mn + (codes(i) & 0xFF) * s / 255.0
      val y = q.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else d / math.sqrt(na * nb)
  }

  /** Primitive-array convenience overload (specs and driver-side
    * callers); delegates to the ArrayData form so the two cannot
    * drift. */
  def cosineDeq(
      codes: Array[Byte], q: Array[Double],
      mins: Array[Double], maxs: Array[Double]): Double =
    cosineDeq(
      codes,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(q),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(mins),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(maxs))

  /** Per-ROW scalar SQ8: quantize one vector under a single (lo, hi)
    * range shared by every dimension — self-contained (no fitted
    * per-dimension stats, no sidecar), which is what a streaming gate
    * needs to compress TRANSIENT per-batch probe vectors it will never
    * see again ([[graft.streaming.StreamingOps.embedGateBatch]],
    * VERDICT r13 #3). Returns (codes, lo, hi, err) where `err` is an
    * EXACT sound bound on the cosine error the compression introduces
    * against ANY other vector v:
    *
    *   |cos(v, x) − cos(v, decode(codes))| =
    *     |⟨v/‖v‖, x/‖x‖ − x̂/‖x̂‖⟩| ≤ ‖x/‖x‖ − x̂/‖x̂‖‖ = err
    *
    * (Cauchy–Schwarz; computable exactly at encode time because both
    * x and its decode are in hand). Conventions at the zero-norm
    * edges mirror [[cosineDeq]]'s cos = 0: ‖x‖ = 0 ⇒ err = 0 (exact
    * cosine is 0 everywhere, nothing to bound); ‖x‖ ≠ 0 but the
    * decode collapses to zero ⇒ err = 2 (the unit-sphere diameter —
    * keeps every pair, so a pruning pass built on this bound stays
    * sound).
    */
  def encodeScalar(xs: Array[Double]): (Array[Byte], Double, Double, Double) = {
    val d = xs.length
    var lo = Double.PositiveInfinity
    var hi = Double.NegativeInfinity
    var i = 0
    while (i < d) {
      if (xs(i) < lo) lo = xs(i)
      if (xs(i) > hi) hi = xs(i)
      i += 1
    }
    if (d == 0) return (Array.emptyByteArray, 0.0, 0.0, 0.0)
    val s = hi - lo
    val out = new Array[Byte](d)
    val dec = new Array[Double](d)
    i = 0
    while (i < d) {
      val c = if (s == 0.0) 0 else code((xs(i) - lo) / s * 255.0)
      out(i) = c.toByte
      // decode EXACTLY as cosineDeqScalar does, so err is the true
      // residual of the scan-side reconstruction
      dec(i) = if (s == 0.0) lo else lo + (c & 0xFF) * s / 255.0
      i += 1
    }
    var nx = 0.0; var nd = 0.0
    i = 0
    while (i < d) { nx += xs(i) * xs(i); nd += dec(i) * dec(i); i += 1 }
    val err =
      if (nx == 0.0) 0.0
      else if (nd == 0.0) 2.0
      else {
        val sx = math.sqrt(nx); val sd = math.sqrt(nd)
        var acc = 0.0
        i = 0
        while (i < d) {
          val t = xs(i) / sx - dec(i) / sd
          acc += t * t
          i += 1
        }
        math.sqrt(acc)
      }
    (out, lo, hi, err)
  }

  /** Asymmetric cosine against a scalar-range code ([[encodeScalar]]):
    * dequantize each byte under the single (lo, hi) range and
    * accumulate against the full-precision vector in one loop — the
    * scan-side mate of [[encodeScalar]], same accumulation order and
    * zero-norm convention as [[cosineDeq]]. */
  def cosineDeqScalar(
      codes: Array[Byte], v: ArrayData, lo: Double, hi: Double): Double = {
    val n = math.min(codes.length, v.numElements())
    val s = hi - lo
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (s == 0.0) lo else lo + (codes(i) & 0xFF) * s / 255.0
      val y = v.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else d / math.sqrt(na * nb)
  }

  /** Primitive-array convenience overload; delegates so the two forms
    * cannot drift. */
  def cosineDeqScalar(
      codes: Array[Byte], v: Array[Double], lo: Double, hi: Double): Double =
    cosineDeqScalar(
      codes,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(v), lo, hi)
}

case class Sq8EncodeVec(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_sq8_encode"
  // a null ELEMENT null-propagates even when the array is non-null
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, mn: Any, mx: Any): Any = {
    val xs =
      if (VectorKernels.slotsNullable(first)) VectorKernels.doublesOrNull(a.asInstanceOf[ArrayData])
      else a.asInstanceOf[ArrayData].toDoubleArray()
    if (xs == null) null
    else Sq8Kernels.encode(
      xs,
      mn.asInstanceOf[ArrayData].toDoubleArray(),
      mx.asInstanceOf[ArrayData].toDoubleArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, mn, mx) => {
      val xs = ctx.freshName("xs")
      val nullA = ctx.freshName("nullA")
      val k = Sq8Kernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${VectorKernels.genNullScan(ctx, a, nullA, VectorKernels.slotsNullable(first))}
         |if ($nullA) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $xs = $a.toDoubleArray();
         |  ${ev.value} = $k.encode($xs, $mn.toDoubleArray(), $mx.toDoubleArray());
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Sq8EncodeVec =
    copy(first = f, second = s, third = t)
}

case class Sq8CosineDeq(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_cosine"
  // a null query ELEMENT null-propagates even when all inputs are non-null
  override def nullable: Boolean = true

  override protected def nullSafeEval(c: Any, q: Any, mn: Any, mx: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    if (VectorKernels.slotsNullable(second) && VectorKernels.hasNullSlot(qa)) null
    else Sq8Kernels.cosineDeq(
      c.asInstanceOf[Array[Byte]], qa,
      mn.asInstanceOf[ArrayData], mx.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, q, mn, mx) => {
      val nullQ = ctx.freshName("nullQ")
      val k = Sq8Kernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      // ArrayData-direct kernel call: no per-row toDoubleArray copies
      s"""
         |${VectorKernels.genNullScan(ctx, q, nullQ, VectorKernels.slotsNullable(second))}
         |if ($nullQ) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $k.cosineDeq($c, $q, $mn, $mx);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Sq8CosineDeq =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Scalar-range asymmetric cosine: BINARY [[Sq8Kernels.encodeScalar]]
  * codes scored against a full-precision ARRAY<DOUBLE> under the
  * per-row (lo, hi) DOUBLE range — the codegen'd scan primitive for
  * transient per-row compression (the embed gate's probe broadcast).
  */
case class Sq8CosineDeqScalar(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_cosine_scalar"
  // a null vector ELEMENT null-propagates even when all inputs are non-null
  override def nullable: Boolean = true

  override protected def nullSafeEval(c: Any, v: Any, lo: Any, hi: Any): Any = {
    val va = v.asInstanceOf[ArrayData]
    if (VectorKernels.slotsNullable(second) && VectorKernels.hasNullSlot(va)) null
    else Sq8Kernels.cosineDeqScalar(
      c.asInstanceOf[Array[Byte]], va,
      lo.asInstanceOf[Double], hi.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, v, lo, hi) => {
      val nullV = ctx.freshName("nullV")
      val k = Sq8Kernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${VectorKernels.genNullScan(ctx, v, nullV, VectorKernels.slotsNullable(second))}
         |if ($nullV) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $k.cosineDeqScalar($c, $v, $lo, $hi);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Sq8CosineDeqScalar =
    copy(first = f, second = s, third = t, fourth = q)
}
