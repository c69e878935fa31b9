package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels as codegen Catalyst expressions — the
  * third member of the ANN codec family (exact → SQ8 → PQ; composable
  * with the IVF coarse quantizer exactly as in the public faiss
  * IndexIVFPQ design): the vector is split into `m` contiguous
  * subspaces of `dsub` dims, each subspace is vector-quantized against
  * its own `ksub`-entry codebook (trained by
  * [[graft.scale.DeterministicKMeans]], so the whole codec is
  * oracle-replayable), and a row is stored as `m` BYTES — at m=8 over
  * 64 float64 dims that is a 64× density win over the raw column,
  * 8× over SQ8.
  *
  *   - [[PqEncodeVec]]   ARRAY<DOUBLE> → BINARY (m bytes/row): per
  *     subspace, the argmin-squared-L2 codebook entry (ties → smaller
  *     index, the [[graft.scale.DeterministicKMeans.Model.predict]]
  *     total order)
  *   - [[PqAdcCosine]]   asymmetric-distance scoring: the query is
  *     NEVER quantized — per-subspace dot/norm² lookup tables (m·ksub
  *     doubles, computed once per query on the driver) turn the scan
  *     into `m` byte-indexed table reads per row, no per-row float
  *     loop over the original dims at all. The score equals
  *     cosine(query, reconstruction(codes)) exactly.
  */
object PqKernels {

  /** codes for one vector: books is the flattened [m][ksub][dsub]
    * codebook array (subspace-major, then entry, then dim). */
  def encode(xs: Array[Double], books: Array[Double], m: Int, ksub: Int): Array[Byte] = {
    require(m > 0 && ksub > 0 && ksub <= 256,
      s"pq_encode: need 0 < ksub <= 256 and m > 0; got m=$m ksub=$ksub")
    val dsub = books.length / (m * ksub)
    require(books.length == m * ksub * dsub,
      s"pq_encode: codebook length ${books.length} not divisible by m*ksub=${m * ksub}")
    require(xs.length >= m * dsub,
      s"pq_encode: vector has ${xs.length} dims but codec covers ${m * dsub}")
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val x0 = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        val c0 = (s * ksub + j) * dsub
        var d = 0.0
        var f = 0
        while (f < dsub) {
          val t = xs(x0 + f) - books(c0 + f)
          d += t * t
          f += 1
        }
        if (d < bestD) { bestD = d; best = j } // strict: ties keep smaller j
        j += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** cosine(query, reconstruction): lutDot[s·ksub+j] = Σ_f q·c,
    * lutN2[s·ksub+j] = Σ_f c² — ksub is derived as
    * lutDot.length / codes.length so the expression stays 4-ary.
    * Accumulation order is ascending subspace, matching the oracle's
    * reconstruction sum closely enough for the round-4 contract.
    *
    * ArrayData-direct: the LUTs are read IN PLACE by offset — the
    * whole point of ADC is m byte-indexed reads per row, and the
    * previous form copied both m·ksub-double LUTs into fresh arrays
    * EVERY ROW (~8 KB/row at m=8/ksub=64), which is why the "cheap"
    * ADC scan measured slower than the full float cosine at the 40×
    * bitext bench. Zero per-row allocation now.
    */
  def adcCosine(
      codes: Array[Byte], lutDot: ArrayData, lutN2: ArrayData,
      qnorm: Double): Double = {
    val m = codes.length
    if (m == 0 || lutDot.numElements() % m != 0) return 0.0
    val ksub = lutDot.numElements() / m
    var dot = 0.0
    var n2 = 0.0
    var s = 0
    while (s < m) {
      val j = codes(s) & 0xFF
      val idx = s * ksub + j
      dot += lutDot.getDouble(idx)
      n2 += lutN2.getDouble(idx)
      s += 1
    }
    if (qnorm == 0.0 || n2 == 0.0) 0.0 else dot / (qnorm * math.sqrt(n2))
  }

  /** Primitive-array convenience overload (specs and driver-side
    * callers); delegates to the ArrayData form so the two cannot
    * drift. */
  def adcCosine(
      codes: Array[Byte], lutDot: Array[Double], lutN2: Array[Double],
      qnorm: Double): Double =
    adcCosine(
      codes,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(lutDot),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(lutN2),
      qnorm)

  /** Σ_s lut[s·ksub + code_s] — the raw ADC table-sum primitive the
    * RESIDUAL codec composes its score from (the fused [[adcCosine]]
    * bakes the ‖x̂‖ = ‖dequant‖ assumption in, which is false once the
    * reconstruction is centroid + dequant). Same zero-copy contract:
    * the LUT is read in place by offset, no per-row allocation. */
  def adcSum(codes: Array[Byte], lut: ArrayData): Double = {
    val m = codes.length
    if (m == 0 || lut.numElements() % m != 0) return 0.0
    val ksub = lut.numElements() / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += lut.getDouble(s * ksub + (codes(s) & 0xFF))
      s += 1
    }
    acc
  }

  def adcSum(codes: Array[Byte], lut: Array[Double]): Double =
    adcSum(codes, new org.apache.spark.sql.catalyst.util.GenericArrayData(lut))
}

case class PqEncodeVec(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pq_encode"
  // a null vector ELEMENT null-propagates even when the array is non-null
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (third.dataType == IntegerType && fourth.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<double>, int, int)")
  }

  override protected def nullSafeEval(a: Any, bk: Any, m: Any, ks: Any): Any = {
    val xs =
      if (VectorKernels.slotsNullable(first)) VectorKernels.doublesOrNull(a.asInstanceOf[ArrayData])
      else a.asInstanceOf[ArrayData].toDoubleArray()
    if (xs == null) null
    else PqKernels.encode(
      xs, bk.asInstanceOf[ArrayData].toDoubleArray(),
      m.asInstanceOf[Int], ks.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, bk, m, ks) => {
      val xs = ctx.freshName("xs")
      val nullA = ctx.freshName("nullA")
      val k = PqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${VectorKernels.genNullScan(ctx, a, nullA, VectorKernels.slotsNullable(first))}
         |if ($nullA) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $xs = $a.toDoubleArray();
         |  ${ev.value} = $k.encode($xs, $bk.toDoubleArray(), $m, $ks);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PqEncodeVec =
    copy(first = f, second = s, third = t, fourth = q)
}

/** BINARY codes × ARRAY<DOUBLE> LUT → Σ_s lut[s·ksub+code_s]. The
  * residual-IVF+PQ scoring primitive: per-query dot LUTs and the
  * build-time norm/cross tables all reduce through this one sum, and
  * the quotient is composed in plain Column arithmetic so every term
  * stays inside whole-stage codegen. */
case class PqAdcSum(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_sum"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary, array<double>)")
  }

  override protected def nullSafeEval(c: Any, lut: Any): Any =
    PqKernels.adcSum(c.asInstanceOf[Array[Byte]], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, lut) => {
      val k = PqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $k.adcSum($c, $lut);"
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdcSum = copy(left = l, right = r)
}

case class PqAdcCosine(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_cosine"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (first.dataType == BinaryType && fourth.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary, array<double>, array<double>, double)")
  }

  override protected def nullSafeEval(c: Any, ld: Any, ln: Any, qn: Any): Any =
    PqKernels.adcCosine(
      c.asInstanceOf[Array[Byte]],
      ld.asInstanceOf[ArrayData],
      ln.asInstanceOf[ArrayData],
      qn.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, ld, ln, qn) => {
      val k = PqKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      // ArrayData-direct kernel call: no per-row LUT copies
      s"${ev.value} = $k.adcCosine($c, $ld, $ln, $qn);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PqAdcCosine =
    copy(first = f, second = s, third = t, fourth = q)
}
