package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

/** Column DSL over the native vector expressions. All functions accept
  * `ARRAY<DOUBLE>` (or anything implicitly castable to it, e.g. the
  * `ARRAY<FLOAT>` embeddings in the testdata) and stay codegen'd.
  */
object VectorFunctions {

  /** Inputs may be ARRAY<FLOAT> (testdata embeddings) — normalize to
    * ARRAY<DOUBLE> here since the native expressions skip Catalyst's
    * implicit-cast machinery. */
  private def asDoubles(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    Shim.expression(c.cast("array<double>"))

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    Shim.column(DotProduct(asDoubles(a), asDoubles(b)))

  /** cos(a, b); 0.0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column =
    Shim.column(CosineSimilarity(asDoubles(a), asDoubles(b)))

  /** Rectified cosine distance d = 1 − max(0, cos(a,b))
    * (reference: GRAPH_VARIABLES.md:7). NULL-propagating: greatest()
    * SKIPS null arguments, so without the guard a null cosine would
    * silently become distance 1.0 — "maximally distant" instead of
    * unknown — and eps=1.0 threshold filters would keep null rows as
    * valid neighbors. */
  def cosineDistance(a: Column, b: Column): Column = {
    val c = cosine(a, b)
    org.apache.spark.sql.functions
      .when(c.isNull, lit(null))
      .otherwise(lit(1.0) - greatest(lit(0.0), c))
  }

  /** ‖a‖₂ */
  def l2norm(a: Column): Column = Shim.column(L2Norm(asDoubles(a)))

  /** a / ‖a‖₂ (identity for the zero vector). */
  def l2normalize(a: Column): Column =
    Shim.column(L2Normalize(asDoubles(a)))

  /** Edge-weight kernel w = 1 / (1 + (d/σ)^p)
    * (reference: GRAPH_VARIABLES.md:9-10). */
  def weightKernel(dist: Column, sigma: Double, p: Double): Column =
    lit(1.0) / (lit(1.0) + pow(dist / lit(sigma), lit(p)))

  /** λ-proximity term 1 / (1 + |λa − λb|) (reference: TAUMODE.md:33). */
  def lambdaProximity(lambdaA: Column, lambdaB: Column): Column =
    lit(1.0) / (lit(1.0) + abs(lambdaA - lambdaB))

  /** Blended λ-aware score τ·cos + (1−τ)·λ-proximity
    * (reference: src/lib.rs:172, TAUMODE.md:33). */
  def lambdaScore(cos: Column, lambdaItem: Column, lambdaQ: Double, tau: Double): Column =
    lit(tau) * cos + lit(1.0 - tau) * lambdaProximity(lambdaItem, lit(lambdaQ))

  /** SQ8-quantize an ARRAY<DOUBLE> vector to BINARY codes (one byte
    * per dimension) under per-dimension (mins, maxs) stats — the
    * materialized 8×-smaller index column of the SQ8 ANN path. */
  def sq8Encode(v: Column, mins: Column, maxs: Column): Column =
    Shim.column(Sq8EncodeVec(asDoubles(v), asDoubles(mins), asDoubles(maxs)))

  /** Asymmetric dequantized cosine: BINARY SQ8 codes scored against a
    * full-precision query, one fused codegen loop. */
  def sq8Cosine(codes: Column, q: Column, mins: Column, maxs: Column): Column =
    Shim.column(Sq8CosineDeq(
      Shim.expression(codes), asDoubles(q), asDoubles(mins), asDoubles(maxs)))

  /** Scalar-range asymmetric cosine: per-row [[Sq8Kernels.encodeScalar]]
    * BINARY codes scored against a full-precision vector under the
    * row's own (lo, hi) DOUBLE range. */
  def sq8CosineScalar(codes: Column, v: Column, lo: Column, hi: Column): Column =
    Shim.column(Sq8CosineDeqScalar(
      Shim.expression(codes), asDoubles(v),
      Shim.expression(lo.cast("double")), Shim.expression(hi.cast("double"))))

  /** PQ-encode an ARRAY<DOUBLE> vector to BINARY codes (one byte per
    * subspace — m bytes/row) against a flattened [m][ksub][dsub]
    * codebook array. */
  def pqEncode(v: Column, booksFlat: Column, m: Int, ksub: Int): Column =
    Shim.column(PqEncodeVec(
      asDoubles(v), asDoubles(booksFlat),
      Shim.expression(lit(m)), Shim.expression(lit(ksub))))

  /** Asymmetric-distance cosine over PQ codes: per-subspace dot/norm²
    * lookup tables (computed once per query), m byte-indexed reads per
    * row. Equals cosine(query, reconstruction(codes)). */
  def pqAdcCosine(codes: Column, lutDot: Column, lutN2: Column, qnorm: Column): Column =
    Shim.column(PqAdcCosine(
      Shim.expression(codes), asDoubles(lutDot), asDoubles(lutN2),
      Shim.expression(qnorm.cast("double"))))

  /** Raw ADC table sum over PQ codes: Σ_s lut[s·ksub+code_s]. The
    * residual codec's scoring primitive — dot, cross, and norm² terms
    * all reduce through it and compose in plain Column arithmetic. */
  def pqAdcSum(codes: Column, lut: Column): Column =
    Shim.column(PqAdcSum(Shim.expression(codes), asDoubles(lut)))

  /** Register the native kernels for SQL use (`graft_cosine(a,b)` etc.). */
  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def d(e: Expression): Expression = Cast(e, ArrayType(DoubleType))
    Shim.registerFunction(spark, "graft_dot", es => DotProduct(d(es(0)), d(es(1))))
    Shim.registerFunction(spark, "graft_cosine", es => CosineSimilarity(d(es(0)), d(es(1))))
    Shim.registerFunction(spark, "graft_l2norm", es => L2Norm(d(es.head)))
    Shim.registerFunction(spark, "graft_l2normalize", es => L2Normalize(d(es.head)))
    Shim.registerFunction(spark, "graft_sq8_encode",
      es => Sq8EncodeVec(d(es(0)), d(es(1)), d(es(2))))
    Shim.registerFunction(spark, "graft_sq8_cosine",
      es => Sq8CosineDeq(es(0), d(es(1)), d(es(2)), d(es(3))))
    Shim.registerFunction(spark, "graft_pq_encode",
      es => PqEncodeVec(d(es(0)), d(es(1)), es(2), es(3)))
    Shim.registerFunction(spark, "graft_pq_adc_cosine",
      es => PqAdcCosine(es(0), d(es(1)), d(es(2)),
        Cast(es(3), DoubleType)))
    Shim.registerFunction(spark, "graft_pq_adc_sum",
      es => PqAdcSum(es(0), d(es(1))))
  }
}
