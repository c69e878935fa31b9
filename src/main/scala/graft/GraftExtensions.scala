package graft

import graft.functions.{CosineSimilarity, DotProduct, L2Norm, L2Normalize, Sq8CosineDeq, Sq8EncodeVec}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Spark extension entry point: makes the native vector kernels
  * available to pure-SQL users at session creation —
  * `--conf spark.sql.extensions=graft.GraftExtensions`. (The same
  * registrations are available on a live session via
  * `VectorFunctions.registerAll`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def d(e: Expression): Expression = Cast(e, ArrayType(DoubleType))

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, name)
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"), info("graft_cosine", "cosine similarity"),
      (es: Seq[Expression]) => CosineSimilarity(d(es(0)), d(es(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"), info("graft_dot", "dot product"),
      (es: Seq[Expression]) => DotProduct(d(es(0)), d(es(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_l2norm"), info("graft_l2norm", "L2 norm"),
      (es: Seq[Expression]) => L2Norm(d(es.head))))
    ext.injectFunction((
      FunctionIdentifier("graft_l2normalize"), info("graft_l2normalize", "L2 normalize"),
      (es: Seq[Expression]) => L2Normalize(d(es.head))))
    ext.injectFunction((
      FunctionIdentifier("graft_sq8_encode"),
      info("graft_sq8_encode", "SQ8-quantize a vector to BINARY codes"),
      (es: Seq[Expression]) => Sq8EncodeVec(d(es(0)), d(es(1)), d(es(2)))))
    ext.injectFunction((
      FunctionIdentifier("graft_sq8_cosine"),
      info("graft_sq8_cosine", "asymmetric dequantized cosine over SQ8 codes"),
      (es: Seq[Expression]) => Sq8CosineDeq(es(0), d(es(1)), d(es(2)), d(es(3)))))
  }
}
