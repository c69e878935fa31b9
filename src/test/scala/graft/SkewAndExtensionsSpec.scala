package graft

import graft.scale.Skew
import org.apache.spark.sql.{SparkSession, functions => F}

class SkewAndExtensionsSpec extends SparkSpec {

  test("salted top-k per key equals plain window top-k") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(9)
    val df = (1 to 5000).map { i =>
      (i % 7L, rng.nextDouble(), i.toLong)
    }.toDF("key", "dist", "dst")
    val plain = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("key").orderBy(F.col("dist").asc, F.col("dst").asc)
      df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5).drop("rn")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    }
    val salted = Skew.saltedTopKPerKey(
      df, "key", Seq(F.col("dist").asc, F.col("dst").asc), 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("GraftExtensions applies cleanly; registerAll covers the live-session path") {
    // Extensions bind at session construction (verified end-to-end via
    // spark-shell --conf spark.sql.extensions=graft.GraftExtensions);
    // a shared-session suite can only exercise the apply() wiring and
    // the runtime registration path.
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    graft.functions.VectorFunctions.registerAll(spark)
    val row = spark.sql(
      "SELECT graft_cosine(array(1.0,0.0), array(1.0,1.0)) AS c, " +
        "graft_dot(array(1.0,2.0), array(3.0,4.0)) AS d, " +
        "graft_l2norm(array(3.0,4.0)) AS n").head
    assert(math.abs(row.getDouble(0) - math.sqrt(0.5)) < 1e-12)
    assert(row.getDouble(1) == 11.0)
    assert(row.getDouble(2) == 5.0)
    // SQ8 kernels are SQL citizens too: encode to BINARY, score the
    // codes asymmetrically — round-trips the quantizer in pure SQL
    val sq8 = spark.sql(
      "SELECT graft_sq8_cosine(" +
        "graft_sq8_encode(array(0.5,1.0), array(0.0,0.0), array(1.0,2.0)), " +
        "array(0.5,1.0), array(0.0,0.0), array(1.0,2.0)) AS c, " +
        "length(graft_sq8_encode(array(0.5,1.0), array(0.0,0.0), " +
        "array(1.0,2.0))) AS w").head
    assert(math.abs(sq8.getDouble(0) - 1.0) < 1e-6, sq8.toString)
    assert(sq8.getInt(1) == 2)
  }
}
