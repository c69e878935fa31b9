package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = () // session shared across suites

  /** Run `body` with AQE partition-coalescing OFF and a real shuffle
    * partition count: on spec-sized data AQE coalesces internal
    * shuffles (repartitionByRange etc.) to ONE partition, silently
    * reducing distributed two-phase machinery to a sequential replay —
    * the r5 review found a multi-partition carry-walk bug that every
    * layout spec missed exactly this way. Any spec exercising
    * distributed summary/carry logic must wrap the work in this.
    */
  def withRealShuffle[A](n: Int)(body: => A): A = {
    val s = spark
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val partKey = "spark.sql.shuffle.partitions"
    val c0 = s.conf.get(coalesceKey, "true")
    val p0 = s.conf.get(partKey)
    s.conf.set(coalesceKey, "false")
    s.conf.set(partKey, n.toString)
    try body
    finally { s.conf.set(coalesceKey, c0); s.conf.set(partKey, p0) }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
