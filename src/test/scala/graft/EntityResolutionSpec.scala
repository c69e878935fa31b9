package graft

import graft.operators.EntityResolution
import graft.operators.EntityResolution.FieldWeight
import org.apache.spark.sql.{functions => F}

class EntityResolutionSpec extends SparkSpec {

  val nameW = FieldWeight("name", 0.95, 0.001) // agree +9.89, disagree -4.32
  val cityW = FieldWeight("city", 0.9, 0.05)   // agree +4.17, disagree -3.25
  val bdayW = FieldWeight("bday", 0.9, 0.01)   // agree +6.49, disagree -3.25

  lazy val records = {
    val s = spark
    import s.implicits._
    Seq(
      // entity 1: exact name + all fields — trivially linked
      (1L, "maria gonzalez", "lyon", "1984"),
      (2L, "maria gonzalez", "lyon", "1984"),
      // entity 2: one-char typo, fields agree — must still link
      // (typo name disagrees: -4.32 + 4.17 + 6.49 = +6.34)
      (3L, "john smith", "oslo", "1990"),
      (4L, "john smyth", "oslo", "1990"),
      // near-name but different person: typo-range name, all fields
      // differ (-4.32 - 3.25 - 3.25 < 0) — must NOT link
      (5L, "anna berg", "kiev", "1970"),
      (6L, "anna burg", "rome", "1988"),
      // entity 3 via transitivity: 7~8 (typo) and 8~9 (typo) but 7 and
      // 9 are 2 edits apart — the cluster must still merge all three
      (7L, "liu wei", "pune", "1979"),
      (8L, "liu wai", "pune", "1979"),
      (9L, "lia wai", "pune", "1979")
    ).toDF("id", "name", "city", "bday")
  }

  test("scorePairs: weights reward agreement, punish disagreement") {
    val scores = EntityResolution
      .scorePairs(records, "id", "name", nameW, Seq(cityW, bdayW))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // exact-name pair scores the full agreement sum
    val full = nameW.agreeW + cityW.agreeW + bdayW.agreeW
    assert(math.abs(scores((1L, 2L)) - BigDecimal(full)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // typo'd pair: name disagrees, fields carry it positive
    assert(scores((3L, 4L)) > 0)
    // different person in typo range: negative
    assert(scores((5L, 6L)) < 0)
  }

  test("resolve: links, transitivity, canonical minimum; negatives excluded") {
    val m = EntityResolution
      .resolve(records, "id", "name", nameW, Seq(cityW, bdayW),
        threshold = 0.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == 1L && m(2L) == 1L)
    assert(m(3L) == 3L && m(4L) == 3L)
    // 7-8-9 chain merges through transitive closure even though 7 and
    // 9 never blocked together (levenshtein 2 > maxDist 1)
    assert(m(7L) == 7L && m(8L) == 7L && m(9L) == 7L)
    assert(!m.contains(5L) && !m.contains(6L),
      "sub-threshold pairs must not link")
  }

  test("FieldWeight validation: m must exceed u, both in (0,1)") {
    intercept[IllegalArgumentException](FieldWeight("x", 0.5, 0.5))
    intercept[IllegalArgumentException](FieldWeight("x", 0.1, 0.9))
    intercept[IllegalArgumentException](FieldWeight("x", 1.0, 0.5))
  }
}
