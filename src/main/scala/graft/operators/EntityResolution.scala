package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Fellegi–Sunter probabilistic record linkage (the 1969 model every
  * production ER system — Splink, dedupe.io, JedAI — still scores
  * with): candidate pairs from a cheap BLOCKING stage are scored by a
  * sum of per-field log-likelihood-ratio weights
  *
  *   agree on field i:    log₂(mᵢ/uᵢ)        (mᵢ = P(agree | match),
  *   disagree on field i: log₂((1−mᵢ)/(1−uᵢ))  uᵢ = P(agree | non-match))
  *
  * and pairs above a threshold are linked; transitive closure turns
  * links into entities.
  *
  * Distributed shape: blocking is [[FuzzyJoin.selfMatch]]'s
  * deletion-neighborhood equi-join (never a cartesian — spec-pinned
  * there), scoring is map-only column algebra over the candidate
  * pairs with the weights baked in as literals, and clustering is
  * [[Dedup.dupClusters]]' GraphX connected components. m/u are
  * caller-supplied (estimated offline or by EM — the estimation loop
  * is deliberately out of scope; the weights ARE the model).
  */
object EntityResolution {

  /** Per-field match/non-match agreement probabilities. `m` is
    * P(fields agree | records match) — high, tolerating typos; `u` is
    * P(fields agree | records don't match) — the chance-agreement
    * rate, ≈ 1/cardinality for uniform fields. */
  final case class FieldWeight(col: String, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1,
      s"m and u must be in (0, 1); got m=$m u=$u for '$col'")
    require(m > u,
      s"m must exceed u (agreement must be evidence FOR a match); " +
        s"got m=$m <= u=$u for '$col'")
    def agreeW: Double = math.log(m / u) / math.log(2.0)
    def disagreeW: Double = math.log((1 - m) / (1 - u)) / math.log(2.0)
  }

  /** Scored candidate pairs: blocking on `nameCol` (levenshtein ≤
    * `maxDist` via the deletion join), then the FS sum — the name
    * field scores `agree` only on EXACT equality (distance 0), so a
    * typo'd name still reaches scoring through the block but carries
    * its disagreement weight. Output: (id_a, id_b, dist, score
    * round-4), score-desc / id-asc ordered.
    */
  def scorePairs(
      records: DataFrame, idCol: String, nameCol: String,
      name: FieldWeight, fields: Seq[FieldWeight],
      maxDist: Int = 1): DataFrame = {
    val pairs = FuzzyJoin.selfMatch(
      records.select(F.col(idCol).as("id"), F.col(nameCol).as("s")),
      maxDist)
    val attrs = fields.map(_.col).distinct
    def side(suffix: String) = records.select(
      F.col(idCol).as(s"id_$suffix") +:
        attrs.map(c => F.col(c).as(s"${c}_$suffix")): _*)
    val nameTerm = F.when(F.col("dist") === 0L, F.lit(name.agreeW))
      .otherwise(F.lit(name.disagreeW))
    val fieldTerms = fields.map { fw =>
      F.when(F.col(s"${fw.col}_a") === F.col(s"${fw.col}_b"),
        F.lit(fw.agreeW)).otherwise(F.lit(fw.disagreeW))
    }
    pairs
      .join(side("a"), "id_a")
      .join(side("b"), "id_b")
      .select(F.col("id_a"), F.col("id_b"), F.col("dist"),
        F.round(fieldTerms.foldLeft(nameTerm)(_ + _), 4).as("score"))
      .orderBy(F.col("score").desc, F.col("id_a").asc, F.col("id_b").asc)
  }

  /** End-to-end resolution: pairs scoring ≥ `threshold` (on the
    * ROUNDED score — the stable-boundary convention) are linked,
    * links close transitively (GraphX CC), and each entity's
    * canonical id is its minimum member id. Output: (id, canonical)
    * for every record that linked to anything, ordered by id;
    * unlinked records are their own entity by omission.
    */
  def resolve(
      records: DataFrame, idCol: String, nameCol: String,
      name: FieldWeight, fields: Seq[FieldWeight],
      threshold: Double, maxDist: Int = 1): DataFrame = {
    val links = scorePairs(records, idCol, nameCol, name, fields, maxDist)
      .where(F.col("score") >= threshold)
      .select(F.col("id_a").as("doc_a"), F.col("id_b").as("doc_b"))
    Dedup.dupClusters(links)
      .select(F.col("doc_id").as("id"), F.col("keeper").as("canonical"))
      .orderBy("id")
  }
}
