package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.jaLexicon

/** Japanese tag quality validation — the filter every tag extractor
  * shares (tag-generator/app/tag_extractor/tag_validator.py):
  *
  *  - `is_valid_japanese_tag` (:35): length ∈ [2, 15], no
  *    verb/auxiliary ending (sentence fragments — です/ます/した/
  *    する/…), no trailing grammatical particle (incomplete noun
  *    phrases — は/が/を/…), not digits-only, not a URL/HTML
  *    fragment (https/www/com/…, case-insensitive);
  *  - `clean_noun_phrase` (:76): strip, remove ONE trailing particle,
  *    then ONE verb ending, strip — the fixed order and single-pass
  *    semantics pinned (するの → particle drops first, the exposed
  *    する then drops → empty).
  *
  * The patterns are the reference's own (plain `$`-anchored
  * alternations and character classes — identical in Java regex and
  * RE2, shared with the oracle). Both checks are stateless codegen
  * scan projections — no explode, no shuffle, no join; this is the
  * gate that runs per candidate tag at extraction time, upstream of
  * the tg01 graph builder.
  *
  * Composition: candidate tags are jaLexicon terms with trailing
  * particles / verb endings / digit runs / URL fragments planted per
  * residue, plus over/under-length and clean-through-to-empty cases.
  */
object TagValidate {

  val verbEndings: String =
    "(です|ます|ました|ている|した|する|ない|ある|いる|れる|られる|います|ています|しょう|でしょう)$"
  val particleEndings: String = "[はがをにでとのへやもかな]$"
  val urlFragments: String = "^(https?|www|com|org|net|html|gt|lt|amp|nbsp)$"
  val MaxTagLength = 15

  /** Composed candidate tags: (tag_id, tag). */
  def composeCandidates(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id").as("tag_id"))
    val base = element_at(
      array(jaLexicon.take(40).map(lit): _*),
      (pmod(col("tag_id"), lit(40)) + 1).cast("int"))
    val tag = when(col("tag_id") % 19 === 0, "語") // under min length
      .when(col("tag_id") % 17 === 0, concat(base, base, base, base, base)) // over max
      .when(col("tag_id") % 13 === 0, (col("tag_id") % 1000).cast("string")) // digits-only
      .when(col("tag_id") % 11 === 0,
        element_at(array(lit("https"), lit("WWW"), lit("nbsp"), lit("Com")),
          (pmod(col("tag_id"), lit(4)) + 1).cast("int"))) // url/html fragments, mixed case
      .when(col("tag_id") % 7 === 0, concat(base, lit("します"))) // verb fragment? します: "ます"$ fires
      .when(col("tag_id") % 5 === 0, concat(base, lit("の"))) // trailing particle
      .when(col("tag_id") % 3 === 0, concat(base, lit("するの"))) // particle hides a verb ending
      .otherwise(base)
    d.select(col("tag_id"), tag.as("tag"))
  }

  /** The validation battery over any (tag_id, tag) frame. */
  def validateOn(cands: DataFrame): DataFrame = {
    val t = col("tag")
    val isValid = length(t).between(2, MaxTagLength) &&
      !t.rlike(verbEndings) && !t.rlike(particleEndings) &&
      !t.rlike("^[0-9]+$") && !lower(t).rlike(urlFragments)
    val cleaned = trim(regexp_replace(
      regexp_replace(trim(t), particleEndings, ""), verbEndings, ""))
    cands.select(col("tag_id"), col("tag"),
      isValid.as("is_valid"), cleaned.as("cleaned"))
  }

  def tv01(s: SparkSession, dir: String): DataFrame =
    validateOn(composeCandidates(s, dir))
}
