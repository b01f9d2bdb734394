package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Heuristic language identification: stopword-profile voting, expressed
  * entirely with built-in array functions (codegen-friendly, no UDF, no
  * model file). Each language has a profile of very-high-frequency words;
  * the detected language is the profile with the most token hits.
  *
  * This is the classic n-gram/stopword heuristic at its smallest: good
  * enough to route documents in a data pipeline, cheap enough to run on
  * every row of a 100 TB corpus (one array traversal per profile).
  */
object LangId {

  /** (language, profile) pairs — tiny, high-frequency function words. */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it", "on", "that"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "un", "une", "sur"),
    "de" -> Seq("der", "die", "das", "und", "ist", "im", "ein", "eine", "nicht", "mit"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "es", "un", "una", "en"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"),
  )

  /** Detected language of `text`: argmax of profile hit counts over the
    * token multiset; ties break toward the lexicographically last
    * language code (array_max over (score, lang) structs). Returns
    * "unknown" when no profile scores a single hit. Single token-array
    * traversal accumulating one counter per profile (see the TextSig
    * performance rule). */
  def langId(text: Column): Column =
    aggregate(
      TextSig.tokens(text),
      array_repeat(lit(0L), Profiles.size),
      (acc, w) => zip_with(
        acc,
        array(Profiles.map { case (_, words) =>
          when(w.isin(words: _*), lit(1L)).otherwise(lit(0L))
        }: _*),
        (a, v) => a + v),
      counts => {
        val scored = array(Profiles.zipWithIndex.map { case ((lang, _), i) =>
          struct(element_at(counts, i + 1).as("score"), lit(lang).as("lang"))
        }: _*)
        val best = array_max(scored)
        when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("unknown"))
      })
}
