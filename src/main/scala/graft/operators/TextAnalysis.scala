package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §7.5):
  * language ID, quality scoring, token counting, fingerprinting. All pure
  * Column code over whitespace tokens — per-row, embarrassingly parallel,
  * no shuffles until the caller aggregates.
  */
object TextAnalysis {

  /** Small per-language marker lexicons (n-gram-heuristic stand-in; at
    * production scale these would be rulepack data like everything else).
    */
  val markerLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow", "value"),
    "de" -> Seq("der", "die", "und", "schnell", "wert"),
    "fr" -> Seq("le", "la", "et", "vite", "valeur"),
    "es" -> Seq("el", "la", "y", "rapido", "valor"),
    "zh" -> Seq("spark", "stream", "batch", "window", "join"))

  /** Per-language overlap score: |tokens ∩ lexicon| (distinct). */
  def languageScores(tokens: Column): Seq[(String, Column)] =
    markerLexicons.map { case (lang, words) =>
      lang -> size(array_intersect(
        array_distinct(tokens), array(words.map(lit): _*)))
    }

  /** Predicted language: argmax of the scores with deterministic
    * alphabetical tiebreak, expressed as a when-chain (no UDF).
    */
  def languageId(tokens: Column): Column = {
    val scores = languageScores(tokens)
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.foldLeft(Option.empty[Column]) {
      case (None, (lang, s))      => Some(when(s === best, lang))
      case (Some(acc), (lang, s)) => Some(acc.when(s === best, lang))
    }.get.otherwise("und")
  }

  /** Whitespace token count without split: 1 + count of spaces (matches
    * len(string_split(text,' ')) in both engines for any spacing). */
  def tokenCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + 1)

  /** BPE-ish subword count estimate: ceil(chars/4) is the classic
    * ~4-chars-per-token heuristic; cheap, deterministic, vector-free. */
  def subwordCountEstimate(text: Column): Column =
    ceil(length(text).cast("double") / 4.0).cast("long")

  /** Composite quality score in [0,1]: length band + mean-token-length
    * band + stopword-ratio band, the reference-style banded when-chain
    * over cheap ratios (length/punct/stopword features).
    */
  def qualityScore(text: Column): Column = {
    val toks = split(text, " ")
    val nTokens = size(toks).cast("double")
    val meanTokLen = (length(text) - (nTokens - 1.0)) / nTokens
    val enStop = array(Seq("the", "a", "of", "and").map(lit): _*)
    val stopRatio = size(array_intersect(array_distinct(toks), enStop))
      .cast("double") / lit(4.0)
    val lengthBand = when(length(text) < 50, 0.2)
      .when(length(text) < 200, 0.6).otherwise(1.0)
    val tokBand = when(meanTokLen < 2.0, 0.3)
      .when(meanTokLen <= 8.0, 1.0).otherwise(0.5)
    (lengthBand * 0.4 + tokBand * 0.4 + stopRatio * 0.2)
  }
}
