package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for training-data pipelines: tokenization,
  * quality scoring, language-ID heuristic, fingerprinting. All built from
  * codegen'd built-in functions (regexp/array ops) so the identical formula
  * is expressible in the DuckDB oracle — the SQL mirror sits next to each
  * builder. */
object TextOps {

  // ---- tokenization ----
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))
  def tokensSql(text: String): String = s"regexp_extract_all($text, '\\S+')"

  def nTokens(text: Column): Column = size(tokens(text))
  def nTokensSql(text: String): String = s"CAST(len(${tokensSql(text)}) AS INT)"

  def nDistinctTokens(text: Column): Column = size(array_distinct(tokens(text)))
  def nDistinctTokensSql(text: String): String =
    s"CAST(len(list_distinct(${tokensSql(text)})) AS INT)"

  /** Word k-gram shingles (distinct), the MinHash input. One codegen'd
    * kernel pass ([[graft.functions.VecTextOps.wordShingles]]) — the
    * declarative transform/slice/concat_ws chain evaluates INTERPRETED per
    * shingle (higher-order functions never enter codegen) and this
    * projection runs once per corpus row in every near-dup path. The SQL
    * mirror for oracles stays the declarative formula; values are
    * identical (same `\S+` tokenization, `< k` fallback, first-occurrence
    * distinct order — kernel-vs-formula equality is spec-pinned). */
  def shingles(text: Column, k: Int): Column =
    graft.functions.Gf.wordShingles(text, k)

  /** The declarative shingle formula (the kernel's spec + oracle mirror). */
  def shinglesDeclarative(text: Column, k: Int): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) < k, array(concat_ws(" ", t)))
        .otherwise(transform(sequence(lit(0), size(t) - k),
          i => concat_ws(" ", slice(t, i + 1, lit(k))))))
  }

  // ---- counts for quality scoring ----
  private def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))
  private def countMatchesSql(c: String, pattern: String): String =
    s"CAST(len(regexp_extract_all($c, '$pattern')) AS INT)"

  val EnStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")

  def stopwordCount(text: Column, words: Seq[String] = EnStopwords): Column =
    countMatches(lower(text), "\\b(" + words.mkString("|") + ")\\b")
  def stopwordCountSql(text: String, words: Seq[String] = EnStopwords): String =
    countMatchesSql(s"lower($text)", "\\b(" + words.mkString("|") + ")\\b")

  def punctCount(text: Column): Column = countMatches(text, "[.,;:!?]")
  def punctCountSql(text: String): String = countMatchesSql(text, "[.,;:!?]")

  def digitCount(text: Column): Column = countMatches(text, "[0-9]")
  def digitCountSql(text: String): String = countMatchesSql(text, "[0-9]")

  // ---- normalization + fingerprint (document dedup key) ----
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))
  def normalizedSql(text: String): String =
    s"trim(regexp_replace(lower($text), '\\s+', ' ', 'g'))"

  def fingerprint(text: Column): Column = md5(normalized(text))
  def fingerprintSql(text: String): String = s"md5(${normalizedSql(text)})"

  // ---- language-ID heuristic: stopword-hit scoring per language ----
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "la", "y", "los", "es"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  def langScore(text: Column, lang: String): Column =
    stopwordCount(text, LangStopwords.toMap.apply(lang))
  def langScoreSql(text: String, lang: String): String =
    stopwordCountSql(text, LangStopwords.toMap.apply(lang))

  /** argmax language with first-listed tie-break (CASE order mirrors SQL). */
  def langId(text: Column): Column = {
    val scores = LangStopwords.map { case (l, _) => l -> langScore(text, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }
  // NOTE: foldRight means the FIRST language in LangStopwords wins ties —
  // the SQL mirror must test in the same order:
  def langIdSql(text: String): String = {
    val scores = LangStopwords.map { case (l, _) => l -> langScoreSql(text, l) }
    val best = scores.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
    val cases = scores.map { case (l, s) => s"WHEN $s = $best AND $s > 0 THEN '$l'" }
    s"CASE ${cases.mkString(" ")} ELSE 'und' END"
  }
}
