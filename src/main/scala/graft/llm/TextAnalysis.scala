package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, shingling, quality features, marker-based language ID and
  * document fingerprinting.
  *
  * Everything is a pure `Column` expression (no UDFs): at 100 TB these run
  * inside whole-stage codegen directly over the parquet scan, shuffle-free —
  * the per-document cost is the only cost.
  */
object TextAnalysis {

  /** Whitespace word split (the corpus is single-space separated). */
  def words(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(words(text))

  /** BPE-ish token count: alpha runs, single digits, single non-alnum marks.
    * A cheap, deterministic proxy for subword token budgeting.
    */
  def tokenCountBpe(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]|[^a-z0-9 ]"))

  /** Word n-gram shingles as an array column (empty array when the document
    * has fewer than n words). Array-expression form — no explode, no shuffle.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val w = words(text)
    val cnt = size(w) - (n - 1)
    when(cnt > 0,
      transform(sequence(lit(1), cnt),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** One MinHash value: min over shingles of md5(seed|shingle). md5 is used
    * as the hash family because it is identical in every engine (and in the
    * DuckDB oracle) — a production variant would swap in xxhash64.
    */
  def minhash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(s"$seed|"), s))))

  /** Count of non-overlapping occurrences of a literal pattern (the
    * replace-length trick — identical left-to-right semantics everywhere).
    */
  def occurrences(text: Column, pattern: String): Column =
    ((length(text) - length(call_function("replace", text, lit(pattern), lit("")))) / pattern.length)
      .cast("long")

  /** Marker vocabularies for the language-ID heuristic. Padded-space match
    * so only whole words count.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " of "),
    "fr" -> Seq(" le ", " la ", " les "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " los ", " una "))

  /** Per-language marker score over ' '-padded lowercased text. */
  def langScore(text: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    markers.map(m => occurrences(padded, m)).reduce(_ + _)
  }

  /** Argmax language with deterministic priority tie-break (catalog order);
    * all-zero scores → 'und'.
    */
  def langId(text: Column): Column =
    langIdFromScores(langMarkers.map { case (l, ms) => l -> langScore(text, ms) })

  /** All 12 language markers flattened in catalog order. */
  val allLangMarkers: Seq[String] = langMarkers.flatMap(_._2)

  /** One-pass compiled occurrence counts for every language marker (the
    * scan-speed path: one `MarkerCounts` kernel call per document instead of
    * 12 replace+length string rebuilds). Stage this as a column, then derive
    * scores with [[langScoresFromCounts]].
    */
  def langMarkerCounts(text: Column): Column =
    graft.functions.TextExprs.markerCounts(text, allLangMarkers)

  /** Per-language scores from a staged [[langMarkerCounts]] array. */
  def langScoresFromCounts(counts: Column): Seq[(String, Column)] = {
    val offsets = langMarkers.scanLeft(0) { case (acc, (_, ms)) => acc + ms.length }
    langMarkers.zip(offsets).map { case ((l, ms), off) =>
      l -> ms.indices.map(k => element_at(counts, off + k + 1)).reduce(_ + _)
    }
  }

  /** Deterministic argmax over per-language score columns. */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val maxScore = greatest(scores.map(_._2): _*)
    val pick = scores.foldLeft(when(maxScore === 0, "und")) {
      case (acc, (l, s)) => acc.when(s === maxScore, l)
    }
    pick.otherwise("und")
  }

  /** Word-count / word-length / stopword-density quality features. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  def stopwordRatio(text: Column): Column = {
    val w = words(text)
    size(filter(w, x => x.isin(stopwords.map(_.asInstanceOf[Any]): _*))) * lit(1.0) / size(w)
  }

  def avgWordLen(text: Column): Column =
    length(call_function("replace", text, lit(" "), lit(""))) * lit(1.0) / size(words(text))

  /** Coarse quality bin from length + stopword density (the shape of a
    * heuristic quality scorer; thresholds are illustrative).
    */
  def qualityBin(text: Column): Column = {
    val nw = tokenCountWs(text)
    val sw = stopwordRatio(text)
    when(nw < 20, "too_short")
      .when(sw > 0.4, "boilerplate")
      .when(sw < 0.02, "unnatural")
      .otherwise("ok")
  }

  /** Document fingerprint: min-md5 over word 5-gram shingles (winnowing-style
    * content signature; identical word sequences → identical fingerprint).
    */
  def fingerprint(text: Column): Column =
    array_min(transform(wordShingles(text, 5), s => md5(s)))

  /** Intra-document repetition: 1 − distinct/total word n-gram shingles —
    * 0 for fully novel text, → 1 as the document degenerates into repeated
    * boilerplate. The standard corpus-filtering signal for loops/templated
    * spam; NULL when the document is shorter than one shingle (repetition
    * is undefined, not zero, on such fragments).
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val sh = wordShingles(text, n)
    when(size(sh) > 0,
      lit(1.0) - size(array_distinct(sh)) * lit(1.0) / size(sh))
  }
}
