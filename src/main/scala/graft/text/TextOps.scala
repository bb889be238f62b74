package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (n-gram/stopword heuristic), quality scoring, token
  * counting, and document fingerprinting. All scan-local (no shuffle):
  * the hot counting work is the one-pass native [[TextStats]] expression
  * (text feature extraction at 100 TB is regex-bound; ~10 regexp_count /
  * split passes fused into two linear scans), with the original
  * regex-Column forms kept as `*Regex` cross-check twins — TextParitySpec
  * pins native == regex on fixtures and edge cases.
  */
object TextOps {

  /** One-pass text statistics struct
    * (en/de/es/fr/cjk/alpha/punct/nws/nbpe) — see [[TextStats]].
    */
  def textStats(c: Column): Column = column(TextStats(expression(c)))

  /** Lowercase + collapse runs of whitespace + trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column = textStats(c).getField("nws")

  /** BPE-ish token count: alpha runs, single digits, punctuation marks.
    * Approximates subword tokenizers' pre-tokenization split.
    */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def tokenCountBpe(c: Column): Column = textStats(c).getField("nbpe")

  // Stopword alternations per language (tiny, high-precision markers).
  val EnPat = "\\b(the|and|of|to|is|in|that|it|with|for)\\b"
  val DePat = "\\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\\b"
  val EsPat = "\\b(el|la|los|las|es|y|en|que|de|un|una|por)\\b"
  val FrPat = "\\b(le|la|les|et|est|dans|que|une|des|du|pour)\\b"
  val CjkPat = "[\\x{4e00}-\\x{9fff}]"

  def scoreEn(c: Column): Column = textStats(c).getField("en")
  def scoreDe(c: Column): Column = textStats(c).getField("de")
  def scoreEs(c: Column): Column = textStats(c).getField("es")
  def scoreFr(c: Column): Column = textStats(c).getField("fr")
  def scoreCjk(c: Column): Column = textStats(c).getField("cjk")

  /** Heuristic language ID with a fixed precedence tie-break
    * (zh > en > es > fr > de > und). Deterministic by construction.
    */
  def langId(c: Column): Column = {
    val st = textStats(c)
    langIdFrom(st.getField("en"), st.getField("de"), st.getField("es"),
      st.getField("fr"), st.getField("cjk"))
  }

  private def langIdFrom(en: Column, de: Column, es: Column, fr: Column,
                         zh: Column): Column =
    when(zh > 0, "zh")
      .when(en >= es && en >= fr && en >= de && en > 0, "en")
      .when(es >= fr && es >= de && es > 0, "es")
      .when(fr >= de && fr > 0, "fr")
      .when(de > 0, "de")
      .otherwise("und")

  /** Quality score in [0,1]: blends alpha ratio, whitespace sanity, mean
    * word length band and punctuation density. All integer counts + IEEE
    * arithmetic — reproducible in any engine.
    */
  def qualityScore(c: Column): Column = {
    val st = textStats(c)
    qualityFrom(length(c).cast("double"),
      st.getField("alpha").cast("double"),
      st.getField("punct").cast("double"),
      st.getField("nws").cast("double"))
  }

  private def qualityFrom(len: Column, alpha: Column, punct: Column,
                          words: Column): Column = {
    val alphaRatio = when(len > 0, alpha / len).otherwise(lit(0.0))
    val punctRatio = when(len > 0, punct / len).otherwise(lit(0.0))
    val meanWord = when(words > 0, alpha / words).otherwise(lit(0.0))
    val wordBand = when(meanWord >= 3 && meanWord <= 10, lit(1.0))
      .otherwise(lit(0.0))
    val punctOk = when(punctRatio <= 0.1, lit(1.0)).otherwise(lit(0.0))
    round(alphaRatio * 0.5 + wordBand * 0.3 + punctOk * 0.2, 6)
  }

  /** Exact content fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(to_binary(normalize(c), lit("utf-8")))

  /** Order-insensitive fingerprint: md5 over the sorted word multiset —
    * catches shuffled near-duplicates.
    */
  def sortedWordFingerprint(c: Column): Column =
    md5(to_binary(array_join(array_sort(split(normalize(c), " ")), " "),
      lit("utf-8")))

  /** md5 keys of the NON-OVERLAPPING `len`-word windows of the normalized
    * text (ceil(words/len) passages; the final window clamps). The ONE
    * passage-key generator shared by batch cross-doc passage dedup (q79)
    * and the streaming passage admission probe — 16-byte keys so dedup
    * joins/probes never carry the passage strings.
    */
  def passageHashes(c: Column, len: Int): Column =
    passageHashesOfWords(split(normalize(c), " "), len)

  /** [[passageHashes]] over an ALREADY-materialized normalized word
    * array (the [[graft.queries.GramMemo]] artifact) — same keys, no
    * re-normalize/re-split pass.
    */
  def passageHashesOfWords(w: Column, len: Int): Column = {
    val np = floor((size(w) + lit(len - 1)) / lit(len)).cast("int")
    transform(sequence(lit(0), np - 1), p =>
      md5(to_binary(array_join(slice(w, p * len + 1, lit(len)), " "),
        lit("utf-8"))))
  }

  // --------------------------------------------------------------------
  // Regex-Column twins of the TextStats-backed operators (the original
  // formulations). Semantics oracles for TextParitySpec; not hot paths.
  // --------------------------------------------------------------------

  def tokenCountWsRegex(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L))
      .otherwise(size(split(trim(c), "\\s+")).cast("long"))

  def tokenCountBpeRegex(c: Column): Column =
    regexp_count(c, lit(BpePattern)).cast("long")

  def langIdRegex(c: Column): Column =
    langIdFrom(regexp_count(lower(c), lit(EnPat)),
      regexp_count(lower(c), lit(DePat)),
      regexp_count(lower(c), lit(EsPat)),
      regexp_count(lower(c), lit(FrPat)),
      regexp_count(c, lit(CjkPat)))

  def qualityScoreRegex(c: Column): Column =
    qualityFrom(length(c).cast("double"),
      regexp_count(c, lit("[A-Za-z]")).cast("double"),
      regexp_count(c, lit("[.,;:!?]")).cast("double"),
      tokenCountWsRegex(c).cast("double"))
}
