package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Batch fourteen: substring-level duplication and corpus-drift
  * diagnostics — the two audits a training-data stack runs BETWEEN its
  * dedup passes (q79/q94 decide per document/passage; q112 finds the
  * long repeated SPANS those fixed windows straddle) and over its source
  * mix (q113 quantifies how far each source's word distribution drifts
  * from the corpus — the signal that feeds q88's temperature mixing).
  */
object Pipeline14 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------ q112
  // Duplicate-span detection (the substring-level dedup signal of Lee et
  // al. 2022, "Deduplicating Training Data Makes Language Models Better":
  // repeated spans ≥ N tokens across documents — memorization drivers
  // that document-level MinHash and q79's NON-overlapping passages both
  // miss, because a repeated span rarely aligns to a passage boundary).
  // Suffix arrays are the single-node tool; the relational equivalent is
  // OVERLAPPING word-8-grams + gaps-and-islands: a gram shared by ≥2 docs
  // is "duplicated", and a run of R consecutive duplicated positions
  // witnesses a repeated span of R+7 words. Dedup identity is
  // md5(gram) in BOTH engines (the q79/q86 house rule — gram text never
  // rides an exchange).
  //
  // Scale shape: positions table is (doc_id, pos, 16-byte gk) — narrow;
  // the shared-gram election is a two-phase count-distinct on gk
  // (map-side partial, no posting lists materialized); the probe is an
  // equi-join back on gk (AQE handles hot-gram skew); the island window
  // sorts only DUPLICATED positions per doc (≪ corpus); and the final
  // doc-keyed left join rides doc_id. No all-pairs anywhere — cost is
  // linear in corpus grams + dup positions, the same shape at 100 TB.
  private val SpanW = 8        // gram width (words)
  private val LongSpan = 20    // flag threshold (words)

  /** q112's core over an explicit (doc_id, words) frame — public for the
    * hand-fixture spec (planted span → exact run arithmetic).
    */
  def dupSpansOfWords(words: DataFrame, spanW: Int = SpanW,
                      longSpan: Int = LongSpan): DataFrame = {
    val base = words.select(col("doc_id"), col("words").as("w"))
    // The positions table feeds BOTH the shared-gram election and the
    // probe join, and the two exchanges never canonicalize equal (the
    // join branch adds isnotnull(gk) the agg branch lacks — the q113
    // failure mode, measured as a double gram-explode of the corpus).
    // localCheckpoint pins the narrow (doc_id, pos, 16-byte gk) table so
    // the expensive posexplode+md5 pass runs exactly once.
    val g = base.filter(size(col("w")) >= spanW)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("w")) - spanW),
        i => md5(to_binary(
          array_join(slice(col("w"), i + 1, lit(spanW)), " "),
          lit("utf-8"))))).as(Seq("pos", "gk")))
      .localCheckpoint()
    val shared = g.groupBy(col("gk"))
      .agg(countDistinct(col("doc_id")).as("ndoc"))
      .filter(col("ndoc") >= 2).select(col("gk"))
    val hits = g.join(shared, Seq("gk")).select(col("doc_id"), col("pos"))
    val wnd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = hits
      .withColumn("isl", col("pos") - row_number().over(wnd))
      .groupBy(col("doc_id"), col("isl")).agg(count(lit(1)).as("runlen"))
    val per = runs.groupBy(col("doc_id"))
      .agg(sum(col("runlen")).as("n_dup_grams"), max(col("runlen")).as("max_run"))
    base.select(col("doc_id"),
        greatest(size(col("w")) - lit(spanW - 1), lit(0)).cast("long")
          .as("n_grams"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("max_run") + lit(spanW - 1), lit(0L)).cast("long")
          .as("max_span_words"),
        when(coalesce(col("max_run") + lit(spanW - 1), lit(0L)) >= longSpan,
          1L).otherwise(0L).as("is_longdup"))
      .orderBy(col("doc_id"))
  }

  private val q112: Q = (s, d) => dupSpansOfWords(GramMemo.words(s, d))

  private val q112Sql = s"""
    WITH nd AS (SELECT doc_id, ${OracleSql.normSql} AS n FROM documents),
    base AS (SELECT doc_id, string_split(n, ' ') AS w FROM nd),
    g AS (SELECT doc_id, i AS pos,
            md5(array_to_string(w[i+1:i+$SpanW], ' ')) AS gk
          FROM base, unnest(generate_series(0, len(w) - $SpanW)) AS t(i)
          WHERE len(w) >= $SpanW),
    shared AS (SELECT gk FROM (SELECT gk, count(DISTINCT doc_id) AS ndoc
                               FROM g GROUP BY gk) WHERE ndoc >= 2),
    hits AS (SELECT g.doc_id, g.pos FROM g JOIN shared USING (gk)),
    isl AS (SELECT doc_id, pos, pos - row_number() OVER
              (PARTITION BY doc_id ORDER BY pos) AS isl FROM hits),
    runs AS (SELECT doc_id, count(*) AS runlen FROM isl GROUP BY doc_id, isl),
    per AS (SELECT doc_id, sum(runlen) AS n_dup_grams, max(runlen) AS max_run
            FROM runs GROUP BY doc_id),
    allg AS (SELECT doc_id, greatest(len(w) - ${SpanW - 1}, 0) AS n_grams
             FROM base)
    SELECT a.doc_id, CAST(a.n_grams AS BIGINT) AS n_grams,
      CAST(coalesce(p.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
      CAST(coalesce(p.max_run + ${SpanW - 1}, 0) AS BIGINT) AS max_span_words,
      CAST(CASE WHEN coalesce(p.max_run + ${SpanW - 1}, 0) >= $LongSpan
           THEN 1 ELSE 0 END AS BIGINT) AS is_longdup
    FROM allg a LEFT JOIN per p USING (doc_id) ORDER BY a.doc_id"""

  // ------------------------------------------------------------------ q113
  // Per-source distribution drift: KL(source ‖ corpus) over the word
  // unigram distributions — the monitoring number a mixture-weighting
  // stack (q88 temperature mix, q64 token budgets) watches to catch a
  // source whose content shifted under it (crawl rot, a scraper change,
  // an injection). KL needs no smoothing here because every source word
  // is by construction in the corpus distribution.
  //
  // Scale shape: the corpus is scanned ONCE — words explode scan-local
  // into a (source, word) count aggregate with map-side combine, so the
  // only full-width exchange carries (source, word, count) rows bounded
  // by vocab × sources, independent of corpus rows. That counts table is
  // the query's artifact: it feeds FOUR derivations (word totals, source
  // totals, grand total, the KL probe), and Spark's exchange reuse does
  // NOT dedupe them (the join branches carry isnotnull filters the
  // agg-only branches lack, so the exchanges never canonicalize equal —
  // measured: 4 parquet scans). localCheckpoint pins the vocab-bounded
  // table instead (the GramMemo rule), so every derivation reads the
  // materialized counts and the corpus text rides exactly one scan.
  // Source totals and the grand total then ride broadcasts.
  /** q113's core over an explicit (source, text) frame — public for the
    * hand-fixture spec (identical distributions → KL exactly 0).
    */
  def sourceKl(docs: DataFrame): DataFrame =
    sourceKlOfWords(docs.select(col("source"),
      split(TextOps.normalize(col("text")), " ").as("words")))

  /** [[sourceKl]] over an ALREADY-materialized (source, words) frame —
    * the r7 words artifact carries source, so the drift monitor costs
    * one explode over the checkpoint, zero normalize passes.
    */
  def sourceKlOfWords(words: DataFrame): DataFrame = {
    val c = words
      .select(col("source"), explode(col("words")).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val wt = c.groupBy(col("word")).agg(sum(col("c")).as("cw"))
    val st = c.groupBy(col("source")).agg(sum(col("c")).as("cs"))
    val tot = st.agg(sum(col("cs")).as("ct"))
    c.join(wt, Seq("word")).join(broadcast(st), Seq("source"))
      .crossJoin(broadcast(tot))
      .groupBy(col("source"))
      .agg(max(col("cs")).cast("long").as("n_tokens"),
        round(sum((col("c") / col("cs")) *
          log((col("c") / col("cs")) / (col("cw") / col("ct")))), 6).as("kl"))
      .orderBy(col("source"))
  }

  private val q113: Q = (s, d) => sourceKlOfWords(GramMemo.words(s, d))

  private val q113Sql = s"""
    WITH nd AS (SELECT source, ${OracleSql.normSql} AS n FROM documents),
    sw AS (SELECT source, unnest(string_split(n, ' ')) AS word FROM nd),
    c AS (SELECT source, word, count(*) AS c FROM sw GROUP BY source, word),
    wt AS (SELECT word, sum(c) AS cw FROM c GROUP BY word),
    st AS (SELECT source, sum(c) AS cs FROM c GROUP BY source),
    tot AS (SELECT sum(cs) AS ct FROM st)
    SELECT c.source, CAST(max(st.cs) AS BIGINT) AS n_tokens,
      round(sum((c.c / st.cs) * ln((c.c / st.cs) / (wt.cw / tot.ct))), 6)
        AS kl
    FROM c JOIN wt USING (word) JOIN st USING (source) CROSS JOIN tot
    GROUP BY c.source ORDER BY c.source"""

  val queries: Map[String, Q] = Map(
    "q112_dup_spans" -> q112,
    "q113_source_kl" -> q113,
  )

  val oracleSql: Map[String, String] = Map(
    "q112_dup_spans" -> q112Sql,
    "q113_source_kl" -> q113Sql,
  )
}
