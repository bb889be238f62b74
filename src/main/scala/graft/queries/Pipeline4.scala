package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Chunk, Percentiles}
import graft.text.{Pii, TextOps}

/** Training-data curation batch four: PII scrubbing, RAG chunking,
  * TF-IDF term ranking, MinHash similarity estimation, corpus token
  * profiling, and the applied near-dup removal manifest.
  */
object Pipeline4 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------- q58
  // PII scrub — sequential redaction (emails → IPv4 → phone-like runs)
  // with per-stage counts and a fingerprint of the fully redacted text.
  // Scan-local regex passes, no shuffle (see graft.text.Pii); the output
  // fingerprint keeps the redacted body out of the manifest.
  // The synthetic corpus contains no organic PII (every pattern counts 0
  // on raw text — a vacuous oracle), so each doc gets a deterministic
  // id-derived contact footer appended IN BOTH ENGINES: every row then
  // exercises all three match+redact stages for real.
  private val q58: Q = (s, d) => {
    val withPii = documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com or +55 11 9"),
        (col("doc_id") % 10000).cast("string"), lit("-0000 from 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".1")).as("text"))
    Pii.scrub(withPii, "text", "_red")
      .select(col("doc_id"), col("n_emails"), col("n_ipv4"),
        col("n_phones"), col("n_pii"),
        md5(to_binary(col("_red"), lit("utf-8"))).as("redacted_fp"))
      .orderBy(col("doc_id"))
  }

  private val q58Sql = s"""
    WITH p AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or +55 11 9'
                  || (doc_id % 10000) || '-0000 from 10.0.'
                  || (doc_id % 256) || '.1' AS text
      FROM documents),
    s1 AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '${Pii.EmailPat}')) AS BIGINT)
               AS n_emails,
             regexp_replace(text, '${Pii.EmailPat}', '${Pii.EmailToken}', 'g')
               AS t1
      FROM p),
    s2 AS (
      SELECT doc_id, n_emails,
             CAST(len(regexp_extract_all(t1, '${Pii.Ipv4Pat}')) AS BIGINT)
               AS n_ipv4,
             regexp_replace(t1, '${Pii.Ipv4Pat}', '${Pii.Ipv4Token}', 'g')
               AS t2
      FROM s1),
    s3 AS (
      SELECT doc_id, n_emails, n_ipv4,
             CAST(len(regexp_extract_all(t2, '${Pii.PhonePat}')) AS BIGINT)
               AS n_phones,
             regexp_replace(t2, '${Pii.PhonePat}', '${Pii.PhoneToken}', 'g')
               AS t3
      FROM s2)
    SELECT doc_id, n_emails, n_ipv4, n_phones,
           n_emails + n_ipv4 + n_phones AS n_pii,
           md5(t3) AS redacted_fp
    FROM s3 ORDER BY doc_id"""

  // ------------------------------------------------------------------- q59
  // Overlapping chunking (RAG/embedding ingestion): 64-word windows
  // every 48 words, chunk rows fingerprinted. Scan-local explode — the
  // per-row sequence is the only data amplification (see graft.ops.Chunk).
  private val ChunkW = 64
  private val ChunkS = 48

  private val q59: Q = (s, d) =>
    Chunk.chunkWords(documents(s, d).select(col("doc_id"), col("text")),
        "text", ChunkW, ChunkS)
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_words"),
        md5(to_binary(array_join(col("chunk"), " "), lit("utf-8")))
          .as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  private lazy val q59Sql = s"""
    WITH nd AS (
      SELECT doc_id, string_split(${OracleSql.normSql}, ' ') AS w
      FROM documents),
    n AS (SELECT doc_id, w, len(w) AS nw FROM nd),
    c AS (SELECT doc_id, w,
            CASE WHEN nw <= $ChunkW THEN 1
                 ELSE (nw - $ChunkW + ${ChunkS - 1}) // $ChunkS + 1 END
              AS n_chunks
          FROM n),
    x AS (SELECT doc_id, w,
            unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
          FROM c)
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(len(w[chunk_idx * $ChunkS + 1 : chunk_idx * $ChunkS + $ChunkW])
             AS BIGINT) AS n_words,
           md5(array_to_string(
             w[chunk_idx * $ChunkS + 1 : chunk_idx * $ChunkS + $ChunkW], ' '))
             AS chunk_fp
    FROM x ORDER BY doc_id, chunk_idx"""

  // ------------------------------------------------------------------- q60
  // TF-IDF top terms per document. idf is the RATIONAL form N/df (pure
  // IEEE division — no libm log whose last-ulp could differ between
  // engines and flip a rank); ties rank by word for a total order.
  // Plan: token explodes read the memoized session words artifact (zero
  // corpus-text reads — tf and doc-freq branches don't canonicalize to
  // one exchange, so without the memo the corpus text was normalized
  // twice) → (doc,word) counts (map-side combinable) → doc-freq from
  // the tf table itself (second small agg) → shuffle join on word →
  // per-doc top-5 window (partition = one doc's vocab, bounded by doc
  // length — the one place a window funnel is scale-safe).
  private val TfIdfK = 5

  private val q60: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val wordsT = GramMemo.words(s, d)
    val words = wordsT.select(col("doc_id"),
      explode(col("words")).as("word"))
    // (doc, word)-bounded; feeds BOTH the doc-freq agg and the score
    // join, whose exchanges don't canonicalize equal — pin it so the
    // corpus explode+count runs once (the q113 rule)
    val tf = words.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val nDocs = wordsT
      .select(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(desc("tfidf"), col("word"))
    tf.join(dfreq, Seq("word"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") * col("n_docs") / col("df"), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TfIdfK)
      .select(col("doc_id"), col("rnk"), col("word"), col("tf"),
        col("df"), col("tfidf"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  private lazy val q60Sql = s"""
    WITH nd AS (
      SELECT doc_id, string_split(${OracleSql.normSql}, ' ') AS w
      FROM documents),
    words AS (SELECT doc_id, unnest(w) AS word FROM nd),
    tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY 1, 2),
    dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    sc AS (
      SELECT t.doc_id, t.word, t.tf, d.df,
             round(t.tf * n.n_docs / d.df, 6) AS tfidf
      FROM tf t JOIN dfreq d ON t.word = d.word, n),
    r AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        ORDER BY tfidf DESC, word) AS INTEGER) AS rnk
      FROM sc)
    SELECT doc_id, rnk, word, tf, df, tfidf
    FROM r WHERE rnk <= $TfIdfK ORDER BY doc_id, rnk"""

  // ------------------------------------------------------------------- q61
  // MinHash similarity ESTIMATION on LSH candidates — the sketch-side
  // estimate (fraction of agreeing signature components) against the
  // exact n-gram Jaccard, with the absolute error. This is the operator
  // that decides whether a pipeline can skip the exact verify pass: at
  // 100 TB the estimate is free (signatures already exist), the exact
  // join is not.
  // The scored-pair lineage (one MinHash pass riding the band lists, one
  // exact-Jaccard evaluation per pair — plan-gated in PlanShapeSpec on
  // ClusterMemo.scoredPairsPlan) lives in ClusterMemo, shared with
  // q50/q63: in one session the MinHash → LSH → verify work runs once
  // for the whole clustering family.
  private val q61: Q = (s, d) =>
    ClusterMemo.scoredPairs(s, d)
      .withColumn("abs_err",
        round(abs(col("est_jaccard") - col("jaccard")), 6))
      .orderBy(col("id_a"), col("id_b"))

  private lazy val q61Sql = {
    val agree = OracleSql.sigAgreeSql(8)
    s"""
    WITH nd AS (SELECT doc_id, ${OracleSql.normSql} AS n FROM documents),
    sig AS (SELECT doc_id, ${OracleSql.minhashSigSelect(8, 5)} FROM nd),
    bands AS (
      ${OracleSql.minhashBandsSql(4)}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.doc_id < b.doc_id),
    wt AS (SELECT doc_id, string_split(${OracleSql.normSql}, ' ') AS w
           FROM documents),
    g AS (SELECT doc_id, ${OracleSql.grams3Sql} AS gr FROM wt),
    est AS (
      SELECT c.id_a, c.id_b,
             round(($agree) / 8.0, 6) AS est_jaccard,
             ${OracleSql.jaccard3Sql("ga.gr", "gb.gr")} AS jaccard
      FROM cand c
        JOIN sig a ON a.doc_id = c.id_a
        JOIN sig b ON b.doc_id = c.id_b
        JOIN g ga ON ga.doc_id = c.id_a
        JOIN g gb ON gb.doc_id = c.id_b)
    SELECT id_a, id_b, est_jaccard, jaccard,
           round(abs(est_jaccard - jaccard), 6) AS abs_err
    FROM est ORDER BY id_a, id_b"""
  }

  // ------------------------------------------------------------------- q62
  // Corpus token profile per source: exact p50/p90/p99 token-count
  // percentiles WITHOUT buffering a group's rows — histogram cumsum over
  // the bounded distinct-value space (see graft.ops.Percentiles; Spark's
  // built-in `percentile` buffers every row of a group and dies at
  // 100 TB). mean is exact-sum / count.
  private val ProfilePs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)

  private val q62: Q = (s, d) => {
    val toks = FeatureMemo.features(s, d).select(col("source"),
      col("n_tokens_ws").as("n_tokens"))
    val quant = Percentiles.exactByHistogram(toks, "source", "n_tokens",
      ProfilePs)
    val sums = toks.groupBy(col("source")).agg(
      sum(col("n_tokens")).as("total_tokens"),
      round(sum(col("n_tokens")).cast("double") / count(lit(1)), 6)
        .as("mean_tokens"))
    quant.join(sums, Seq("source"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("mean_tokens"), col("p50"), col("p90"), col("p99"))
      .orderBy(col("source"))
  }

  private lazy val q62Sql = {
    val from = s"""SELECT source,
        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(string_split_regex(trim(text), '\\s+'))
             END AS BIGINT) AS v
      FROM documents"""
    s"""
    WITH ${Percentiles.histogramSql(from, "source", ProfilePs)},
    sums AS (
      SELECT source, CAST(sum(v) AS BIGINT) AS total_tokens,
             round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_tokens
      FROM ($from) GROUP BY source)
    SELECT pq.source, pq.n_docs, sums.total_tokens, sums.mean_tokens,
           ${Percentiles.interpSelectSql(ProfilePs)}
    FROM pq JOIN sums ON pq.source = sums.source
    ORDER BY pq.source"""
  }

  // ------------------------------------------------------------------- q63
  // Applied near-dup removal — the manifest a dedup pass actually ships:
  // the kept (representative) documents of q50's clustering with how many
  // near-duplicates each absorbed. Reads q50's clustering through the
  // session-scoped ClusterMemo — a pipeline never recomputes a
  // clustering to ship its manifest; standalone (fresh session) the memo
  // populates itself and the result is identical.
  private val q63: Q = (s, d) =>
    ClusterMemo.clusters(s, d, threshold = 0.5)
      .filter(col("is_rep"))
      .select(col("doc_id"), col("n_members"),
        (col("n_members") - 1).as("n_absorbed"))
      .orderBy(col("doc_id"))

  private lazy val q63Sql = s"""
    WITH RECURSIVE ${OracleSql.textClusterCtes(0.5)}
    SELECT cluster_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(*) AS BIGINT) - 1 AS n_absorbed
    FROM cc GROUP BY cluster_id ORDER BY doc_id"""

  val queries: Map[String, Q] = Map(
    "q58_pii_scrub" -> q58,
    "q59_chunk_overlap" -> q59,
    "q60_tfidf_topk" -> q60,
    "q61_minhash_estimate" -> q61,
    "q62_token_profile" -> q62,
    "q63_neardup_apply" -> q63)

  val oracleSql: Map[String, String] = Map(
    "q58_pii_scrub" -> q58Sql,
    "q59_chunk_overlap" -> q59Sql,
    "q60_tfidf_topk" -> q60Sql,
    "q61_minhash_estimate" -> q61Sql,
    "q62_token_profile" -> q62Sql,
    "q63_neardup_apply" -> q63Sql)
}
