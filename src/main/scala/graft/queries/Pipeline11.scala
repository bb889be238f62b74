package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Training-data curation batch eleven: reconstructive passage dedup
  * (the CCNet remove-the-boilerplate pass), DSIR-style hashed-feature
  * importance weighting against a target slice, and count-min-sketch
  * term frequencies (the bounded-memory vocabulary the 100 TB path
  * substitutes for an exact corpus-wide word count).
  */
object Pipeline11 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------- q95
  // Reconstructive cross-document passage dedup: q79 measures repeated-
  // passage boilerplate; this REMOVES it, keeping each passage only at
  // its globally first (doc_id, position) occurrence and re-joining the
  // survivors per doc. See DedupOps.passageDedupRewrite for the
  // two-narrow-shuffles + one-text-exchange scale shape; fed from the
  // session words artifact (GramMemo) so neither the keying nor the
  // reconstruction branch re-runs the whole-corpus normalize.
  private val PassageLen = 4

  private val q95: Q = (s, d) =>
    graft.dedup.DedupOps.passageDedupRewriteOfWords(
      GramMemo.words(s, d), "doc_id", "words", PassageLen)
      .orderBy(col("doc_id"))

  private lazy val q95Sql = s"""
    WITH nd AS (
      SELECT doc_id, string_split(${OracleSql.normSql}, ' ') AS w
      FROM documents),
    base AS (
      SELECT doc_id, w,
             CAST((len(w) + ${PassageLen - 1}) // $PassageLen AS BIGINT)
               AS n_passages
      FROM nd),
    pp AS (
      SELECT doc_id, p,
             array_to_string(
               w[p*$PassageLen+1:p*$PassageLen+$PassageLen], ' ') AS ptext
      FROM base, unnest(generate_series(0, n_passages - 1)) t(p)),
    keep AS (
      SELECT doc_id, p, ptext,
             row_number() OVER (PARTITION BY md5(ptext)
                                ORDER BY doc_id, p) AS rn
      FROM pp),
    agg AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(ptext, ' ' ORDER BY p) AS clean_text
      FROM keep WHERE rn = 1 GROUP BY doc_id)
    SELECT b.doc_id, b.n_passages,
           coalesce(n_kept, 0) AS n_kept,
           coalesce(clean_text, '') AS clean_text
    FROM base b LEFT JOIN agg USING (doc_id)
    ORDER BY doc_id"""

  // ------------------------------------------------------------------- q96
  // DSIR-style importance weighting (Xie et al. 2023, "Data Selection
  // with Importance Resampling"): score every document by the
  // log-likelihood ratio of a TARGET slice's hashed-unigram bag model
  // over the RAW corpus model. Features are words hashed into a FIXED
  // 4096-bucket space — 3 hex chars of md5, the engine-portable q51
  // idiom — which is the whole scale trick: both models are
  // bucket-bounded aggregates (map-side combinable into <= 4096 keys,
  // constant shuffle at any corpus size) and the whole ratio table
  // compresses to ONE broadcast row (lr map + unseen default), so
  // scoring is a scan-local array fold with NO shuffle — the same
  // expression runs unchanged at the streaming ingestion door
  // (EventStreams.dsirScoreStream, pinned == this query's scores in
  // StreamingSpec). Per-bucket ratios are 6-dp-pinned before the sum
  // (the q92 rule). Target slice: lang = 'en' (the reference-corpus
  // stand-in); selected = more target-like than raw-like.
  private val DsirBuckets = graft.text.Dsir.Buckets
  private val DsirTargetLang = "en"

  private val q96: Q = (s, d) => {
    // both the model estimation and the scoring pass ride the session
    // words artifact (it carries lang since r7) — zero normalize passes
    val words = GramMemo.words(s, d)
    val model = graft.text.Dsir.modelFrameOfWords(words, "words",
      col("lang") === DsirTargetLang)
    graft.text.Dsir.scoreOfWords(words, "doc_id", "words", model)
      .withColumn("selected", col("dsir_score") > 0)
      .orderBy(col("doc_id"))
  }

  private lazy val q96Sql = s"""
    WITH bk AS (
      SELECT doc_id, lang, substr(md5(w), 1, 3) AS b
      FROM (SELECT doc_id, lang,
              unnest(string_split(${OracleSql.normSql}, ' ')) AS w
            FROM documents)),
    raw AS (SELECT b, count(*) AS cr FROM bk GROUP BY b),
    tgt AS (SELECT b, count(*) AS ct FROM bk
            WHERE lang = '$DsirTargetLang' GROUP BY b),
    model AS (SELECT b, cr, coalesce(ct, 0) AS ct
              FROM raw LEFT JOIN tgt USING (b)),
    tot AS (SELECT sum(ct) AS t, sum(cr) AS r FROM model),
    lr AS (SELECT b, round(
             ln((ct + 1.0) / (t + $DsirBuckets)) -
             ln((cr + 1.0) / (r + $DsirBuckets)), 6) AS lr
           FROM model, tot),
    sc AS (SELECT doc_id, count(*) AS n_tokens,
             round(sum(lr), 6) AS dsir_score
           FROM bk JOIN lr USING (b) GROUP BY doc_id)
    SELECT doc_id, n_tokens, dsir_score, dsir_score > 0 AS selected
    FROM sc ORDER BY doc_id"""

  // ------------------------------------------------------------------- q97
  // Count-min-sketch term frequencies vs exact: d = 3 seeded hash rows
  // x w = 4096 buckets (3 hex chars of seeded md5 — deterministic in
  // both engines), counts folded with map-side combine into <= 3*4096
  // keys — a CONSTANT-size shuffle at any corpus size, which is the
  // sketch's claim vs the vocabulary-sized exact aggregate it stands in
  // for at 100 TB. Each of the top-50 exact terms is then estimated as
  // min over its 3 bucket counters (3 broadcast joins of 4096-row
  // tables); overestimate = est - exact >= 0 always (counters only ever
  // over-count) — an invariant the spec pins.
  private val CmsSeeds = graft.text.Cms.Seeds
  private val CmsTopK = 50

  private val q97: Q = (s, d) => {
    val toks = GramMemo.words(s, d)
      .select(explode(col("words")).as("w"))
    // ONE corpus pass builds all 3 hash rows (graft.text.Cms.sketch);
    // the 12k-row result is localCheckpoint'ed so the 3 per-row
    // broadcast probes below read counters, not the corpus again
    val sk = graft.text.Cms.sketch(toks, "w").localCheckpoint()
    val sketches = CmsSeeds.indices.map(j =>
      sk.filter(col("j") === j)
        .select(col("b").as(s"b$j"), col("c").as(s"c$j")))
    val top = toks.groupBy(col("w")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("w"))
      .limit(CmsTopK)
    val withB = CmsSeeds.zipWithIndex.foldLeft(top) { case (df, (seed, j)) =>
      df.withColumn(s"b$j", graft.text.Cms.bucket(seed, col("w")))
    }
    sketches.zipWithIndex.foldLeft(withB) { case (df, (sk, j)) =>
      df.join(broadcast(sk), Seq(s"b$j"))
    }
      .select(col("w").as("token"), col("exact_n"),
        least(col("c0"), col("c1"), col("c2")).as("est_n"))
      .withColumn("overestimate", col("est_n") - col("exact_n"))
      .orderBy(col("exact_n").desc, col("token"))
  }

  private lazy val q97Sql = {
    val buckets = CmsSeeds.zipWithIndex.map { case (seed, j) =>
      s"substr(md5('$seed' || w), 1, 3) AS b$j"
    }.mkString(", ")
    val sketchCtes = CmsSeeds.indices.map(j =>
      s"sk$j AS (SELECT b$j, count(*) AS c$j FROM bk GROUP BY b$j)")
      .mkString(",\n    ")
    val joins = CmsSeeds.indices.map(j => s"JOIN sk$j USING (b$j)")
      .mkString(" ")
    s"""
    WITH toks AS (
      SELECT unnest(string_split(${OracleSql.normSql}, ' ')) AS w
      FROM documents),
    bk AS (SELECT w, $buckets FROM toks),
    $sketchCtes,
    top AS (SELECT w, count(*) AS exact_n FROM toks GROUP BY w
            ORDER BY exact_n DESC, w LIMIT $CmsTopK),
    est AS (SELECT w AS token, exact_n,
              least(c0, c1, c2) AS est_n
            FROM (SELECT w, exact_n, $buckets FROM top)
            $joins)
    SELECT token, exact_n, est_n, est_n - exact_n AS overestimate
    FROM est ORDER BY exact_n DESC, token"""
  }

  // ------------------------------------------------------------------- q98
  // Retention cohort matrix (the product-analytics twin of the curation
  // board's event family): users are cohorted by their FIRST event day,
  // then each (cohort day, weeks-since-cohort) cell counts the distinct
  // users still active. Scale shape: the cohort table is one map-side-
  // combinable min over user_id; activity days dedupe before the join
  // (per-user-day, not per-event, rides the exchange); the join is
  // user-keyed equi; the final cell count is a two-phase distinct over
  // (cohort, offset, user) — all narrow columns, no windows. Cell
  // cardinality is calendar x calendar — bounded regardless of corpus.
  private val q98: Q = (s, d) => {
    val e = eventsMicros(s, d)
      .select(col("user_id"), to_date(col("ts_t")).as("day"))
    val cohort = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    e.distinct()
      .join(cohort, Seq("user_id"))
      .select(col("cohort_day"),
        floor(datediff(col("day"), col("cohort_day")) / 7)
          .cast("int").as("week_offset"),
        col("user_id"))
      .groupBy(col("cohort_day"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("week_offset"))
  }

  private lazy val q98Sql = """
    WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
               FROM events),
    cohort AS (SELECT user_id, min(day) AS cohort_day
               FROM e GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, day FROM e)
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, day) // 7 AS INTEGER)
             AS week_offset,
           count(DISTINCT user_id) AS n_users
    FROM act JOIN cohort USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2"""

  // ------------------------------------------------------------------- q99
  // Ordered conversion funnel: users who viewed, then clicked AFTER the
  // first view, then purchased AFTER that click — the sequential
  // semantics a plain per-type count gets wrong (a purchase BEFORE the
  // first view must not convert). Three user-keyed stages, each a
  // map-side-combinable conditional min joined to the previous stage's
  // (shrinking) user set; stage outputs stay partitioned on user_id so
  // the chain re-uses one exchange layout. No windows, no sorts — at
  // 100 TB a per-user ordered-history window would sort every power
  // user's history; the conditional-min chain never materializes order.
  private val FunnelSteps = Seq("view", "click", "purchase")

  private val q99: Q = (s, d) => {
    val e = eventsMicros(s, d)
      .select(col("user_id"), col("ts_t").as("ts"), col("event_type"))
    val s1 = e.filter(col("event_type") === FunnelSteps(0))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = e.filter(col("event_type") === FunnelSteps(1))
      .join(s1, Seq("user_id")).filter(col("ts") >= col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = e.filter(col("event_type") === FunnelSteps(2))
      .join(s2, Seq("user_id")).filter(col("ts") >= col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val stages = Seq(s1, s2, s3).zip(FunnelSteps).zipWithIndex.map {
      case ((df, step), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("stage"), lit(step).as("step"),
            col("n_users"))
    }
    stages.reduce(_ unionByName _).orderBy(col("stage"))
  }

  private lazy val q99Sql = s"""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
               FROM events),
    s1 AS (SELECT user_id, min(ts) AS t1 FROM e
           WHERE event_type = '${FunnelSteps(0)}' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN s1 USING (user_id)
           WHERE event_type = '${FunnelSteps(1)}' AND ts >= t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN s2 USING (user_id)
           WHERE event_type = '${FunnelSteps(2)}' AND ts >= t2
           GROUP BY e.user_id)
    SELECT CAST(1 AS INTEGER) AS stage, '${FunnelSteps(0)}' AS step,
           (SELECT count(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, '${FunnelSteps(1)}', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, '${FunnelSteps(2)}', (SELECT count(*) FROM s3)
    ORDER BY stage"""

  val queries: Map[String, Q] = Map(
    "q95_passage_rewrite" -> q95,
    "q96_dsir_weights" -> q96,
    "q97_cms_term_counts" -> q97,
    "q98_retention_cohorts" -> q98,
    "q99_event_funnel" -> q99)

  val oracleSql: Map[String, String] = Map(
    "q95_passage_rewrite" -> q95Sql,
    "q96_dsir_weights" -> q96Sql,
    "q97_cms_term_counts" -> q97Sql,
    "q98_retention_cohorts" -> q98Sql,
    "q99_event_funnel" -> q99Sql)
}
