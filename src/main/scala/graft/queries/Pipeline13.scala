package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sim.Similarity
import graft.text.{Retrieval, TextOps}

/** Batch thirteen: hybrid retrieval fusion and distribution-based quality
  * gating — the two selection ops a RAG-grade training-data stack runs on
  * top of the scoring primitives already on the board (BM25 q93, cosine
  * q35, quality q38).
  */
object Pipeline13 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------ q109
  // Reciprocal-rank-fusion hybrid retrieval (Cormack et al., SIGIR 2009):
  // fuse a lexical BM25 ranking and a semantic cosine ranking of the same
  // corpus into one list via rrf = Σ 1/(60 + rank). RRF needs only RANKS,
  // never comparable scores, which is why it is the standard fusion for
  // heterogeneous retrievers. Scale shape: each leg compresses the corpus
  // scan to a bounded k-heap top-50 (TopKByScore — no global sort), so
  // the fusion itself is a full-outer join of two ≤50-row lists: driver-
  // trivial at any corpus size, and the two legs share nothing, so they
  // scan in parallel. The semantic leg broadcasts the single query vector.
  private val FuseTerms = RetrievalMemo.Terms
  private val FuseQueryVec = 0L
  private val FuseK = 50
  private val RrfK = 60
  private val FuseTopN = 20
  private val BmK1 = RetrievalMemo.K1
  private val BmB = RetrievalMemo.B

  /** q109's fusion against EXPLICIT doc/embedding frames — public so
    * AnnRecallSpec can re-run the end metric on int8-requantized
    * embeddings and pin the fused list's stability (retrieval quality
    * is load-bearing for three queries now, not one).
    */
  def rrfFusion(docs: DataFrame, emb: DataFrame): DataFrame =
    rrfFusionW(Retrieval.wordsOf(docs), emb)

  /** [[rrfFusion]] over an already-tokenized (doc_id, words) frame — the
    * query path passes the memoized session words artifact so the
    * lexical leg reads no corpus text at all.
    */
  def rrfFusionW(words: DataFrame, emb: DataFrame): DataFrame =
    rrfFusionS(Retrieval.bm25ScoresW(words, FuseTerms, BmK1, BmB), emb)

  /** [[rrfFusion]] over an already-computed (doc_id, score) BM25 table —
    * the query path passes [[RetrievalMemo.bm25]] so the lexical leg is
    * a k-heap over the pinned score table, zero corpus derivations.
    */
  def rrfFusionS(lexScores: DataFrame, emb: DataFrame): DataFrame = {
    val lex = Retrieval.rankedTopK(lexScores, FuseK)
      .select(col("doc_id"), col("rnk").as("rnk_lex"))
    val qv = emb.filter(col("vec_id") === FuseQueryVec)
      .select(col("embedding").as("q_vec"))
    val sims = emb.crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(Similarity.cosine(col("embedding"), col("q_vec")), 6).as("sim"))
    val sem = Retrieval.rankedTopK(sims, FuseK, scoreCol = "sim")
      .select(col("doc_id"), col("rnk").as("rnk_sem"))
    val fused = lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rnk_lex"), col("rnk_sem"),
        round(coalesce(lit(1.0) / (lit(RrfK) + col("rnk_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("rnk_sem")), lit(0.0)), 6)
          .as("rrf"))
    // global window over ≤ 2*FuseK rows by construction — bounded
    val w = Window.orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= FuseTopN)
      .orderBy(col("rnk"))
  }

  private val q109: Q = (s, d) =>
    rrfFusionS(RetrievalMemo.bm25(s, d), embeddings(s, d))

  /** The q109 fusion CTE chain (scores … final) without the outer
    * SELECT — shared verbatim by q109's output and q129's RBO probe so
    * the two oracles cannot disagree on the fused ranking.
    */
  private lazy val fusionCtes: String = {
    val dot = """list_sum(list_transform(generate_series(1, 64),
           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_vec[i] AS DOUBLE)))"""
    val nA = """sqrt(list_sum(list_transform(e.embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"""
    val nB = """sqrt(list_sum(list_transform(q.q_vec,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"""
    s"""${OracleSql.bm25ScoresSql(FuseTerms, BmK1, BmB)},
    lexr AS (SELECT doc_id, score, row_number() OVER
               (ORDER BY score DESC, doc_id) AS rnk_lex FROM scores),
    lex AS (SELECT doc_id, rnk_lex FROM lexr WHERE rnk_lex <= $FuseK),
    qv AS (SELECT embedding AS q_vec FROM embeddings
           WHERE vec_id = $FuseQueryVec),
    sims AS (SELECT e.vec_id AS doc_id,
               round($dot / ($nA * $nB), 6) AS sim
             FROM embeddings e, qv q),
    semr AS (SELECT doc_id, sim, row_number() OVER
               (ORDER BY sim DESC, doc_id) AS rnk_sem FROM sims),
    sem AS (SELECT doc_id, rnk_sem FROM semr WHERE rnk_sem <= $FuseK),
    fused AS (SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
        l.rnk_lex, s.rnk_sem,
        round(coalesce(CAST(1.0 AS DOUBLE) / ($RrfK + l.rnk_lex), 0.0) +
              coalesce(CAST(1.0 AS DOUBLE) / ($RrfK + s.rnk_sem), 0.0), 6)
          AS rrf
      FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id),
    final AS (SELECT doc_id, rnk_lex, rnk_sem, rrf, row_number() OVER
                (ORDER BY rrf DESC, doc_id) AS rnk FROM fused)"""
  }

  private lazy val q109Sql = s"""
    WITH $fusionCtes
    SELECT doc_id, CAST(rnk_lex AS BIGINT) AS rnk_lex,
           CAST(rnk_sem AS BIGINT) AS rnk_sem, rrf, CAST(rnk AS BIGINT) AS rnk
    FROM final WHERE rnk <= $FuseTopN ORDER BY rnk"""

  // ------------------------------------------------------------------ q110
  // Per-source quantile-threshold quality gate: keep each source's docs
  // whose quality score sits at or above that source's empirical 90th
  // percentile — the distribution-relative counterpart of q55's fixed
  // count quota (a fraction gate adapts to sources whose quality bands
  // differ; a global absolute cutoff would empty low-register sources).
  // The threshold is the type-1 empirical quantile — min score whose
  // cumulative count reaches ceil(0.9·n) — all exact integer arithmetic
  // ((9n+9) div 10), no interpolation, so both engines agree bit-for-bit.
  // Scale shape: the per-(source, score) HISTOGRAM aggregates with
  // map-side combine first, so everything after the scan works on
  // distinct rounded score values per source (bounded by the 6-decimal
  // score space, independent of doc count); the threshold is then a
  // second window over the SAME sorted histogram frame — one corpus
  // scan, one exchange+sort on source, three windows sharing it, no
  // self-join (a join against a separately-derived threshold table
  // would re-scan the corpus). At 100 TB the same shape holds:
  // histogram agg → per-source windows over ≤10^6 distinct values.
  private val q110: Q = (s, d) => {
    val sc = FeatureMemo.features(s, d).select(col("source"),
      round(col("quality"), 6).as("qs"))
    val hist = sc.groupBy(col("source"), col("qs")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("qs"))
    val wTot = Window.partitionBy(col("source"))
    hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wTot))
      .withColumn("thr",
        min(when(col("cum") >= expr("(9 * tot + 9) div 10"), col("qs")))
          .over(wTot))
      .groupBy(col("source"))
      .agg(max(col("thr")).as("thr"),
        max(col("tot")).as("n_total"),
        sum(when(col("qs") >= col("thr"), col("c")).otherwise(lit(0L)))
          .as("n_kept"))
      .orderBy(col("source"))
  }

  private lazy val q110Sql = s"""
    WITH sc AS (SELECT doc_id, source, ${OracleSql.qualityScColsSql}
                FROM documents),
    qd AS (SELECT source, ${OracleSql.qualitySql} AS qs FROM sc),
    hist AS (SELECT source, qs, CAST(count(*) AS BIGINT) AS c
             FROM qd GROUP BY 1, 2),
    cum AS (SELECT source, qs, c,
              sum(c) OVER (PARTITION BY source ORDER BY qs) AS cum,
              sum(c) OVER (PARTITION BY source) AS tot
            FROM hist),
    gated AS (SELECT *, min(CASE WHEN cum >= (9 * tot + 9) // 10
                THEN qs END) OVER (PARTITION BY source) AS thr
              FROM cum)
    SELECT source, max(thr) AS thr,
           CAST(max(tot) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN qs >= thr THEN c ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM gated GROUP BY source ORDER BY source"""

  // ------------------------------------------------------------------ q111
  // RM3-style pseudo-relevance feedback (Lavrenko & Croft relevance
  // models — the public two-stage retrieval classic): BM25-retrieve the
  // top-10 feedback docs for the original query, mine expansion terms by
  // relevance-model mass weight(w) = Σ_d (tf(w,d)/len(d))·score(d) over
  // the feedback docs, then re-score the corpus with the expanded term
  // set. The op exists for VOCABULARY MISMATCH: stage 2 retrieves
  // relevant docs sharing no original query term (Pipeline13Spec pins
  // exactly that). Scale shape: every token derivation (both BM25
  // stages, the feedback-doc mining) reads the memoized session words
  // artifact — the corpus TEXT is read zero times here, and doc lengths
  // come from size(words) with no explode. Stage 1 is the bounded-k-heap
  // BM25; the expansion works entirely on the 10 feedback docs' tokens
  // (the feedback id/score list rides a broadcast into the token scan,
  // and the term-weight window sorts a 10-doc vocabulary — bounded at
  // any corpus size); stage 2 broadcasts the ≤8-term expanded set back
  // into the scan. Two token passes over the in-memory artifact total —
  // the canonical PRF cost.
  private val RmFbDocs = 10
  private val RmFbTerms = 5

  private val q111: Q = (s, d) => {
    import s.implicits._
    val words = GramMemo.words(s, d)
    // 10 rows; materialized so the two feedback derivations (doc
    // lengths, term weights) don't each re-run the stage-1 retrieval
    val top = Retrieval.rankedTopK(RetrievalMemo.bm25(s, d), RmFbDocs)
      .localCheckpoint()
    // restrict to the 10 feedback docs BEFORE exploding: the broadcast
    // join prunes on doc_id scan-local, so only 10 docs' tokens explode
    val fb = words
      .join(broadcast(top.select(col("doc_id"), col("score"))),
        Seq("doc_id"))
      .select(col("doc_id"), col("score"), explode(col("words")).as("w"))
    val fbLen = fb.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dlen"), max(col("score")).as("dscore"))
    val wgt = fb.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("f"))
      .join(broadcast(fbLen), Seq("doc_id"))
      .groupBy(col("w"))
      .agg(round(sum(col("f") / col("dlen") * col("dscore")), 6).as("wt"))
      .filter(!col("w").isin(FuseTerms: _*) && length(col("w")) >= 3)
    // bounded global window: the candidate vocabulary of 10 docs
    val exp = wgt
      .withColumn("r",
        row_number().over(Window.orderBy(col("wt").desc, col("w"))))
      .filter(col("r") <= RmFbTerms).select(col("w"))
    val allTerms = exp.unionByName(FuseTerms.toDF("w"))
    Retrieval.rankedTopK(
        Retrieval.bm25ScoresOfW(words, allTerms, BmK1, BmB), RmFbDocs)
      .orderBy(col("rnk"))
  }

  private lazy val q111Sql = {
    val inList = FuseTerms.map(t => s"'$t'").mkString(", ")
    val values = FuseTerms.map(t => s"('$t')").mkString(", ")
    s"""
    WITH ${OracleSql.bm25ScoresSql(FuseTerms, BmK1, BmB)},
    top10 AS (SELECT doc_id, score FROM
                (SELECT doc_id, score, row_number() OVER
                   (ORDER BY score DESC, doc_id) AS r FROM scores)
              WHERE r <= $RmFbDocs),
    fb AS (SELECT t.doc_id, t.w, s.score FROM toks t
           JOIN top10 s ON t.doc_id = s.doc_id),
    fblen AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dlen,
                     max(score) AS dscore FROM fb GROUP BY doc_id),
    fbtf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS f
             FROM fb GROUP BY doc_id, w),
    wgt AS (SELECT w, round(sum(CAST(f AS DOUBLE) / dlen * dscore), 6)
                     AS wt
            FROM fbtf JOIN fblen USING (doc_id)
            WHERE w NOT IN ($inList) AND length(w) >= 3 GROUP BY w),
    expn AS (SELECT w FROM
               (SELECT w, row_number() OVER (ORDER BY wt DESC, w) AS r
                FROM wgt)
             WHERE r <= $RmFbTerms),
    terms2 AS (SELECT w FROM expn
               UNION ALL SELECT w FROM (VALUES $values) v(w)),
    qt2 AS (SELECT t.doc_id, t.w FROM toks t JOIN terms2 e ON t.w = e.w),
    dfs2 AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             FROM qt2 GROUP BY w),
    tf2 AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS f
            FROM qt2 GROUP BY doc_id, w),
    term2 AS (SELECT tf2.doc_id,
        ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
          (f * ($BmK1 + 1.0)) /
          (f + $BmK1 * (1.0 - $BmB + $BmB * dl.dl / avgdl)) AS ts
      FROM tf2 JOIN dl ON tf2.doc_id = dl.doc_id
        JOIN dfs2 ON tf2.w = dfs2.w
        CROSS JOIN consts),
    scores2 AS (SELECT doc_id, round(sum(ts), 6) AS score
                FROM term2 GROUP BY doc_id)
    SELECT doc_id, score, CAST(r AS BIGINT) AS rnk FROM
      (SELECT doc_id, score, row_number() OVER
         (ORDER BY score DESC, doc_id) AS r FROM scores2)
    WHERE r <= $RmFbDocs ORDER BY rnk"""
  }

  // ------------------------------------------------------------------ q129
  // Rank-biased overlap (Webber, Moffat & Zobel 2010) between the two
  // retrieval modalities q109 fuses — the truncated-RBO curve
  // RBO@i = (1−p) Σ_{j≤i} p^{j−1}·|A_j ∩ B_j|/j, p = 0.9, between the
  // lexical BM25 top-10 and the FUSED top-10 for the same query — how
  // much of the lexical ordering fusion preserved. This is the eval
  // number a retrieval stack watches when tuning fusion (RBO ≈ 1 → the
  // fused list is just the lexical list, the semantic leg added
  // nothing; low RBO → the semantic evidence reshaped the ranking).
  // Identity used: |A_i ∩ B_i| = #{docs: max(rank_A, rank_B) ≤ i}, so
  // one inner join + one ≤k-row cumulative window replaces per-depth
  // set intersections.
  //
  // Scale shape: both legs are the q109 bounded k-heap scans; everything
  // after them touches ≤ k rows (the two global windows are over ≤ 10
  // rows by construction). Same shape at any corpus size.
  private val RboK = 10
  private val RboP = 0.9

  private val q129: Q = (s, d) => {
    val lex = Retrieval.rankedTopK(RetrievalMemo.bm25(s, d), RboK)
      .select(col("doc_id"), col("rnk").as("ra"))
    val fused = rrfFusionS(RetrievalMemo.bm25(s, d), embeddings(s, d))
      .filter(col("rnk") <= RboK)
      .select(col("doc_id"), col("rnk").as("rb"))
    val cnt = lex.join(fused, Seq("doc_id"))
      .select(greatest(col("ra"), col("rb")).as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("depth"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.range(1, RboK + 1).select(col("id").as("depth"))
      .join(cnt.select(col("m").as("depth"), col("c")), Seq("depth"), "left")
      .withColumn("n_overlap", sum(coalesce(col("c"), lit(0L))).over(w))
      .withColumn("_contrib", lit(1 - RboP) *
        pow(lit(RboP), col("depth") - 1) * col("n_overlap") / col("depth"))
      .withColumn("rbo_at_depth", round(sum(col("_contrib")).over(w), 6))
      .select(col("depth"), col("n_overlap"),
        round(col("_contrib"), 6).as("contrib"), col("rbo_at_depth"))
      .orderBy(col("depth"))
  }

  private lazy val q129Sql = s"""
    WITH $fusionCtes,
    la AS (SELECT doc_id, rnk_lex AS ra FROM lex WHERE rnk_lex <= $RboK),
    fb AS (SELECT doc_id, rnk AS rb FROM final WHERE rnk <= $RboK),
    mt AS (SELECT greatest(la.ra, fb.rb) AS m
           FROM la JOIN fb USING (doc_id)),
    cnt AS (SELECT m, count(*) AS c FROM mt GROUP BY m),
    dep AS (SELECT unnest(generate_series(1, $RboK)) AS depth),
    cum AS (SELECT dep.depth,
              sum(coalesce(cnt.c, 0)) OVER
                (ORDER BY dep.depth ROWS UNBOUNDED PRECEDING) AS n_overlap
            FROM dep LEFT JOIN cnt ON cnt.m = dep.depth),
    fin AS (SELECT depth, n_overlap,
              ${1 - RboP} * pow($RboP, depth - 1) * n_overlap / depth
                AS contrib
            FROM cum)
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(n_overlap AS BIGINT) AS n_overlap,
           round(contrib, 6) AS contrib,
           round(sum(contrib) OVER
             (ORDER BY depth ROWS UNBOUNDED PRECEDING), 6) AS rbo_at_depth
    FROM fin ORDER BY depth"""

  val queries: Map[String, Q] = Map(
    "q129_rbo_rankings" -> q129,
    "q109_rrf_fusion" -> q109,
    "q110_quality_gate" -> q110,
    "q111_rm3_expansion" -> q111)

  val oracleSql: Map[String, String] = Map(
    "q109_rrf_fusion" -> q109Sql,
    "q110_quality_gate" -> q110Sql,
    "q111_rm3_expansion" -> q111Sql,
    "q129_rbo_rankings" -> q129Sql)
}
