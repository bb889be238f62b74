package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Batch twenty-two: dedup economics and cross-modality agreement —
  * q149 per-source dedup burden (how much of each source each dedup
  * method would remove: the table that prices a source's crawl against
  * its marginal unique content) and q150 lexical↔semantic agreement
  * (do the embeddings see the near-duplicates the text sees? — per
  * text-similarity band, the embedding-cosine distribution of the
  * nominated pairs; a low-cosine high-Jaccard band means the encoder
  * is blind to duplication the gram space proves).
  */
object Pipeline22 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------ q149
  // Per-source burden off the SHARED per-doc verdict flags (q136's
  // base): one doc-keyed join to the source column, then a
  // |sources|-bounded aggregate. n_any counts docs ANY method flags —
  // the source's gross duplication; the per-method fractions price the
  // cheap methods' coverage per source (a source where SimHash already
  // finds 95% of MinHash's verdicts can skip the MinHash pass in a
  // budgeted pipeline).
  private val q149: Q = (s, d) => {
    Pipeline18.dedupFlags(s, d)
      .join(documents(s, d).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("is_exact")).as("n_exact"),
        sum(col("is_minhash")).as("n_minhash"),
        sum(col("is_simhash")).as("n_simhash"),
        sum(greatest(col("is_exact"), col("is_minhash"),
          col("is_simhash"))).as("n_any"))
      .select(col("source"), col("n_docs"), col("n_exact"),
        col("n_minhash"), col("n_simhash"), col("n_any"),
        round(col("n_any").cast("double") / col("n_docs"), 6)
          .as("dup_frac"))
      .orderBy(col("source"))
  }

  private lazy val q149Sql = s"""
    WITH RECURSIVE ${Pipeline18.dedupFlagsCtes},
    j AS (SELECT fl.*, d.source FROM fl
          JOIN documents d ON d.doc_id = fl.doc_id)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_exact) AS BIGINT) AS n_exact,
           CAST(sum(is_minhash) AS BIGINT) AS n_minhash,
           CAST(sum(is_simhash) AS BIGINT) AS n_simhash,
           CAST(sum(greatest(is_exact, is_minhash, is_simhash))
             AS BIGINT) AS n_any,
           round(CAST(sum(greatest(is_exact, is_minhash, is_simhash))
             AS DOUBLE) / count(*), 6) AS dup_frac
    FROM j GROUP BY source ORDER BY source"""

  // ------------------------------------------------------------------ q150
  // Cross-modality agreement over the LSH-nominated pair set (ALL
  // nominations, including the verify-rejected low-Jaccard ones — the
  // interesting contrast band): per 0.05 exact-Jaccard band, the
  // embedding-cosine mean (exact integer micro-units, the q143
  // rounding rule) and the fraction of pairs the embedding space would
  // also call close (cos ≥ 0.5). Rides the scoredPairs artifact plus
  // two doc-keyed embedding joins — pair-bounded work, zero corpus
  // text derivations.
  private val q150: Q = (s, d) => {
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    ClusterMemo.scoredPairs(s, d)
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("_ea")),
        Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("_eb")),
        Seq("id_b"))
      .select((floor(col("jaccard") * 20) / 20.0).as("bin_lo"),
        round(Similarity.cosine(col("_ea"), col("_eb")), 6).as("cos"))
      .groupBy(col("bin_lo"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(round(col("cos") * 1e6, 0).cast("long")).as("sm"),
        sum(when(col("cos") >= 0.5, 1L).otherwise(0L)).as("hi"))
      .select(col("bin_lo"), col("n_pairs"),
        (expr("(2 * abs(sm) + n_pairs) div (2 * n_pairs)") *
          when(col("sm") < 0, -1L).otherwise(1L) / 1e6)
          .as("mean_cos"),
        round(col("hi").cast("double") / col("n_pairs"), 6)
          .as("frac_sem_close"))
      .orderBy(col("bin_lo"))
  }

  private lazy val q150Sql = s"""
    WITH RECURSIVE ${OracleSql.textClusterCtes(0.0)},
    sj AS (SELECT c.id_a, c.id_b,
             ${OracleSql.jaccard3Sql("ga.gr", "gb.gr")} AS jac
           FROM cand c
             JOIN g ga ON ga.doc_id = c.id_a
             JOIN g gb ON gb.doc_id = c.id_b),
    pc AS (SELECT floor(sj.jac * 20) / 20.0 AS bin_lo,
             ${OracleSql.cosPairSql("a", "b")} AS cos
           FROM sj
             JOIN embeddings a ON a.vec_id = sj.id_a
             JOIN embeddings b ON b.vec_id = sj.id_b),
    t AS (SELECT bin_lo, CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(CAST(round(cos * 1e6, 0) AS BIGINT)) AS BIGINT) AS sm,
            CAST(sum(CASE WHEN cos >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
              AS hi
          FROM pc GROUP BY 1)
    SELECT bin_lo, n_pairs,
           (((2 * abs(sm) + n_pairs) // (2 * n_pairs))
             * (CASE WHEN sm < 0 THEN -1 ELSE 1 END)) / 1e6 AS mean_cos,
           round(CAST(hi AS DOUBLE) / n_pairs, 6) AS frac_sem_close
    FROM t ORDER BY bin_lo"""

  // ------------------------------------------------------------------ q151
  // Near-dup graph degree profile: the degree histogram of the verified
  // J ≥ 0.5 pair graph, degree 0 included (docs no edge touches). A
  // heavy tail here is the boilerplate-hub signature — the exact
  // pattern that makes pair enumeration quasi-quadratic and that the
  // posting-list/bucket caps exist to catch; this is the audit that
  // sees it coming while the caps are still comfortable. Scale shape:
  // edges off the session artifact, degrees by one doc-keyed count,
  // histogram bounded by the max degree; the degree-0 row derives from
  // two scalar counts.
  private val q151: Q = (s, d) => {
    val pairs = ClusterMemo.scoredPairs(s, d)
      .filter(col("jaccard") >= 0.5)
    val deg = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
    val hist = deg.groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
    val nDocs = documents(s, d).select(count(lit(1)).as("n_total"))
    val zero = nDocs.crossJoin(broadcast(
        deg.agg(count(lit(1)).as("n_touched"))))
      .select(lit(0L).as("degree"),
        (col("n_total") - col("n_touched")).as("n_nodes"))
      .filter(col("n_nodes") > 0)
    hist.unionByName(zero)
      .crossJoin(broadcast(nDocs))
      .select(col("degree"), col("n_nodes"),
        round(col("n_nodes").cast("double") / col("n_total"), 6)
          .as("frac_nodes"))
      .orderBy(col("degree"))
  }

  private lazy val q151Sql = s"""
    WITH RECURSIVE ${OracleSql.textClusterCtes(0.5)},
    deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM
              (SELECT id_a AS doc_id FROM edges
               UNION ALL SELECT id_b FROM edges)
            GROUP BY doc_id),
    hist AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
             FROM deg GROUP BY degree),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
    zero AS (SELECT CAST(0 AS BIGINT) AS degree,
               (SELECT n_total FROM tot)
                 - (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes),
    h AS (SELECT * FROM hist
          UNION ALL SELECT * FROM zero WHERE n_nodes > 0)
    SELECT degree, n_nodes,
           round(CAST(n_nodes AS DOUBLE) / (SELECT n_total FROM tot), 6)
             AS frac_nodes
    FROM h ORDER BY degree"""

  // ------------------------------------------------------------------ q152
  // Johnson–Lindenstrauss distortion audit: project the 64-dim
  // embeddings to 16 dims with a ±1 sign matrix (Achlioptas 2003 —
  // database-friendly random projections; signs from the same md5
  // parity rule as the hyperplane sketch, so the matrix is a
  // deterministic constant both engines share) and measure, per
  // cosine-similarity band of the verified near-dup pairs, how well
  // pairwise Euclidean distance survives: ratio = d16/d64 with the
  // 1/√k scaling. The decision this feeds: whether the cheap projected
  // index can stand in for full-width distance at the ANN verify step.
  // Determinism: the sign matrix is folded into generated +/- chains
  // evaluated LEFT-TO-RIGHT identically in both engines (one generator,
  // two dialect index forms), distances use only +,-,*,/ and the
  // IEEE-exact sqrt — no libm transcendentals anywhere. Scale shape:
  // the projection is scan-local arithmetic; everything pairwise rides
  // the bounded EmbMemo pair artifact.
  private val JlK = 16

  private def jlSign(j: Int, i: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j|$i".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) >= 8) 1 else -1
  }

  /** The j-th projected coordinate as a generated sum over element
    * references produced by `ref` (dialect-split indexing; the +/-
    * chain is the SAME string shape in both engines, so association
    * order — and therefore every IEEE intermediate — is identical).
    */
  private def jlProjExpr(j: Int, ref: Int => String): String =
    "(0.0" + (0 until 64).map { i =>
      (if (jlSign(j, i) > 0) " + " else " - ") + ref(i)
    }.mkString + ")"

  private val q152: Q = (s, d) => {
    val sparkRef = (i: Int) =>
      s"CAST(element_at(embedding, ${i + 1}) AS DOUBLE)"
    val proj = embeddings(s, d).select(col("vec_id"),
      col("embedding"),
      array((0 until JlK).map(j => expr(jlProjExpr(j, sparkRef))): _*)
        .as("y"))
    def d2(a: String, b: String) =
      aggregate(zip_with(col(a), col(b),
        (x, yy) => (x.cast("double") - yy.cast("double")) *
          (x.cast("double") - yy.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
    val pairs = EmbMemo.pairs(s, d)
      .join(proj.select(col("vec_id").as("id_a"),
        col("embedding").as("_ea"), col("y").as("_ya")), Seq("id_a"))
      .join(proj.select(col("vec_id").as("id_b"),
        col("embedding").as("_eb"), col("y").as("_yb")), Seq("id_b"))
      .select(col("sim"),
        sqrt(d2("_ea", "_eb")).as("d64"),
        (sqrt(d2("_ya", "_yb")) / math.sqrt(JlK.toDouble)).as("d16"))
      .select((floor(col("sim") * 20) / 20.0).as("bin_lo"),
        when(col("d64") > 0, round(col("d16") / col("d64"), 6))
          .as("ratio"))
    pairs.groupBy(col("bin_lo"))
      .agg(count(lit(1)).as("n_pairs"),
        // identical-embedding pairs (d64 = 0) have NULL ratio: they
        // contribute nothing to sm and must not count in the mean's
        // denominator either, or the readout deflates exactly where
        // duplicates cluster
        count(col("ratio")).as("n_ratio"),
        sum(round(col("ratio") * 1e6, 0).cast("long")).as("sm"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"))
      .select(col("bin_lo"), col("n_pairs"),
        when(col("n_ratio") > 0,
          expr("(2 * abs(sm) + n_ratio) div (2 * n_ratio)") *
            when(col("sm") < 0, -1L).otherwise(1L) / 1e6)
          .as("mean_ratio"),
        col("min_ratio"), col("max_ratio"))
      .orderBy(col("bin_lo"))
  }

  private lazy val q152Sql = {
    def duckRef(a: String) = (i: Int) =>
      s"CAST($a.embedding[${i + 1}] AS DOUBLE)"
    def projList(a: String) = "[" +
      (0 until JlK).map(j => jlProjExpr(j, duckRef(a))).mkString(", ") + "]"
    def d264(a: String, b: String) =
      s"""list_sum(list_transform(generate_series(1, 64),
           i -> (CAST($a.embedding[i] AS DOUBLE)
                 - CAST($b.embedding[i] AS DOUBLE))
              * (CAST($a.embedding[i] AS DOUBLE)
                 - CAST($b.embedding[i] AS DOUBLE))))"""
    s"""
    WITH ${OracleSql.embeddingPairsCtes},
    vp AS (SELECT pr.sim, ${projList("ea")} AS ya, ${projList("eb")} AS yb,
             sqrt(${d264("ea", "eb")}) AS d64
           FROM pairs pr
             JOIN embeddings ea ON ea.vec_id = pr.id_a
             JOIN embeddings eb ON eb.vec_id = pr.id_b
           WHERE pr.sim >= ${graft.queries.EmbMemo.Threshold}),
    pj AS (SELECT sim, d64,
             sqrt(list_sum(list_transform(generate_series(1, $JlK),
               j -> (ya[j] - yb[j]) * (ya[j] - yb[j]))))
               / sqrt(${JlK}.0) AS d16
           FROM vp),
    r AS (SELECT floor(sim * 20) / 20.0 AS bin_lo,
            CASE WHEN d64 > 0 THEN round(d16 / d64, 6) END AS ratio
          FROM pj),
    t AS (SELECT bin_lo, CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(count(ratio) AS BIGINT) AS n_ratio,
            CAST(sum(CAST(round(ratio * 1e6, 0) AS BIGINT)) AS BIGINT)
              AS sm,
            min(ratio) AS min_ratio, max(ratio) AS max_ratio
          FROM r GROUP BY 1)
    SELECT bin_lo, n_pairs,
           CASE WHEN n_ratio > 0 THEN
             (((2 * abs(sm) + n_ratio) // (2 * n_ratio))
               * (CASE WHEN sm < 0 THEN -1 ELSE 1 END)) / 1e6 END
             AS mean_ratio,
           min_ratio, max_ratio
    FROM t ORDER BY bin_lo"""
  }

  // ------------------------------------------------------------------ q153
  // Quality-filter agreement contingency: the heuristic quality score
  // (q38's length/punct features) vs the trigram-LM score (q87's
  // statistical model) as DECILE × DECILE counts — q145's Pearson r
  // sees only the linear component; this table shows WHERE the two
  // filters disagree (a mass in the (high-quality, low-LM) corner is
  // the templated-but-fluent junk one filter alone admits). Deciles
  // come from per-signal value histograms with an exact integer rank
  // formula — d = (10·cum + tot − 1) div tot over the 6-dp value
  // histograms (the q110/q133 bounded-histogram argument: the global
  // windows sort value-space rows, never docs), then ride value-keyed
  // joins back; no ntile, no global doc sort.
  private val q153: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    import graft.text.{TextOps, TrigramLm}
    val qs = FeatureMemo.features(s, d).select(col("doc_id"),
      round(col("quality"), 6).as("qs"))
    val lm = TrigramLm.scoreInRow(
        spread(s, documents(s, d).select(col("doc_id"), col("text"))),
        LmMemo.collectedModel(s, d), "doc_id", "text")
      .select(col("doc_id"), col("lm_score"))
    val base = qs.join(lm, Seq("doc_id"))
      .filter(col("lm_score").isNotNull)
      .localCheckpoint() // two decile maps + the contingency share it
    def decileMap(c: String, out: String): DataFrame = {
      val wc = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      base.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(wc))
        .withColumn("tot", sum(col("cnt")).over(wt))
        .select(col("v").as(c),
          expr("(10 * cum + tot - 1) div tot").as(out))
    }
    base
      .join(decileMap("qs", "q_decile"), Seq("qs"))
      .join(decileMap("lm_score", "lm_decile"), Seq("lm_score"))
      .groupBy(col("q_decile"), col("lm_decile"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("frac", round(col("n_docs").cast("double") /
        sum(col("n_docs")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)), 6))
      .orderBy(col("q_decile"), col("lm_decile"))
  }

  private lazy val q153Sql = s"""
    WITH ${OracleSql.lmScoreCtes},
    raw AS (SELECT doc_id, text, ${OracleSql.qualityScColsSql}
            FROM documents),
    qsx AS (SELECT doc_id, ${OracleSql.qualitySql} AS qs FROM raw),
    base AS (SELECT q.doc_id, q.qs, round(sc.s / sc.n_tri, 6) AS lm_score
             FROM qsx q JOIN sc ON sc.doc_id = q.doc_id
             WHERE sc.n_tri > 0),
    qh AS (SELECT v, (10 * cum + tot - 1) // tot AS q_decile FROM
             (SELECT qs AS v, count(*) AS cnt,
                sum(count(*)) OVER (ORDER BY qs
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                sum(count(*)) OVER () AS tot
              FROM base GROUP BY qs)),
    lh AS (SELECT v, (10 * cum + tot - 1) // tot AS lm_decile FROM
             (SELECT lm_score AS v, count(*) AS cnt,
                sum(count(*)) OVER (ORDER BY lm_score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                sum(count(*)) OVER () AS tot
              FROM base GROUP BY lm_score)),
    ct AS (SELECT qh.q_decile, lh.lm_decile,
             CAST(count(*) AS BIGINT) AS n_docs
           FROM base
             JOIN qh ON qh.v = base.qs
             JOIN lh ON lh.v = base.lm_score
           GROUP BY 1, 2)
    SELECT CAST(q_decile AS BIGINT) AS q_decile,
           CAST(lm_decile AS BIGINT) AS lm_decile, n_docs,
           round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS frac
    FROM ct ORDER BY q_decile, lm_decile"""

  val queries: Map[String, Q] = Map(
    "q149_dedup_burden" -> q149,
    "q150_modality_agreement" -> q150,
    "q151_dup_degree_profile" -> q151,
    "q152_jl_distortion" -> q152,
    "q153_filter_agreement" -> q153)

  val oracleSql: Map[String, String] = Map(
    "q149_dedup_burden" -> q149Sql,
    "q150_modality_agreement" -> q150Sql,
    "q151_dup_degree_profile" -> q151Sql,
    "q152_jl_distortion" -> q152Sql,
    "q153_filter_agreement" -> q153Sql)
}
