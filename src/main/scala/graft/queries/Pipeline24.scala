package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

import graft.dedup.{Bloom, NGramArray}
import graft.sim.Similarity
import graft.text.{TextOps, TrigramLm}

/** Training-data curation batch twenty-four — measurement-rigor
  * operators: the Bloom filter's measured-vs-theory false-positive
  * audit (q159: the number that says whether q67's prescan is SIZED
  * right for the eval suite, the way q142/q148 audit the LSH bands),
  * per-label embedding silhouette (q160: cluster cohesion/separation —
  * q68 flags outliers, this scores the LABELING itself), winsorized
  * event-value means (q161: the robust twin of the plain mean — one
  * fat-fingered value moves a mean arbitrarily; clipping at exact
  * p01/p99 bounds the influence and REPORTS what it clipped), Cohen's
  * kappa between the heuristic quality filter and the trigram-LM
  * filter (q162: q153 shows WHERE they disagree, kappa says whether
  * their agreement beats chance at all — the go/no-go for substituting
  * the cheap filter), and per-term chi-square vocabulary drift between
  * corpus halves (q163: q113 scores source-level drift as one KL
  * number; this attributes drift to the TERMS driving it).
  *
  * House rules throughout: every ratio that feeds a comparison is
  * exact integer micro-units with the abs-and-sign half-away rounding
  * (the q143 pattern — means of signed values keep the contract);
  * quantiles are type-1 picks from value-space histograms (the
  * q110/q153 bounded-histogram rule: windows sort value rows, never
  * docs/events); chi-square rides DECIMAL(38)/HUGEINT integer
  * arithmetic so both engines agree to the last microunit.
  */
object Pipeline24 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  /** Exact half-away-from-zero integer mean of a micro-unit sum column
    * over a count column — the sign-safe q143 form.
    */
  private def microMean(sumCol: String, nCol: String): Column =
    expr(s"(CASE WHEN $sumCol < 0 THEN -1 ELSE 1 END) * " +
      s"((2 * abs($sumCol) + $nCol) div (2 * $nCol))")

  private def microMeanDuck(sumExpr: String, nExpr: String): String =
    s"((CASE WHEN $sumExpr < 0 THEN -1 ELSE 1 END) * " +
      s"((2 * abs($sumExpr) + $nExpr) // (2 * $nExpr)))"

  // ------------------------------------------------------------------ q159
  // Bloom false-positive audit: q67 ships the 200003-bit filter and
  // accounts per-doc false positives, but never answers the OPERATOR's
  // question — is the measured corpus-level FPR consistent with the
  // fill ratio, and is the filter sized for this eval suite? One row:
  // eval-set size, bits set, the distinct-corpus-gram probe counts,
  // measured FPR over TRUE NEGATIVES, the fill ratio, and the
  // theoretical FPP fill^K computed in exact integer micro-units
  // (nb^K·10^6 / M^K under DECIMAL(38)/HUGEINT, the exponent derived
  // from Bloom.K — no libm pow in either engine). Read like q142/q148:
  // measured >> theory means correlated
  // positions (hash pathology); fill near 1 means resize M before the
  // second-pass verify drowns (the Bloom.scala sizing note, now with
  // its evidence row). Scale shape: ONE gram explode into ONE
  // gram-keyed membership aggregate (eval/corpus flags ride the same
  // row — r12, guide §2.4) and a scan-local bitset probe — the filter
  // build is the same ~25 KiB bounded structure q67 ships.
  private val FprN = 8
  private val FprEvalMod = 10

  private val q159: Q = (s, d) => {
    val docs = spread(s, documents(s, d)
        .select(col("doc_id"), col("text")))
      // spread RAW rows first (the GramMemo.words rule): the ~600x
      // gram explode inherits the scan's partitioning, and the
      // single-row-group driver file scans as ONE task
      .select(col("doc_id"),
        column(NGramArray(expression(col("text")), FprN)).as("_g"))
    // r12 fuse (guide §2.4, VERDICT r11 item 5): the r11 shape ran TWO
    // distinct-gram aggregates (eval slice, corpus slice) — two
    // explode passes, two exchanges — and then BROADCAST the whole
    // eval gram set for the exact-hit join (gigabytes at 100 TB scale,
    // over the 8 GB broadcast cap long before that). Membership on
    // both sides factors through ONE gram-keyed aggregate: explode
    // once, groupBy(gram) once, carrying per-gram eval/corpus
    // membership flags. The exact-hit join disappears (the flag IS the
    // hit), and the eval-side reads (bitset collect, eval count, bit
    // positions) ride the pinned flag table. Pinned serialized (the
    // ArtifactStore storage-level rationale): the pin is now
    // corpus-gram-sized, not eval-sized.
    val flags = docs
      .select((col("doc_id") % FprEvalMod === 0).as("_e"),
        explode(col("_g")).as("gram"))
      .groupBy(col("gram"))
      .agg(max(col("_e")).as("_in_eval"), max(!col("_e")).as("_in_corpus"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val evalG = flags.filter(col("_in_eval")).select(col("gram"))
    val probed = Bloom.probeBitset(flags.filter(col("_in_corpus")), "gram",
      evalG)
    val stats = probed.agg(
      count(lit(1)).as("n_corpus_grams"),
      sum(when(!col("_in_eval"), 1L).otherwise(0L)).as("n_neg"),
      sum(when(!col("_in_eval") && col("_bloom"), 1L).otherwise(0L))
        .as("n_false_pos"))
    val evalStats = evalG.agg(count(lit(1)).as("n_eval_grams"))
    val bitStats = evalG
      .select(explode(Bloom.positionsArray(col("gram"))).as("pos"))
      .agg(countDistinct(col("pos")).as("n_bits_set"))
    // theory = fill^K, built from Bloom.K (not a literal exponent) so
    // the audit tracks the filter's actual hash count — a K bump that
    // left a hardcoded cube here would make the measured-vs-theory
    // comparison silently wrong, the exact drift this query exists to
    // catch. Capacity: the micro-exact chain peaks at 2e6 * nb^K with
    // nb < M, so K <= 5 keeps it inside DECIMAL(38)/HUGEINT (M=2e5:
    // 2e6 * (2e5)^5 ~ 6.4e32); fail loudly before a silent wrap.
    require(BigInt(2000000) * BigInt(Bloom.M).pow(Bloom.K) <
      BigInt(10).pow(38),
      s"q159 theory_fpp: 2e6 * M^K overflows DECIMAL(38) at K=${Bloom.K}")
    // M^K is emitted as a DECIMAL(38,0) literal, not a Long suffix:
    // M=2e5 puts M^4 (~1.6e21) past Long.MaxValue, so `${mK}L` would
    // fail Spark's parser at K=4 with an out-of-range error while the
    // capacity require above still claims K <= 5 is safe — the DECIMAL
    // cast makes the Spark side's real ceiling the require's ceiling
    val mK = BigInt(Bloom.M).pow(Bloom.K)
    val mKLit = s"CAST('$mK' AS DECIMAL(38,0))"
    val nbPow = ("CAST(n_bits_set AS DECIMAL(38,0))" +:
      Seq.fill(Bloom.K - 1)("n_bits_set")).mkString(" * ")
    stats.crossJoin(broadcast(evalStats)).crossJoin(broadcast(bitStats))
      .select(col("n_eval_grams"), col("n_bits_set"),
        col("n_corpus_grams"), col("n_neg"), col("n_false_pos"),
        round(col("n_false_pos").cast("double") / col("n_neg"), 6)
          .as("fpr"),
        round(col("n_bits_set").cast("double") / Bloom.M, 6).as("fill"),
        (expr(s"(2 * $nbPow * 1000000 + $mKLit) div (2 * $mKLit)") / 1e6)
          .as("theory_fpp"))
  }

  private lazy val q159Sql = {
    import graft.dedup.Bloom.{positionSql, positionsArraySql, K, M}
    val mK = BigInt(M).pow(K)
    // fill^K from Bloom.K, mirroring the engine-side derivation
    val nbPow = ("CAST(n_bits_set AS HUGEINT)" +:
      Seq.fill(K - 1)("n_bits_set")).mkString(" * ")
    s"""
    WITH nd AS (SELECT doc_id, string_split(${OracleSql.normSql}, ' ') AS w
                FROM documents),
    g AS (SELECT doc_id, ${OracleSql.gramsSql(FprN)} AS gr FROM nd),
    ev AS (SELECT DISTINCT unnest(gr) AS gram FROM g
           WHERE doc_id % $FprEvalMod = 0),
    bits AS (SELECT DISTINCT unnest(${positionsArraySql("gram")}) AS pos
             FROM ev),
    cg AS (SELECT DISTINCT unnest(gr) AS gram FROM g
           WHERE doc_id % $FprEvalMod <> 0),
    pr AS (SELECT gram,
             ${(0 until K).map(j => s"${positionSql("gram", j)} AS p$j")
               .mkString(", ")}
           FROM cg),
    pj AS (SELECT pr.gram,
             (${(0 until K).map(j => s"b$j.pos IS NOT NULL")
               .mkString(" AND ")}) AS bloom,
             ev.gram IS NOT NULL AS hit
           FROM pr
             ${(0 until K).map(j => s"LEFT JOIN bits b$j ON pr.p$j = b$j.pos")
               .mkString("\n             ")}
             LEFT JOIN ev ON pr.gram = ev.gram),
    st AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus_grams,
             CAST(sum(CASE WHEN NOT hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_neg,
             CAST(sum(CASE WHEN NOT hit AND bloom THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_pos
           FROM pj),
    es AS (SELECT CAST(count(*) AS BIGINT) AS n_eval_grams FROM ev),
    bs AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM bits)
    SELECT n_eval_grams, n_bits_set, n_corpus_grams, n_neg, n_false_pos,
           round(CAST(n_false_pos AS DOUBLE) / n_neg, 6) AS fpr,
           round(CAST(n_bits_set AS DOUBLE) / $M, 6) AS fill,
           CAST((2 * $nbPow
                   * 1000000 + $mK) // (2 * $mK) AS BIGINT) / 1e6
             AS theory_fpp
    FROM st, es, bs"""
  }

  // ------------------------------------------------------------------ q160
  // Per-label silhouette (centroid form): for each embedding, cohesion
  // a = cosine distance to its OWN label centroid and separation
  // b = distance to the NEAREST other centroid; s = (b - a)/max(a, b).
  // Per label: the mean silhouette (micro-exact, sign-safe — s is in
  // [-1, 1]) and the fraction of negative-silhouette members (vectors
  // closer to another label's centroid than their own — candidate
  // relabels; q68's outlier flag can't see these because it never
  // compares ACROSS centroids). Scale shape: |labels| centroids from
  // one bounded groups×dim aggregate, broadcast against the corpus;
  // the per-vector reduction is a map-side-combined (vec, label)
  // aggregate; output is |labels| rows.
  private val q160: Q = (s, d) => {
    val emb = embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    val cent = Similarity.groupCentroids(emb, "label")
      .withColumnRenamed("label", "clabel")
    val per = emb.crossJoin(broadcast(cent))
      .withColumn("sim",
        round(Similarity.cosine(col("embedding"), col("centroid")), 6))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(when(col("clabel") === col("label"), col("sim")))
          .as("sim_own"),
        max(when(col("clabel") =!= col("label"), col("sim")))
          .as("sim_other"))
      .withColumn("ad", round(lit(1.0) - col("sim_own"), 6))
      .withColumn("bd", round(lit(1.0) - col("sim_other"), 6))
      .withColumn("sm", round(
        when(greatest(col("ad"), col("bd")) > 0,
          round((col("bd") - col("ad")) /
            greatest(col("ad"), col("bd")), 6))
          .otherwise(lit(0.0)) * 1e6, 0).cast("long"))
    per.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("sm")).as("ssum"),
        sum(when(col("sm") < 0, 1L).otherwise(0L)).as("n_neg"))
      .select(col("label"), col("n_vecs"),
        (microMean("ssum", "n_vecs") / 1e6).as("mean_silhouette"),
        round(col("n_neg").cast("double") / col("n_vecs"), 6)
          .as("neg_frac"))
      .orderBy(col("label"))
  }

  private lazy val q160Sql = s"""
    WITH ${OracleSql.centroidCtes},
    sims AS (SELECT e.vec_id, e.label, c.label AS clabel,
               ${OracleSql.cos64Sql("e.embedding", "c.centroid")} AS sim
             FROM e, c),
    pv AS (SELECT vec_id, label,
             max(CASE WHEN clabel = label THEN sim END) AS sim_own,
             max(CASE WHEN clabel <> label THEN sim END) AS sim_other
           FROM sims GROUP BY 1, 2),
    sl AS (SELECT vec_id, label,
             round(1.0 - sim_own, 6) AS ad,
             round(1.0 - sim_other, 6) AS bd
           FROM pv),
    sm AS (SELECT vec_id, label,
             CAST(round((CASE WHEN greatest(ad, bd) > 0
               THEN round((bd - ad) / greatest(ad, bd), 6)
               ELSE 0.0 END) * 1e6, 0) AS BIGINT) AS sm
           FROM sl)
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           ${microMeanDuck("sum(sm)", "count(*)")} / 1e6
             AS mean_silhouette,
           round(CAST(sum(CASE WHEN sm < 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS neg_frac
    FROM sm GROUP BY label ORDER BY label"""

  // ------------------------------------------------------------------ q161
  // Winsorized event-value means: per event type, the exact type-1
  // p01/p99 value bounds (value-space histogram + cumulative window —
  // the q153 rank rule, partitioned by type), values clamped into
  // [p01, p99], and both the raw and winsorized means in sign-safe
  // exact micro integers, with the clip counts that say how much mass
  // the robust mean discounts. The monitoring counterpart of q131's
  // quantiles and q158's CI: a mean a single corrupt value cannot
  // move. Scale shape: the histogram is value-space-bounded per type;
  // the clamp rides a |types|-row broadcast back over one event scan.
  private val q161: Q = (s, d) => {
    val base = eventsMicros(s, d).select(col("event_type"),
      round(col("value") * 1e6, 0).cast("long").as("vm"))
    val wc = Window.partitionBy(col("event_type")).orderBy(col("vm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col("event_type"))
    val bounds = base.groupBy(col("event_type"), col("vm"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("tot", sum(col("cnt")).over(wt))
      .groupBy(col("event_type"))
      .agg(min(when(col("cum") >= expr("(tot + 99) div 100"), col("vm")))
          .as("lo_v"),
        min(when(col("cum") >= expr("(tot * 99 + 99) div 100"), col("vm")))
          .as("hi_v"))
    base.join(broadcast(bounds), Seq("event_type"))
      .withColumn("cv", least(greatest(col("vm"), col("lo_v")), col("hi_v")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max(col("lo_v")).as("lo_micro"), max(col("hi_v")).as("hi_micro"),
        sum(when(col("vm") < col("lo_v"), 1L).otherwise(0L))
          .as("n_clipped_lo"),
        sum(when(col("vm") > col("hi_v"), 1L).otherwise(0L))
          .as("n_clipped_hi"),
        sum(col("vm")).as("rs"), sum(col("cv")).as("ws"))
      .select(col("event_type"), col("n_events"),
        (col("lo_micro") / 1e6).as("p01"),
        (col("hi_micro") / 1e6).as("p99"),
        col("n_clipped_lo"), col("n_clipped_hi"),
        (microMean("rs", "n_events") / 1e6).as("mean_raw"),
        (microMean("ws", "n_events") / 1e6).as("mean_winsorized"))
      .orderBy(col("event_type"))
  }

  private lazy val q161Sql = s"""
    WITH base AS (SELECT event_type,
                    CAST(round(value * 1e6, 0) AS BIGINT) AS vm
                  FROM events),
    h AS (SELECT event_type, vm, count(*) AS cnt,
            sum(count(*)) OVER (PARTITION BY event_type ORDER BY vm
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(count(*)) OVER (PARTITION BY event_type) AS tot
          FROM base GROUP BY 1, 2),
    b AS (SELECT event_type,
            min(CASE WHEN cum >= (tot + 99) // 100 THEN vm END) AS lo_v,
            min(CASE WHEN cum >= (tot * 99 + 99) // 100 THEN vm END)
              AS hi_v
          FROM h GROUP BY 1),
    j AS (SELECT base.event_type, vm, lo_v, hi_v,
            least(greatest(vm, lo_v), hi_v) AS cv
          FROM base JOIN b USING (event_type))
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           max(lo_v) / 1e6 AS p01, max(hi_v) / 1e6 AS p99,
           CAST(sum(CASE WHEN vm < lo_v THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_lo,
           CAST(sum(CASE WHEN vm > hi_v THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_hi,
           ${microMeanDuck("sum(vm)", "count(*)")} / 1e6 AS mean_raw,
           ${microMeanDuck("sum(cv)", "count(*)")} / 1e6
             AS mean_winsorized
    FROM j GROUP BY event_type ORDER BY event_type"""

  // ------------------------------------------------------------------ q162
  // Quality-filter chance-corrected agreement (Cohen's kappa): both
  // filters binarized at their own exact type-1 median (value-space
  // histogram rank — no doc sort), the 2×2 contingency, and
  // po/pe/kappa in EXACT integer micro-units (kappa's numerator can be
  // negative — worse-than-chance agreement — so the sign-safe div form
  // is load-bearing, not defensive). q153's decile table shows where
  // the filters disagree; this one number says whether their agreement
  // beats chance (kappa ≈ 0 means the cheap filter is NOT a substitute
  // no matter how the thresholds are tuned). Scale: two value-space
  // histograms + one single-row aggregate.
  private val q162: Q = (s, d) => {
    val qs = FeatureMemo.features(s, d).select(col("doc_id"),
      round(col("quality"), 6).as("qs"))
    val lm = TrigramLm.scoreInRow(
        spread(s, documents(s, d).select(col("doc_id"), col("text"))),
        LmMemo.collectedModel(s, d), "doc_id", "text")
      .select(col("doc_id"), col("lm_score"))
    val base = qs.join(lm, Seq("doc_id"))
      .filter(col("lm_score").isNotNull)
      .localCheckpoint() // two median maps + the contingency share it
    def median(c: String): DataFrame = {
      val wc = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      base.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(wc))
        .withColumn("tot", sum(col("cnt")).over(wt))
        .agg(min(when(col("cum") >= expr("(tot * 50 + 99) div 100"),
          col("v"))).as(c + "_med"))
    }
    base.crossJoin(broadcast(median("qs")))
      .crossJoin(broadcast(median("lm_score")))
      .select((col("qs") >= col("qs_med")).cast("long").as("qp"),
        (col("lm_score") >= col("lm_score_med")).cast("long").as("lp"))
      .agg(count(lit(1)).as("n"),
        sum(expr("qp * lp")).as("n_both"),
        sum(expr("qp * (1 - lp)")).as("n_q_only"),
        sum(expr("(1 - qp) * lp")).as("n_lm_only"),
        sum(expr("(1 - qp) * (1 - lp)")).as("n_neither"))
      // pe/kappa chains carry ~n²·10^6 — plain BIGINT wraps silently in
      // Spark above ~3M docs (and DuckDB would raise, so the engines
      // would also diverge); the whole chain rides DECIMAL(38)/HUGEINT
      // like sibling q163, per the batch's header rule
      .withColumn("pp",
        expr("CAST(n_both + n_q_only AS DECIMAL(38,0)) * (n_both + n_lm_only)" +
          " + CAST(n_lm_only + n_neither AS DECIMAL(38,0)) * (n_q_only + n_neither)"))
      .select(col("n"), col("n_both"), col("n_q_only"),
        col("n_lm_only"), col("n_neither"),
        (expr("CAST((2 * CAST(n_both + n_neither AS DECIMAL(38,0)) * 1000000 + n)" +
          " div (2 * n) AS BIGINT)") / 1e6).as("po"),
        (expr("CAST((2 * pp * 1000000 + CAST(n AS DECIMAL(38,0)) * n)" +
          " div (2 * CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)") / 1e6)
          .as("pe"),
        (expr("CASE WHEN CAST(n AS DECIMAL(38,0)) * n - pp > 0 THEN " +
          "(CASE WHEN CAST(n AS DECIMAL(38,0)) * (n_both + n_neither) - pp < 0 THEN -1 ELSE 1 END)" +
          " * CAST((2 * abs(CAST(n AS DECIMAL(38,0)) * (n_both + n_neither) - pp) * 1000000" +
          " + (CAST(n AS DECIMAL(38,0)) * n - pp))" +
          " div (2 * (CAST(n AS DECIMAL(38,0)) * n - pp)) AS BIGINT) END") / 1e6)
          .as("kappa"))
  }

  private lazy val q162Sql = s"""
    WITH ${OracleSql.lmScoreCtes},
    raw AS (SELECT doc_id, text, ${OracleSql.qualityScColsSql}
            FROM documents),
    qsx AS (SELECT doc_id, ${OracleSql.qualitySql} AS qs FROM raw),
    base AS (SELECT q.doc_id, q.qs, round(sc.s / sc.n_tri, 6) AS lm_score
             FROM qsx q JOIN sc ON sc.doc_id = q.doc_id
             WHERE sc.n_tri > 0),
    qm AS (SELECT min(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN v END)
             AS qs_med FROM
             (SELECT qs AS v,
                sum(count(*)) OVER (ORDER BY qs
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                sum(count(*)) OVER () AS tot
              FROM base GROUP BY qs)),
    lmm AS (SELECT min(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN v END)
              AS lm_med FROM
              (SELECT lm_score AS v,
                 sum(count(*)) OVER (ORDER BY lm_score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 sum(count(*)) OVER () AS tot
               FROM base GROUP BY lm_score)),
    fl AS (SELECT CASE WHEN qs >= qs_med THEN 1 ELSE 0 END AS qp,
             CASE WHEN lm_score >= lm_med THEN 1 ELSE 0 END AS lp
           FROM base, qm, lmm),
    ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(qp * lp) AS BIGINT) AS n_both,
             CAST(sum(qp * (1 - lp)) AS BIGINT) AS n_q_only,
             CAST(sum((1 - qp) * lp) AS BIGINT) AS n_lm_only,
             CAST(sum((1 - qp) * (1 - lp)) AS BIGINT) AS n_neither
           FROM fl),
    px AS (SELECT *, CAST(n_both + n_q_only AS HUGEINT) * (n_both + n_lm_only)
             + CAST(n_lm_only + n_neither AS HUGEINT) * (n_q_only + n_neither) AS pp
           FROM ag)
    SELECT n, n_both, n_q_only, n_lm_only, n_neither,
           CAST((2 * CAST(n_both + n_neither AS HUGEINT) * 1000000 + n)
               // (2 * n) AS BIGINT) / 1e6
             AS po,
           CAST((2 * pp * 1000000 + CAST(n AS HUGEINT) * n)
               // (2 * CAST(n AS HUGEINT) * n) AS BIGINT) / 1e6 AS pe,
           (CASE WHEN CAST(n AS HUGEINT) * n - pp > 0 THEN
              (CASE WHEN CAST(n AS HUGEINT) * (n_both + n_neither) - pp < 0
                THEN -1 ELSE 1 END)
              * CAST((2 * abs(CAST(n AS HUGEINT) * (n_both + n_neither) - pp) * 1000000
                  + (CAST(n AS HUGEINT) * n - pp))
                // (2 * (CAST(n AS HUGEINT) * n - pp)) AS BIGINT) END) / 1e6
             AS kappa
    FROM px"""

  // ------------------------------------------------------------------ q163
  // Per-term chi-square vocabulary drift between corpus halves (even
  // vs odd doc ids — the deterministic stand-in for two ingestion
  // snapshots): for the top-|DriftTop| terms by total token count, the
  // 2×2 chi-square of (term occurrence × half) in exact integer
  // micro-units — N(ad−bc)²·10^6 over the four margins, DECIMAL(38)/
  // HUGEINT so the huge-integer numerators agree to the last unit.
  // The exactness has a REAL capacity ceiling, stated honestly (advice
  // r9): the numerator 2e6·N·(ad−bc)² and the denominator
  // 2·n0·n1·(c0+c1)·(N−c0−c1) must fit 38 digits. With balanced
  // halves and a top term holding ~5% of N tokens that binds around
  // N ≈ 10^7 tokens — far below a 100 TB corpus (~10^13). Rather than
  // let Spark null a DECIMAL overflow while DuckDB raises (silent
  // engine divergence in the worst place), BOTH engines carry the
  // same double-precision magnitude guard and raise loudly past the
  // ceiling; the production-scale shape is the same query with the
  // ·10^6 micro scaling dropped and the chi-square folded in IEEE
  // doubles (identical fold order both engines, the q166 discipline).
  // q113 reports one KL number per source; this table names the TERMS
  // whose usage shifted (a scraper change shows up as markup tokens
  // surging, a topic shift as content words). Scale shape: one token
  // explode into a vocab-bounded count table; top-k is a bounded
  // TakeOrdered; the chi-square is per-row arithmetic on |top| rows
  // against a broadcast 1-row total.
  private val DriftTop = 25

  private val q163: Q = (s, d) => {
    val counts = GramMemo.words(s, d)
      .select((col("doc_id") % 2).cast("int").as("h"),
        explode(col("words")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(sum(when(col("h") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("h") === 1, 1L).otherwise(0L)).as("c1"))
    val tot = counts.agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"))
    counts
      .orderBy((col("c0") + col("c1")).desc, col("w"))
      .limit(DriftTop)
      .crossJoin(broadcast(tot))
      // (ad−bc) forms in DECIMAL(38) — with BIGINT operands
      // c0*(n1−c1) wraps silently in Spark at ~9.2e18 (token totals
      // ~1e12 × common-term counts ~1e10 cross that well below
      // 100 TB) while DuckDB raises, so the engines would diverge
      // exactly where this drift audit matters
      .withColumn("adbc", expr(
        "CAST(c0 AS DECIMAL(38,0)) * (n1 - c1)" +
          " - CAST(c1 AS DECIMAL(38,0)) * (n0 - c0)"))
      // the guard bounds the numerator as the SUM it actually is
      // (2e6·N·adbc² + half-denominator): bounding the two terms
      // separately leaves a band just below the ceiling where the sum
      // reaches ~1.35e38 — past DECIMAL(38) (Spark nulls silently) but
      // inside HUGEINT (~1.7e38, DuckDB computes) — the exact
      // cross-engine divergence this guard exists to close
      .withColumn("chi2_micro", expr(
        "CASE WHEN CAST(n0 + n1 AS DOUBLE) * CAST(adbc AS DOUBLE)" +
          " * CAST(adbc AS DOUBLE) * 2e6" +
          " + CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)" +
          " * CAST(c0 + c1 AS DOUBLE)" +
          " * CAST(n0 + n1 - c0 - c1 AS DOUBLE) > 9e37" +
          " OR CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)" +
          " * CAST(c0 + c1 AS DOUBLE)" +
          " * CAST(n0 + n1 - c0 - c1 AS DOUBLE) * 2e0 > 9e37" +
          " THEN CAST(raise_error('q163: micro-exact chi-square" +
          " exceeds DECIMAL(38) at this corpus size - drop the 1e6" +
          " scaling and use the IEEE-double fold') AS BIGINT)" +
          " ELSE CAST((2 * CAST(n0 + n1 AS DECIMAL(38,0))" +
          " * adbc * adbc * 1000000" +
          " + CAST(n0 AS DECIMAL(38,0)) * n1 * (c0 + c1)" +
          " * (n0 + n1 - c0 - c1))" +
          " div (2 * CAST(n0 AS DECIMAL(38,0)) * n1 * (c0 + c1)" +
          " * (n0 + n1 - c0 - c1)) AS BIGINT) END"))
      .select(col("w").as("term"), col("c0"), col("c1"),
        (col("chi2_micro") / 1e6).as("chi2"))
      .orderBy(col("chi2").desc, col("term"))
  }

  private lazy val q163Sql = s"""
    WITH nd AS (SELECT doc_id, string_split(${OracleSql.normSql}, ' ')
                  AS ws
                FROM documents),
    tk AS (SELECT CAST(doc_id % 2 AS INTEGER) AS h, unnest(ws) AS w
           FROM nd),
    tf AS (SELECT w,
             CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
           FROM tk WHERE length(w) > 0 GROUP BY w),
    tot AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
                   CAST(sum(c1) AS BIGINT) AS n1 FROM tf),
    top AS (SELECT w, c0, c1 FROM tf
            ORDER BY (c0 + c1) DESC, w LIMIT $DriftTop),
    ab AS (SELECT w, c0, c1, n0, n1,
             CAST(c0 AS HUGEINT) * (n1 - c1)
               - CAST(c1 AS HUGEINT) * (n0 - c0) AS adbc
           FROM top, tot)
    SELECT w AS term, c0, c1,
           CASE WHEN CAST(n0 + n1 AS DOUBLE) * CAST(adbc AS DOUBLE)
                  * CAST(adbc AS DOUBLE) * 2e6
                  + CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
                  * CAST(c0 + c1 AS DOUBLE)
                  * CAST(n0 + n1 - c0 - c1 AS DOUBLE) > 9e37
                  OR CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
                  * CAST(c0 + c1 AS DOUBLE)
                  * CAST(n0 + n1 - c0 - c1 AS DOUBLE) * 2e0 > 9e37
             THEN CAST(error('q163: micro-exact chi-square exceeds
                 HUGEINT capacity at this corpus size') AS BIGINT)
             ELSE CAST((2 * CAST(n0 + n1 AS HUGEINT)
                 * adbc * adbc * 1000000
                 + CAST(n0 AS HUGEINT) * n1 * (c0 + c1)
                 * (n0 + n1 - c0 - c1))
               // (2 * CAST(n0 AS HUGEINT) * n1 * (c0 + c1)
                 * (n0 + n1 - c0 - c1)) AS BIGINT) END / 1e6 AS chi2
    FROM ab ORDER BY chi2 DESC, term"""

  val queries: Map[String, Q] = Map(
    "q159_bloom_fpr_audit" -> q159,
    "q160_label_silhouette" -> q160,
    "q161_winsorized_values" -> q161,
    "q162_filter_kappa" -> q162,
    "q163_vocab_drift" -> q163)

  val oracleSql: Map[String, String] = Map(
    "q159_bloom_fpr_audit" -> q159Sql,
    "q160_label_silhouette" -> q160Sql,
    "q161_winsorized_values" -> q161Sql,
    "q162_filter_kappa" -> q162Sql,
    "q163_vocab_drift" -> q163Sql)
}
