package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data curation batch twenty-five — recency, cluster
  * topology, and LSH design: exponentially time-decayed per-user
  * engagement in EXACT power-of-two arithmetic (q164: the
  * recency-weighted activity score a sampling policy reads — decay
  * weights are 2^-k, exactly representable, so the whole sum is
  * integer-exact under DECIMAL(38)/HUGEINT instead of an
  * order-dependent float fold), near-dup cluster edge density (q165:
  * connected components CHAIN — a cluster with density << 1 was glued
  * by borderline links and deduping it to one representative
  * over-merges; the q50 clustering's own health check), and the
  * MinHash banding tuning curve (q166: expected recall of every
  * (bands, rows) split of the 8-hash signature over the TRUE pair
  * similarity distribution — q148 audits the shipped 4×2 config
  * against theory, this table says what the OTHER configs would have
  * caught, which is the evidence for re-banding; S-curves are
  * evaluated with explicit square/multiply chains so both engines fold
  * the same IEEE doubles in the same order, no libm pow).
  */
object Pipeline25 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  private def microMean(sumCol: String, nCol: String): Column =
    expr(s"(CASE WHEN $sumCol < 0 THEN -1 ELSE 1 END) * " +
      s"((2 * abs($sumCol) + $nCol) div (2 * $nCol))")

  // ------------------------------------------------------------------ q164
  // Time-decayed engagement: per user, sum of event values weighted by
  // 2^-k where k = floor(age / 7 days) clamped to 40 halvings — the
  // half-life recency score. Exactness: 2^-k is a power of two, so
  // every weighted term vm·2^(40-k) is an exact integer; the per-user
  // sums ride DECIMAL(38) (HUGEINT in the oracle) and normalize by one
  // final half-away integer division by 2^40. An exp()/pow() decay
  // would be a float fold whose result depends on summation order —
  // unreproducible across engines AND across partitionings of the same
  // cluster. Top-100 by decayed value (bounded TakeOrdered), the
  // "currently engaged users" table a recency-aware sampler reads.
  private val DecayHalfLifeUs = 604800000000L // 7 days in micros
  private val DecayMaxK = 40
  private val DecayScale = 1L << DecayMaxK

  private val q164: Q = (s, d) => {
    val ev = eventsMicros(s, d).select(col("user_id"), col("ts_us"),
      round(col("value") * 1e6, 0).cast("long").as("vm"))
    val anchor = ev.agg(max(col("ts_us")).as("amax"))
    ev.crossJoin(broadcast(anchor))
      .withColumn("k", least(
        expr(s"(amax - ts_us) div $DecayHalfLifeUs"), lit(DecayMaxK.toLong)))
      .withColumn("wsc", expr(s"shiftleft(1L, CAST($DecayMaxK - k AS INT))"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(vm AS DECIMAL(38,0)) * wsc")).as("dsum"),
        sum(expr("CAST(1000000 AS DECIMAL(38,0)) * wsc")).as("dcnt"),
        min(col("k")).as("freshest_k"))
      .select(col("user_id"), col("n_events"), col("freshest_k"),
        expr(s"(CASE WHEN dsum < 0 THEN -1 ELSE 1 END) * " +
          s"((2 * abs(dsum) + ${DecayScale}L) div (2 * ${DecayScale}L))")
          .as("dv_micro"),
        expr(s"(2 * dcnt + ${DecayScale}L) div (2 * ${DecayScale}L)")
          .as("dn_micro"))
      .orderBy(col("dv_micro").desc, col("user_id"))
      .limit(100)
      .select(col("user_id"), col("n_events"), col("freshest_k"),
        (col("dv_micro") / 1e6).as("decayed_value"),
        (col("dn_micro") / 1e6).as("decayed_events"))
  }

  private lazy val q164Sql = s"""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 1e6, 0) AS BIGINT) AS vm
                FROM events),
    anchor AS (SELECT max(ts_us) AS amax FROM ev),
    w AS (SELECT user_id, vm,
            (1::BIGINT << ($DecayMaxK - least(
              (amax - ts_us) // $DecayHalfLifeUs, $DecayMaxK))) AS wsc,
            least((amax - ts_us) // $DecayHalfLifeUs, $DecayMaxK) AS k
          FROM ev, anchor),
    ag AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(min(k) AS BIGINT) AS freshest_k,
             sum(CAST(vm AS HUGEINT) * wsc) AS dsum,
             sum(CAST(1000000 AS HUGEINT) * wsc) AS dcnt
           FROM w GROUP BY user_id),
    sc AS (SELECT user_id, n_events, freshest_k,
             CAST((CASE WHEN dsum < 0 THEN -1 ELSE 1 END) *
               ((2 * abs(dsum) + $DecayScale) // (2 * $DecayScale))
               AS BIGINT) AS dv_micro,
             CAST((2 * dcnt + $DecayScale) // (2 * $DecayScale)
               AS BIGINT) AS dn_micro
           FROM ag)
    SELECT user_id, n_events, freshest_k,
           dv_micro / 1e6 AS decayed_value,
           dn_micro / 1e6 AS decayed_events
    FROM sc ORDER BY dv_micro DESC, user_id LIMIT 100"""

  // ------------------------------------------------------------------ q165
  // Near-dup cluster edge density: for every q50 cluster of n >= 2
  // members, the verified-edge count over C(n, 2) — density 1 means
  // every member pair really is a near-dup; density << 1 means the
  // component was CHAINED through borderline links (A~B~C with A,C
  // dissimilar), where collapsing to one representative destroys
  // non-duplicate text. The q50 clustering's own topology audit, in
  // the q142/q148 evidence-table tradition. Scale shape: rides the
  // memoized cluster labels AND the memoized scored pairs — zero new
  // corpus work; output is bounded by cluster count.
  private val q165: Q = (s, d) => {
    val cl = ClusterMemo.clusters(s, d, threshold = 0.5)
    val edges = ClusterMemo.scoredPairs(s, d)
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a").as("doc_id"))
    val ec = edges.join(cl.select(col("doc_id"), col("cluster_id")),
        Seq("doc_id"))
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_edges"))
    cl.filter(col("n_members") >= 2)
      .groupBy(col("cluster_id")).agg(max(col("n_members")).as("n_members"))
      .join(ec, Seq("cluster_id"), "left")
      .select(col("cluster_id"), col("n_members"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        expr("(2 * 1000000 * coalesce(n_edges, 0) + " +
          "(n_members * (n_members - 1)) div 2) div " +
          "(2 * ((n_members * (n_members - 1)) div 2))").as("dm"))
      .select(col("cluster_id"), col("n_members"), col("n_edges"),
        (col("dm") / 1e6).as("density"),
        (col("n_edges") <
          expr("(n_members * (n_members - 1)) div 2")).as("is_chained"))
      .orderBy(col("cluster_id"))
  }

  private lazy val q165Sql = s"""
    WITH RECURSIVE ${OracleSql.textClusterCtes(0.5)},
    mem AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
            FROM cc GROUP BY 1 HAVING count(*) >= 2),
    ec AS (SELECT cc.cluster_id, CAST(count(*) AS BIGINT) AS n_edges
           FROM edges e JOIN cc ON cc.doc_id = e.id_a GROUP BY 1)
    SELECT mem.cluster_id, n_members,
           coalesce(ec.n_edges, 0) AS n_edges,
           ((2 * 1000000 * coalesce(ec.n_edges, 0) +
             (n_members * (n_members - 1)) // 2) //
            (2 * ((n_members * (n_members - 1)) // 2))) / 1e6 AS density,
           coalesce(ec.n_edges, 0) <
             (n_members * (n_members - 1)) // 2 AS is_chained
    FROM mem LEFT JOIN ec ON ec.cluster_id = mem.cluster_id
    ORDER BY mem.cluster_id"""

  // ------------------------------------------------------------------ q166
  // MinHash banding tuning curve: expected recall of every (bands,
  // rows) factorization of the 8-hash signature — (8,1), (4,2), (2,4),
  // (1,8) — over the TRUE J >= 0.5 pair distribution (the exactPairs
  // ground truth): E[recall] = mean over true pairs of
  // 1 - (1 - s^r)^b. More bands = catch lower-similarity pairs but
  // nominate more junk; this table quantifies the recall side against
  // the corpus' OWN similarity histogram instead of a textbook curve.
  // The S-curve folds as explicit square chains (r and b are powers of
  // two), identical IEEE order in both engines; per-pair values round
  // to micro and the mean is the exact integer form. One scan of the
  // bounded pair artifact; four output rows.
  private val SweepConfigs = Seq((8, 1), (4, 2), (2, 4), (1, 8))

  /** `x` squared `log2(n)` times as dialect-neutral SQL — exact
    * repeated squaring, so both engines evaluate the identical chain.
    */
  private def powChain(x: String, n: Int): String = n match {
    case 1 => x
    case _ =>
      val h = powChain(x, n / 2)
      s"($h * $h)"
  }

  private def recallMicroSql(b: Int, r: Int): String = {
    val sr = powChain("s", r)
    val qb = powChain(s"(1.0 - $sr)", b)
    s"CAST(round((1.0 - $qb) * 1e6, 0) AS BIGINT)"
  }

  private val q166: Q = (s, d) => {
    val pairs = ClusterMemo.exactPairs(s, d).select(col("jaccard").as("s"))
    val aggCols = Seq(count(lit(1)).as("n_pairs")) ++
      SweepConfigs.map { case (b, r) =>
        sum(expr(recallMicroSql(b, r))).as(s"rm_${b}_$r")
      }
    val agg = pairs.agg(aggCols.head, aggCols.tail: _*)
    SweepConfigs.map { case (b, r) =>
      agg.select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
        col("n_pairs"),
        (microMean(s"rm_${b}_$r", "n_pairs") / 1e6).as("expected_recall"))
    }.reduce(_ unionByName _)
      .orderBy(col("bands").desc)
  }

  private lazy val q166Sql = {
    val rows = SweepConfigs.map { case (b, r) =>
      s"""SELECT CAST($b AS BIGINT) AS bands,
           CAST($r AS BIGINT) AS rows_per_band, n_pairs,
           (((2 * abs(rm_${b}_$r) + n_pairs) // (2 * n_pairs))) / 1e6
             AS expected_recall
         FROM ag"""
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH ${OracleSql.exactPairsCtes},
    sp AS (SELECT jaccard AS s FROM ex),
    ag AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             ${SweepConfigs.map { case (b, r) =>
               s"CAST(sum(${recallMicroSql(b, r)}) AS BIGINT) AS rm_${b}_$r"
             }.mkString(",\n             ")}
           FROM sp)
    SELECT * FROM (
      $rows
    ) ORDER BY bands DESC"""
  }

  val queries: Map[String, Q] = Map(
    "q164_decayed_engagement" -> q164,
    "q165_cluster_density" -> q165,
    "q166_lsh_tuning_curve" -> q166)

  val oracleSql: Map[String, String] = Map(
    "q164_decayed_engagement" -> q164Sql,
    "q165_cluster_density" -> q165Sql,
    "q166_lsh_tuning_curve" -> q166Sql)
}
