package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Training-data curation batch eight: quality-ranked cluster
  * representatives, sketch-bucketed hard-negative mining, the
  * cross-source duplication matrix, and fuzzy-containment (subset
  * duplicate) detection.
  */
object Pipeline8 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------- q83
  // Quality-ranked representative per near-dup cluster. q50/q63 keep the
  // MIN-id member — the arbitrary-but-deterministic choice a dedup pass
  // defaults to; a curation pipeline keeps the BEST member (highest
  // quality score, doc_id tie-break) so deduplication never discards the
  // cleanest copy. Reads the memoized q50 clustering (zero marginal
  // clustering cost in-session; standalone it recomputes — same lineage
  // either way), joins the scan-local quality score by doc_id, and takes
  // the per-cluster argmax as ONE map-side-combinable max(struct) — no
  // window, no second shuffle: the struct's (quality, -doc_id, doc_id)
  // field order makes lexicographic max exactly "highest quality, then
  // lowest id", and the aggregate carries one 24-byte struct per cluster
  // per partition at any corpus size.
  private val q83: Q = (s, d) => {
    val qual = FeatureMemo.features(s, d)
      .select(col("doc_id"), col("quality"))
    ClusterMemo.clusters(s, d, threshold = 0.5)
      .select(col("doc_id"), col("cluster_id"))
      .join(qual, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("quality"), (-col("doc_id")).as("_ni"),
          col("doc_id").as("_id"))).as("_m"))
      .select(col("cluster_id"), col("n_members"),
        col("_m._id").as("rep_id"), col("_m.quality").as("rep_quality"))
      .orderBy(col("cluster_id"))
  }

  private lazy val q83Sql = s"""
    WITH RECURSIVE ${OracleSql.textClusterCtes(0.5)},
    sc AS (SELECT doc_id, ${OracleSql.qualityScColsSql}
           FROM documents),
    q AS (SELECT doc_id, ${OracleSql.qualitySql} AS quality FROM sc),
    j AS (SELECT cc.cluster_id, cc.doc_id, q.quality
          FROM cc JOIN q USING (doc_id)),
    r AS (SELECT cluster_id, doc_id, quality,
                 row_number() OVER (PARTITION BY cluster_id
                   ORDER BY quality DESC, doc_id) AS rn,
                 CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                   AS n_members
          FROM j)
    SELECT cluster_id, n_members, doc_id AS rep_id, quality AS rep_quality
    FROM r WHERE rn = 1 ORDER BY cluster_id"""

  // ------------------------------------------------------------------- q84
  // Hard-negative mining (contrastive-training data prep): every vector's
  // top-3 nearest DIFFERENT-label vectors. The anchor side is the whole
  // corpus — nothing is broadcast-able — so candidates come from the
  // anchor's hyperplane-sketch bucket via one corpus×corpus equi-join
  // shuffled on the bucket id, ranked by the bounded TopKByScore k-heap
  // (see Similarity.hardNegatives for the full scale derivation).
  private val NegK = 3

  private val q84: Q = (s, d) =>
    graft.sim.Similarity.hardNegatives(
      embeddings(s, d).select(col("vec_id"), col("label"), col("embedding")),
      k = NegK)
      .orderBy(col("q_id"), col("rnk"))

  private lazy val q84Sql = s"""
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
    sk AS (SELECT vec_id, label, embedding,
             CAST(${OracleSql.hyperplaneBitsSql(8)} AS INTEGER) AS bucket
           FROM e),
    sims AS (
      SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             ${OracleSql.cosPairSql("a", "b")} AS sim
      FROM sk a JOIN sk b
        ON a.bucket = b.bucket AND a.label <> b.label),
    ranked AS (
      SELECT *, row_number() OVER
        (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
      FROM sims WHERE sim IS NOT NULL)
    SELECT q_id, vec_id, sim, rnk FROM ranked
    WHERE rnk <= $NegK ORDER BY q_id, rnk"""

  // ------------------------------------------------------------------- q85
  // Cross-source duplication matrix — which sources copy from which (the
  // observability artifact that decides per-source dedup priorities and
  // crawl-overlap budgets). Verified near-dup pairs come off the memoized
  // scored-pair table (zero marginal MinHash/LSH cost after q50); the
  // matrix is two id-keyed joins to the (doc_id, source) projection and
  // one tiny combinable aggregate over the canonicalized
  // (least, greatest) source pair.
  private val q85: Q = (s, d) => {
    val src = documents(s, d).select(col("doc_id"), col("source"))
    ClusterMemo.scoredPairs(s, d)
      .filter(col("jaccard") >= 0.5)
      .join(src.select(col("doc_id").as("id_a"), col("source").as("_sa")),
        Seq("id_a"))
      .join(src.select(col("doc_id").as("id_b"), col("source").as("_sb")),
        Seq("id_b"))
      .select(least(col("_sa"), col("_sb")).as("source_a"),
        greatest(col("_sa"), col("_sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  private lazy val q85Sql = s"""
    WITH RECURSIVE ${OracleSql.textClusterCtes(0.5)}
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM edges e
      JOIN documents da ON da.doc_id = e.id_a
      JOIN documents db ON db.doc_id = e.id_b
    GROUP BY 1, 2 ORDER BY 1, 2"""

  // ------------------------------------------------------------------- q86
  // Fuzzy containment (subset duplicates): doc pairs sharing a RARE
  // word-8-gram, verified by distinct-gram-set overlap against the
  // SMALLER side — the duplicate class symmetric Jaccard is blind to
  // (a doc quoted whole inside a 10× longer one scores J ≈ 0.1 and
  // MinHash-LSH never nominates it). See DedupOps.containmentPairs for
  // the df-cap bound derivation.
  private val ContainN = 8
  private val ContainFrac = 0.8

  private val q86: Q = (s, d) =>
    graft.dedup.DedupOps.containmentPairsOfWords(
      // the shared normalized-word artifact (GramMemo — tokenize once,
      // gram per query); the memo also carries the core spread the old
      // inline repartition provided
      GramMemo.words(s, d),
      "doc_id", "words", ContainN)
      .withColumn("is_contained", col("containment") >= ContainFrac)
      .orderBy(col("id_a"), col("id_b"))

  private lazy val q86Sql = s"""
    WITH nd AS (
      SELECT doc_id, string_split(${OracleSql.normSql}, ' ') AS w
      FROM documents),
    g AS (SELECT doc_id, ${OracleSql.gramsSql(ContainN)} AS gr FROM nd),
    dg AS (SELECT doc_id, unnest(gr) AS gram FROM g),
    rare AS (
      SELECT gram FROM (
        SELECT gram, count(*) AS df FROM dg GROUP BY gram) c
      WHERE df BETWEEN 2 AND 5),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM dg a
        JOIN rare USING (gram)
        JOIN dg b ON b.gram = a.gram AND a.doc_id < b.doc_id),
    v AS (
      SELECT id_a, id_b,
             CAST(len(ga.gr) AS BIGINT) AS n_a,
             CAST(len(gb.gr) AS BIGINT) AS n_b,
             CAST(len(list_intersect(ga.gr, gb.gr)) AS BIGINT) AS n_common
      FROM cand
        JOIN g ga ON ga.doc_id = id_a
        JOIN g gb ON gb.doc_id = id_b)
    SELECT id_a, id_b, n_a, n_b, n_common,
           round(CAST(n_common AS DOUBLE) / least(n_a, n_b), 6)
             AS containment,
           round(CAST(n_common AS DOUBLE) / least(n_a, n_b), 6)
             >= $ContainFrac AS is_contained
    FROM v ORDER BY id_a, id_b"""

  val queries: Map[String, Q] = Map(
    "q83_cluster_best_rep" -> q83,
    "q84_hard_negatives" -> q84,
    "q85_cross_source_dups" -> q85,
    "q86_containment_pairs" -> q86)

  val oracleSql: Map[String, String] = Map(
    "q83_cluster_best_rep" -> q83Sql,
    "q84_hard_negatives" -> q84Sql,
    "q85_cross_source_dups" -> q85Sql,
    "q86_containment_pairs" -> q86Sql)
}
