package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Sample

/** Training-data curation batch nine: statistical language-model quality
  * scoring and temperature-weighted source mixing.
  */
object Pipeline9 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------- q87
  // Character-trigram LM self-scoring (the KenLM-style perplexity-proxy
  // filter of CCNet/Llama curation): mean trigram log-probability per
  // doc under the corpus' own add-one-smoothed trigram model. The model
  // table is bounded by the normalized charset's trigram space at any
  // corpus size, so it broadcasts; scoring is one doc_id-keyed shuffle
  // with map-side partial aggregation. See text.TrigramLm for the full
  // scale derivation (incl. the sampled-model variant a 100 TB run uses).
  private val q87: Q = (s, d) =>
    graft.text.TrigramLm.score(
      documents(s, d).select(col("doc_id"), col("text")),
      "doc_id", "text")
      .orderBy(col("doc_id"))

  private lazy val q87Sql = s"""
    WITH nd AS (SELECT doc_id, ${OracleSql.normSql} AS n FROM documents),
    tri AS (SELECT doc_id, unnest(list_transform(range(1, len(n) - 1),
              i -> substr(n, CAST(i AS INTEGER), 3))) AS tri
            FROM nd WHERE len(n) >= 3),
    model AS (SELECT tri, CAST(count(*) AS BIGINT) AS c
              FROM tri GROUP BY tri),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn,
                   CAST(count(*) AS BIGINT) AS v FROM model),
    lp AS (SELECT tri, ln((c + 1.0) / (nn + v)) AS logp FROM model, tot),
    sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
                  sum(logp) AS s
           FROM tri JOIN lp USING (tri) GROUP BY doc_id)
    SELECT d.doc_id, coalesce(sc.n_tri, CAST(0 AS BIGINT)) AS n_tri,
           round(sc.s / sc.n_tri, 6) AS lm_score
    FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY doc_id"""

  // ------------------------------------------------------------------- q88
  // Temperature-weighted source mixing (the T5/Llama multinomial rule,
  // α = 1/2): each source's share of the target is ∝ sqrt(n_s), so small
  // sources are up-weighted and no giant source dominates; rows are kept
  // by the deterministic md5-bucket predicate at the source's derived
  // rate — reproducible across engines/retries/layout, shuffle-free on
  // the fact side. Rate derivation and the cross-engine determinism
  // argument (sqrt not pow, 6-dp pinning, shared %04x threshold
  // generator) live in ops.Sample.temperatureSample.
  private val MixFrac = 0.5

  private val q88: Q = (s, d) =>
    Sample.temperatureSample(
      documents(s, d).select(col("doc_id"), col("source")),
      "doc_id", "source", MixFrac)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  private lazy val q88Sql = s"""
    WITH counts AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                    FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                   round(sum(sqrt(n)), 6) AS ssum FROM counts),
    thresh AS (SELECT source,
                 ${Sample.temperatureThresholdSql(MixFrac)} AS th
               FROM counts, tot)
    SELECT d.doc_id, d.source
    FROM documents d JOIN thresh USING (source)
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < th
    ORDER BY doc_id"""

  val queries: Map[String, Q] = Map(
    "q87_trigram_lm_score" -> q87,
    "q88_temperature_mix" -> q88)

  val oracleSql: Map[String, String] = Map(
    "q87_trigram_lm_score" -> q87Sql,
    "q88_temperature_mix" -> q88Sql)
}
