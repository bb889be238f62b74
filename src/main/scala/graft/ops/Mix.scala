package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget mixture sampling — the domain-mixing pass of a training
  * run: each group (source/domain/language) gets a slice of a global
  * token budget proportional to its mixture WEIGHT, and contributes its
  * documents in deterministic hash order until the slice is full.
  *
  * All budget arithmetic is BIGINT-exact (integral weights, integral
  * budget fraction, floor division) — no double rounding for engines to
  * disagree on. Document order within a group is the md5 bucket of the
  * key (then the key itself, so the order is total): reproducible across
  * engines, retries and repartitionings, and UNCORRELATED with any data
  * attribute — the slice is an unbiased sample of the group, not its
  * head (cf. [[Sample]]'s bucket rationale).
  *
  * Plan shape: one tiny two-row-per-group aggregate (broadcast back), one
  * window cumsum per group (the single shuffle — partition = group, the
  * same bounded-partition shape as sequence packing), one filter. A doc
  * is kept while the tokens BEFORE it fit the slice (`cum - toks <
  * budget`), so the budget is exceeded by at most one straddling doc —
  * the conventional greedy-fill contract.
  */
object Mix {

  /** Keep each group's hash-ordered prefix whose prior-token cumsum fits
    * the group's slice `total * budgetNum * weight / (budgetDen * Σw)`.
    *
    * @param weight integral per-row mixture weight (must be a pure
    *               function of `groupCol`)
    * @return kept rows + `n_tokens`, `rnk` (hash-order rank in group),
    *         `budget` (the group's token slice)
    */
  def tokenBudgetMix(df: DataFrame, keyCol: String, groupCol: String,
                     toks: Column, weight: Column,
                     budgetNum: Long, budgetDen: Long): DataFrame = {
    val rows = df.withColumn("_toks", toks).withColumn("_w", weight)
    // global totals: Σtokens over the corpus, Σweight over DISTINCT groups
    // — a two-level tiny aggregate, broadcast back onto the rows
    val totals = rows.groupBy(col(groupCol))
      .agg(sum(col("_toks")).as("_gt"), first(col("_w")).as("_gw"))
      .agg(sum(col("_gt")).as("_total"), sum(col("_gw")).as("_sumw"))
    // materialize the md5 order key once: inlining Sample.bucket into
    // each window spec makes Catalyst treat the two specs as distinct
    // (fresh expression ids), splitting the cumsum and row_number into
    // two Window nodes with two Sorts; one shared column keeps them in
    // a single Window pass over a single Sort
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("_ord"), col(keyCol))
    rows
      .withColumn("_ord", Sample.bucket(col(keyCol)))
      .withColumn("_cum", sum(col("_toks")).over(w))
      .withColumn("_rnk", row_number().over(w))
      .crossJoin(broadcast(totals))
      .withColumn("_num", col("_total") * budgetNum * col("_w"))
      .withColumn("_den", col("_sumw") * budgetDen)
      .withColumn("budget", expr("_num div _den"))
      .filter(col("_cum") - col("_toks") < col("budget"))
      .withColumn("n_tokens", col("_toks"))
      .withColumn("rnk", col("_rnk").cast("int"))
      .drop("_toks", "_w", "_ord", "_cum", "_rnk", "_total", "_sumw",
        "_num", "_den")
  }

  /** DuckDB mirror of [[tokenBudgetMix]] as a CTE chain ending in `kept`
    * (same column contract). `fromSql` must yield (key, group, toks, w).
    */
  def tokenBudgetMixSql(fromSql: String, keyCol: String, groupCol: String,
                        budgetNum: Long, budgetDen: Long): String = s"""
    rows_ AS ($fromSql),
    totals AS (
      SELECT CAST(sum(gt) AS BIGINT) AS total, CAST(sum(gw) AS BIGINT) AS sumw
      FROM (SELECT sum(toks) AS gt, first(w) AS gw
            FROM rows_ GROUP BY $groupCol)),
    cum AS (
      SELECT *,
             CAST(sum(toks) OVER (PARTITION BY $groupCol
               ORDER BY substr(md5(CAST($keyCol AS VARCHAR)), 1, 4), $keyCol
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c,
             CAST(row_number() OVER (PARTITION BY $groupCol
               ORDER BY substr(md5(CAST($keyCol AS VARCHAR)), 1, 4), $keyCol)
               AS INTEGER) AS rnk
      FROM rows_),
    kept AS (
      SELECT cum.*,
             (totals.total * $budgetNum * cum.w)
               // (totals.sumw * $budgetDen) AS budget
      FROM cum, totals
      WHERE cum.c - cum.toks <
            (totals.total * $budgetNum * cum.w) // (totals.sumw * $budgetDen))"""
}
