package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Batch twenty-three: statistical rigor for corpus metrics — q154
  * puts a CONFIDENCE INTERVAL on the corpus mean quality score via a
  * deterministic Poisson bootstrap (Chamandy et al. 2012, "Estimating
  * uncertainty for massive data streams" — the bootstrap that works in
  * one pass over distributed data: each replica re-weights every row
  * by an independent Poisson(1) draw instead of resampling globally).
  * A dashboard number without an interval invites over-reading every
  * wiggle; this op prices the wiggle.
  */
object Pipeline23 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------ q154
  // Determinism: the Poisson(1) draw is the inverse CDF evaluated on a
  // 52-bit md5 uniform (the Kmv.hash52 pattern — bit-identical in both
  // engines), with the CDF thresholds computed ONCE here in Scala and
  // baked into BOTH plans as integer literals — libm exp() never runs
  // inside either engine, so replica weights are engine-exact integers.
  // Replica means are exact integer ratios (micro-unit quality sums /
  // weight sums, half-away rounding — the q143 rule), and the CI is
  // the type-1 2.5%/97.5% quantile over the B sorted replica means.
  // Scale shape: ONE corpus scan exploded ×B into (replica, w, w·q)
  // rows that combine map-side onto B keys — the canonical one-pass
  // bootstrap; the B-row replica table then sorts in a bounded window.
  // the Poisson machinery lives in graft.ops.PoissonBoot (shared with
  // the streaming CI monitor); one definition of thresholds/weights
  private val BootB = graft.ops.PoissonBoot.B
  private def weightSql(u: String) = graft.ops.PoissonBoot.weightSql(u)
  private def weightDuckSql(u: String) =
    graft.ops.PoissonBoot.weightDuckSql(u)

  private val q154: Q = (s, d) => {
    // checkpointed: the replica explode AND the point estimate read the
    // same quality scan (the regex pass is the dominant cost)
    // the quality scan is the stored feature table (FeatureMemo, the
    // pinned artifact) — the replica explode and the point estimate
    // both read it; the micro conversion is row-wise on its output
    val base = FeatureMemo.features(s, d)
      .select(col("doc_id"),
        round(round(col("quality"), 6) * 1e6, 0)
          .cast("long").as("qm"))
    val rep = base
      .select(col("doc_id"), col("qm"),
        explode(sequence(lit(0), lit(BootB - 1))).as("b"))
      .withColumn("u", graft.ops.PoissonBoot.u52(col("doc_id"), col("b")))
      .withColumn("w", expr(weightSql("u")).cast("long"))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("qm")).as("swq"))
      // exact half-away-from-zero integer mean in micro-units; a
      // zero-weight replica (P = e^-n) has no mean and is dropped from
      // the ranked set in BOTH engines (the ciFromSorted rule — an
      // unguarded div would null in Spark but RAISE in DuckDB)
      .select(col("b"),
        expr("CASE WHEN sw > 0 THEN (CASE WHEN swq < 0 THEN -1 ELSE 1 END) * " +
          "((2 * abs(swq) + sw) div (2 * sw)) END")
          .as("mean_micro"))
      .filter(col("mean_micro").isNotNull)
    val wc = Window.orderBy(col("mean_micro"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val stats = rep
      .withColumn("r", count(lit(1)).over(wc))
      .withColumn("nz", count(lit(1)).over(wt))
      .agg(
        min(when(col("r") >= expr("(nz * 25 + 999) div 1000"),
          col("mean_micro"))).as("lo_micro"),
        min(when(col("r") >= expr("(nz * 975 + 999) div 1000"),
          col("mean_micro"))).as("hi_micro"))
    val point = base.agg(count(lit(1)).as("n_docs"),
      expr("(CASE WHEN sum(qm) < 0 THEN -1 ELSE 1 END) * " +
        "((2 * abs(sum(qm)) + count(1)) div (2 * count(1)))").as("pm"))
    point.crossJoin(broadcast(stats))
      .select(col("n_docs"), lit(BootB.toLong).as("n_replicas"),
        (col("pm") / 1e6).as("mean_quality"),
        (col("lo_micro") / 1e6).as("ci_lo"),
        (col("hi_micro") / 1e6).as("ci_hi"))
  }

  private lazy val q154Sql = {
    s"""
    WITH raw AS (SELECT doc_id, ${OracleSql.qualityScColsSql}
                 FROM documents),
    base AS (SELECT doc_id,
               CAST(round(${OracleSql.qualitySql} * 1e6, 0) AS BIGINT)
                 AS qm
             FROM raw),
    rep AS (SELECT b.b, base.qm,
              ${weightDuckSql(
        graft.ops.PoissonBoot.u52DuckSql("base.doc_id", "b.b"))} AS w
            FROM base, (SELECT unnest(generate_series(0, ${BootB - 1}))
                        AS b) b),
    means AS (SELECT b, (CASE WHEN sum(w * qm) < 0 THEN -1 ELSE 1 END) *
                ((2 * abs(sum(w * qm)) + sum(w)) // (2 * sum(w)))
                AS mean_micro
              FROM rep GROUP BY b HAVING sum(w) > 0),
    ranked AS (SELECT mean_micro, row_number() OVER
                 (ORDER BY mean_micro) AS r,
                 count(*) OVER () AS nz FROM means),
    ci AS (SELECT
             min(CASE WHEN r >= (nz * 25 + 999) // 1000
               THEN mean_micro END) AS lo_micro,
             min(CASE WHEN r >= (nz * 975 + 999) // 1000
               THEN mean_micro END) AS hi_micro
           FROM ranked),
    pt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             (CASE WHEN sum(qm) < 0 THEN -1 ELSE 1 END) *
             ((2 * abs(sum(qm)) + count(*)) // (2 * count(*))) AS pm
           FROM base)
    SELECT n_docs, CAST($BootB AS BIGINT) AS n_replicas,
           pm / 1e6 AS mean_quality,
           lo_micro / 1e6 AS ci_lo, hi_micro / 1e6 AS ci_hi
    FROM pt, ci"""
  }

  // ------------------------------------------------------------------ q155
  // Per-source bootstrap CI — the actionable form of q154: "source A's
  // quality is lower than B's" is only a decision if the intervals
  // separate. Same deterministic Poisson machinery, keyed by (source,
  // replica); the corpus point mean rides a broadcast back and each
  // source gets a `differs` flag (corpus mean outside the source CI) —
  // the line a mixing policy (q88/q64) actually reads. Exchange carries
  // |sources| × B keys.
  private val q155: Q = (s, d) => {
    // checkpointed: replica explode, per-source means AND corpus mean
    // all read the one quality scan (the regex pass dominates)
    val base = FeatureMemo.features(s, d)
      .select(col("doc_id"), col("source"),
        round(round(col("quality"), 6) * 1e6, 0)
          .cast("long").as("qm"))
    val rep = base
      .select(col("doc_id"), col("source"), col("qm"),
        explode(sequence(lit(0), lit(BootB - 1))).as("b"))
      .withColumn("u", graft.ops.PoissonBoot.u52(col("doc_id"), col("b")))
      .withColumn("w", expr(weightSql("u")).cast("long"))
      .groupBy(col("source"), col("b"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("qm")).as("swq"))
      // zero-weight replicas drop from the ranked set (q154 rule)
      .select(col("source"), col("b"),
        expr("CASE WHEN sw > 0 THEN (CASE WHEN swq < 0 THEN -1 ELSE 1 END) * " +
          "((2 * abs(swq) + sw) div (2 * sw)) END")
          .as("mean_micro"))
      .filter(col("mean_micro").isNotNull)
    val wc = Window.partitionBy(col("source")).orderBy(col("mean_micro"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col("source"))
    val ci = rep
      .withColumn("r", count(lit(1)).over(wc))
      .withColumn("nz", count(lit(1)).over(wt))
      .groupBy(col("source"))
      .agg(
        min(when(col("r") >= expr("(nz * 25 + 999) div 1000"),
          col("mean_micro"))).as("lo_micro"),
        min(when(col("r") >= expr("(nz * 975 + 999) div 1000"),
          col("mean_micro"))).as("hi_micro"))
    val per = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("(CASE WHEN sum(qm) < 0 THEN -1 ELSE 1 END) * " +
        "((2 * abs(sum(qm)) + count(1)) div (2 * count(1)))").as("pm"))
    val corpus = base.agg(
      expr("(CASE WHEN sum(qm) < 0 THEN -1 ELSE 1 END) * " +
        "((2 * abs(sum(qm)) + count(1)) div (2 * count(1)))").as("cm"))
    per.join(ci, Seq("source")).crossJoin(broadcast(corpus))
      .select(col("source"), col("n_docs"),
        (col("pm") / 1e6).as("mean_quality"),
        (col("lo_micro") / 1e6).as("ci_lo"),
        (col("hi_micro") / 1e6).as("ci_hi"),
        (col("cm") / 1e6).as("corpus_mean"),
        when(col("cm") < col("lo_micro") || col("cm") > col("hi_micro"),
          1L).otherwise(0L).as("differs"))
      .orderBy(col("source"))
  }

  private lazy val q155Sql = {
    s"""
    WITH raw AS (SELECT doc_id, source, ${OracleSql.qualityScColsSql}
                 FROM documents),
    base AS (SELECT doc_id, source,
               CAST(round(${OracleSql.qualitySql} * 1e6, 0) AS BIGINT)
                 AS qm
             FROM raw),
    rep AS (SELECT base.source, b.b, base.qm,
              ${weightDuckSql(
        graft.ops.PoissonBoot.u52DuckSql("base.doc_id", "b.b"))} AS w
            FROM base, (SELECT unnest(generate_series(0, ${BootB - 1}))
                        AS b) b),
    means AS (SELECT source, b,
                (CASE WHEN sum(w * qm) < 0 THEN -1 ELSE 1 END) *
                ((2 * abs(sum(w * qm)) + sum(w)) // (2 * sum(w))) AS mean_micro
              FROM rep GROUP BY source, b HAVING sum(w) > 0),
    ranked AS (SELECT source, mean_micro, row_number() OVER
                 (PARTITION BY source ORDER BY mean_micro) AS r,
                 count(*) OVER (PARTITION BY source) AS nz
               FROM means),
    ci AS (SELECT source,
             min(CASE WHEN r >= (nz * 25 + 999) // 1000
               THEN mean_micro END) AS lo_micro,
             min(CASE WHEN r >= (nz * 975 + 999) // 1000
               THEN mean_micro END) AS hi_micro
           FROM ranked GROUP BY source),
    per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              (CASE WHEN sum(qm) < 0 THEN -1 ELSE 1 END) *
             ((2 * abs(sum(qm)) + count(*)) // (2 * count(*))) AS pm
            FROM base GROUP BY source),
    corpus AS (SELECT (CASE WHEN sum(qm) < 0 THEN -1 ELSE 1 END) *
             ((2 * abs(sum(qm)) + count(*)) // (2 * count(*))) AS cm
               FROM base)
    SELECT per.source, n_docs,
           pm / 1e6 AS mean_quality,
           lo_micro / 1e6 AS ci_lo, hi_micro / 1e6 AS ci_hi,
           cm / 1e6 AS corpus_mean,
           CAST(CASE WHEN cm < lo_micro OR cm > hi_micro
             THEN 1 ELSE 0 END AS BIGINT) AS differs
    FROM per JOIN ci ON ci.source = per.source, corpus
    ORDER BY per.source"""
  }

  // ------------------------------------------------------------------ q156
  // MinHash width sweep: the "how many hashes do I actually need"
  // table. Signatures NEST (the h-hash estimator is the first h
  // components of the 16-hash signature), so ONE 16-hash signature
  // pass yields the 4-, 8- and 16-hash Jaccard estimates per pair —
  // evaluated against the exact PPJoin ground truth (the session
  // exactPairs artifact), as mean absolute error per similarity band
  // in exact integer micro-units. Read with q148 (recall of the
  // banding) this completes the LSH configuration evidence: q148 says
  // whether the bands FIND the pairs, q156 says how precisely each
  // width SCORES them. Scale shape: one signature scan; everything
  // pairwise rides the bounded ground-truth pair table.
  private val SweepHashes = 16
  private val SweepK = 5

  private val q156: Q = (s, d) => {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    // signatures computed ONLY for docs the ground-truth pairs touch
    // (bounded), and pinned so the two join branches share one pass
    val pairIds = ClusterMemo.exactPairs(s, d)
      .select(col("id_a").as("doc_id"))
      .unionByName(ClusterMemo.exactPairs(s, d)
        .select(col("id_b").as("doc_id"))).distinct()
    val sig = documents(s, d)
      .join(pairIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        column(graft.dedup.MinHashSig(expression(col("text")),
          SweepK, SweepHashes)).as("sig"))
      .localCheckpoint()
    def estMicro(h: Int, a: String, b: String) = {
      val agree = (0 until h).map(i =>
        when(element_at(col(a), i + 1) === element_at(col(b), i + 1), 1)
          .otherwise(0)).reduce(_ + _)
      // est_h = agree/h rounded 6, in micro-units — exact integers
      round(round(agree / lit(h.toDouble), 6) * 1e6, 0).cast("long")
    }
    val pairs = ClusterMemo.exactPairs(s, d)
      .join(sig.select(col("doc_id").as("id_a"), col("sig").as("_sa")),
        Seq("id_a"))
      .join(sig.select(col("doc_id").as("id_b"), col("sig").as("_sb")),
        Seq("id_b"))
      .select((floor(col("jaccard") * 20) / 20.0).as("bin_lo"),
        round(col("jaccard") * 1e6, 0).cast("long").as("jm"),
        estMicro(4, "_sa", "_sb").as("e4"),
        estMicro(8, "_sa", "_sb").as("e8"),
        estMicro(16, "_sa", "_sb").as("e16"))
    def mae(e: String) =
      expr(s"(2 * sum(abs($e - jm)) + count(1)) div (2 * count(1))")
    pairs.groupBy(col("bin_lo"))
      .agg(count(lit(1)).as("n_pairs"),
        (mae("e4") / 1e6).as("mae_4"),
        (mae("e8") / 1e6).as("mae_8"),
        (mae("e16") / 1e6).as("mae_16"))
      .orderBy(col("bin_lo"))
  }

  private lazy val q156Sql = {
    def est(h: Int) = {
      val agree = (0 until h).map(i =>
        s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"CAST(round(round(($agree) / $h.0, 6) * 1e6, 0) AS BIGINT)"
    }
    def mae(e: String) =
      s"((2 * sum(abs($e - jm)) + count(*)) // (2 * count(*))) / 1e6"
    s"""
    WITH ${OracleSql.exactPairsCtes},
    nd AS (SELECT doc_id, ${OracleSql.normSql} AS n FROM documents),
    sigx AS (SELECT doc_id,
               ${OracleSql.minhashSigSelect(SweepHashes, SweepK)}
             FROM nd),
    pe AS (SELECT floor(ex.jaccard * 20) / 20.0 AS bin_lo,
             CAST(round(ex.jaccard * 1e6, 0) AS BIGINT) AS jm,
             ${est(4)} AS e4, ${est(8)} AS e8, ${est(16)} AS e16
           FROM ex
             JOIN sigx sa ON sa.doc_id = ex.id_a
             JOIN sigx sb ON sb.doc_id = ex.id_b)
    SELECT bin_lo, CAST(count(*) AS BIGINT) AS n_pairs,
           ${mae("e4")} AS mae_4, ${mae("e8")} AS mae_8,
           ${mae("e16")} AS mae_16
    FROM pe GROUP BY bin_lo ORDER BY bin_lo"""
  }

  // ------------------------------------------------------------------ q157
  // Winnow window sweep: selection density at w ∈ {4, 8, 16} against
  // the 2/(w+1) theory (Schleimer/Wilkerson/Aiken 2003 §4 — expected
  // density of window-min selection over random hashes). The third leg
  // of the hyperparameter-evidence trilogy: q148 = does the LSH banding
  // FIND pairs, q156 = how precisely does each MinHash width SCORE
  // them, q157 = how much fingerprint storage does each winnow window
  // BUY (density ↓ with w) — with the guarantee bound (every ≥ k+w−1
  // word run shares a print) trading against it. Scale shape: three
  // scan-local selection passes over the session words artifact,
  // aggregated onto 3 keys.
  private val q157: Q = (s, d) => {
    // hash every gram ONCE (k is fixed across the sweep — only the
    // window min differs), pin the hash arrays, then run the three
    // scan-local window-min selections over the same artifact
    val k = 4 // Pipeline16.WinK, the board-wide winnow gram width
    val wc0 = col("words")
    val ha = GramMemo.words(s, d).select(col("doc_id"),
        greatest(size(wc0) - (k - 1), lit(0)).cast("long").as("n_grams"),
        when(size(wc0) >= k, transform(
          sequence(lit(0), size(wc0) - k),
          i => substring(md5(to_binary(
            array_join(slice(wc0, i + 1, lit(k)), " "),
            lit("utf-8"))), 1, 16)))
          .otherwise(array().cast("array<string>")).as("_ha"))
      .localCheckpoint()
    val per = Seq(4, 8, 16).map { w =>
      ha.select(lit(w.toLong).as("w"),
        greatest(col("n_grams") - (w - 1), lit(0L)).as("n_windows"),
        when(size(col("_ha")) >= w,
          size(array_distinct(transform(
            sequence(lit(0), size(col("_ha")) - w),
            p => array_min(slice(col("_ha"), p + 1, lit(w)))))))
          .otherwise(0).cast("long").as("n_fps"))
    }.reduce(_ unionByName _)
    per.groupBy(col("w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_windows")).as("total_windows"),
        sum(col("n_fps")).as("total_fps"))
      .select(col("w"), col("n_docs"), col("total_windows"),
        col("total_fps"),
        round(col("total_fps").cast("double") / col("total_windows"), 6)
          .as("density"),
        round(lit(2.0) / (col("w") + 1), 6).as("theory_density"))
      .orderBy(col("w"))
  }

  private lazy val q157Sql = {
    val k = 4 // the board-wide winnow gram width (Pipeline16.WinK)
    def leg(w: Int) = s"""
      SELECT $w AS w,
             greatest(greatest(len(ww) - ${k - 1}, 0) - ${w - 1}, 0)
               AS n_windows,
             CASE WHEN len(ww) >= ${k + w - 1} THEN
               len(list_distinct(list_transform(
                 generate_series(0, len(ww) - ${k + w - 1}),
                 p -> list_min(list_transform(
                   generate_series(p, p + ${w - 1}),
                   i -> substr(md5(array_to_string(ww[i+1:i+$k], ' ')),
                               1, 16))))))
             ELSE 0 END AS n_fps
      FROM base"""
    s"""
    WITH nd AS (SELECT doc_id, ${OracleSql.normSql} AS n FROM documents),
    base AS (SELECT doc_id, string_split(n, ' ') AS ww FROM nd),
    per AS (${Seq(4, 8, 16).map(leg).mkString("\n      UNION ALL\n")})
    SELECT CAST(w AS BIGINT) AS w,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_windows) AS BIGINT) AS total_windows,
           CAST(sum(n_fps) AS BIGINT) AS total_fps,
           round(CAST(sum(n_fps) AS DOUBLE) / sum(n_windows), 6)
             AS density,
           round(2.0 / (w + 1), 6) AS theory_density
    FROM per GROUP BY w ORDER BY w"""
  }

  // ------------------------------------------------------------------ q158
  // Per-event-type value CI — the batch audit of the SAME exact
  // integer math the streaming monitor emits live
  // ([[graft.streaming.EventStreams.windowedValueCi]]). The batch form
  // uses the fast two-stage shape (combine onto (type, replica) keys,
  // then rank the B-row-per-type means — each replica mean is the same
  // exact integer either way); the streaming side keeps the
  // single-aggregation conditional-column form Structured Streaming
  // requires, and StreamingSpec pins the two shapes equal on one
  // fixture. Measured: the 2·B-conditional-column aggregate reads
  // every exploded row through 66 aggregate updates — ~6x the
  // two-stage batch shape — which is the price ONLY the streaming
  // engine needs to pay. Zero-weight replicas (P = e^-n per group)
  // drop from the ranked set in both engines (the q154 rule).
  private val q158: Q = (s, d) => {
    import graft.ops.PoissonBoot
    // NOT checkpointed: the two consumers re-read a 3-column pruned
    // parquet scan, which is cheaper than materializing a checkpoint
    // (measured; the corpus-sized artifacts earn their pins, a narrow
    // event scan does not)
    // spread the narrow pre-explode rows: the x32 replica explode and
    // its md5s inherit the scan's partitioning, and the single-row-group
    // driver file yields ONE task — an n-row exchange unlocks 32n work
    // (Tables.spread ratio argument)
    val base = spread(s, eventsMicros(s, d)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 1e6, 0).cast("long").as("vm")))
    val rep = base
      .select(col("event_type"), col("event_id"), col("vm"),
        explode(sequence(lit(0), lit(PoissonBoot.B - 1))).as("b"))
      .withColumn("u", PoissonBoot.u52(col("event_id"), col("b")))
      .withColumn("w", expr(PoissonBoot.weightSql("u")).cast("long"))
      .groupBy(col("event_type"), col("b"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("vm")).as("swq"))
      .select(col("event_type"),
        expr("CASE WHEN sw > 0 THEN (CASE WHEN swq < 0 THEN -1 ELSE 1 END) * " +
          "((2 * abs(swq) + sw) div (2 * sw)) END")
          .as("mean_micro"))
      .filter(col("mean_micro").isNotNull)
    val wc = Window.partitionBy(col("event_type"))
      .orderBy(col("mean_micro"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col("event_type"))
    val ci = rep
      .withColumn("r", count(lit(1)).over(wc))
      .withColumn("nz", count(lit(1)).over(wt))
      .groupBy(col("event_type"))
      .agg(
        min(when(col("r") >= expr("(nz * 25 + 999) div 1000"),
          col("mean_micro"))).as("lo_micro"),
        min(when(col("r") >= expr("(nz * 975 + 999) div 1000"),
          col("mean_micro"))).as("hi_micro"))
    base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        expr("(CASE WHEN sum(vm) < 0 THEN -1 ELSE 1 END) * " +
        "((2 * abs(sum(vm)) + count(1)) div (2 * count(1)))").as("pm"))
      .join(ci, Seq("event_type"))
      .select(col("event_type"), col("n_events"),
        (col("pm") / 1e6).as("mean_value"),
        (col("lo_micro") / 1e6).as("ci_lo"),
        (col("hi_micro") / 1e6).as("ci_hi"))
      .orderBy(col("event_type"))
  }

  private lazy val q158Sql = {
    s"""
    WITH base AS (SELECT event_type, event_id,
                    CAST(round(value * 1e6, 0) AS BIGINT) AS vm
                  FROM events),
    rep AS (SELECT base.event_type, b.b, base.vm,
              ${weightDuckSql(
        graft.ops.PoissonBoot.u52DuckSql("base.event_id", "b.b"))} AS w
            FROM base, (SELECT unnest(generate_series(0, ${BootB - 1}))
                        AS b) b),
    means AS (SELECT event_type, b,
                (CASE WHEN sum(w * vm) < 0 THEN -1 ELSE 1 END) *
                ((2 * abs(sum(w * vm)) + sum(w)) // (2 * sum(w))) AS mean_micro
              FROM rep GROUP BY event_type, b HAVING sum(w) > 0),
    ranked AS (SELECT event_type, mean_micro, row_number() OVER
                 (PARTITION BY event_type ORDER BY mean_micro) AS r,
                 count(*) OVER (PARTITION BY event_type) AS nz
               FROM means),
    ci AS (SELECT event_type,
             min(CASE WHEN r >= (nz * 25 + 999) // 1000
               THEN mean_micro END) AS lo_micro,
             min(CASE WHEN r >= (nz * 975 + 999) // 1000
               THEN mean_micro END) AS hi_micro
           FROM ranked GROUP BY event_type),
    pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             (CASE WHEN sum(vm) < 0 THEN -1 ELSE 1 END) *
             ((2 * abs(sum(vm)) + count(*)) // (2 * count(*))) AS pm
           FROM base GROUP BY event_type)
    SELECT pt.event_type, n_events,
           pm / 1e6 AS mean_value,
           lo_micro / 1e6 AS ci_lo, hi_micro / 1e6 AS ci_hi
    FROM pt JOIN ci ON ci.event_type = pt.event_type
    ORDER BY pt.event_type"""
  }

  val queries: Map[String, Q] = Map(
    "q154_bootstrap_ci" -> q154,
    "q155_source_ci" -> q155,
    "q156_minhash_width_sweep" -> q156,
    "q157_winnow_window_sweep" -> q157,
    "q158_value_ci" -> q158)

  val oracleSql: Map[String, String] = Map(
    "q154_bootstrap_ci" -> q154Sql,
    "q155_source_ci" -> q155Sql,
    "q156_minhash_width_sweep" -> q156Sql,
    "q157_winnow_window_sweep" -> q157Sql,
    "q158_value_ci" -> q158Sql)
}
