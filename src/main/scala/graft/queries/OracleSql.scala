package graft.queries

import java.time.LocalDate
import graft.core.BrCalendar

/** Shared DuckDB oracle-SQL fragments. The oracles of different queries
  * must stay BIT-IDENTICAL where they model the same semantics (q20 vs
  * q23/q25 business days, q33 vs q43 simhash signatures) — one generator
  * each, so a fix cannot silently leave a copy stale.
  */
private[queries] object OracleSql {

  /** Normalized text: lowercase, collapsed whitespace, trimmed — the SQL
    * mirror of TextOps.normalize.
    */
  val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Closed-form weekday count in [a, b) for a <= b:
    * n - #saturdays - #sundays, where the count of weekday w (0=Mon) is
    * (n - offset + 6) // 7 with offset = (w - dow(a) + 7) % 7.
    */
  def wdCountSql(a: String, b: String): String = {
    def dowCount(w: Int) =
      s"((date_diff('day', $a, $b) - (($w - (isodow($a) - 1) + 7) % 7) + 6) // 7)"
    s"(date_diff('day', $a, $b) - ${dowCount(5)} - ${dowCount(6)})"
  }

  /** Old-regime weekday holidays in [loYear, hiYear) as a SQL list
    * literal; the caller picks a window covering its date range.
    */
  def holidayListSql(loYear: Int, hiYear: Int): String = {
    val lo = LocalDate.of(loYear, 1, 1).toEpochDay.toInt
    val hi = LocalDate.of(hiYear, 1, 1).toEpochDay.toInt
    BrCalendar.holidaysOld
      .filter(e => e >= lo && e < hi && BrCalendar.isWeekday(e))
      .map(e => s"DATE '${LocalDate.ofEpochDay(e.toLong)}'")
      .mkString("[", ", ", "]")
  }

  def holCountSql(holidayList: String, a: String, b: String): String =
    s"len(list_filter($holidayList, h -> h >= $a AND h < $b))"

  def bdaysSql(holidayList: String, a: String, b: String): String =
    s"(${wdCountSql(a, b)} - ${holCountSql(holidayList, a, b)})"

  /** SQL mirror of [[graft.core.Num.truncar]] — truncation toward zero at
    * `d` places on the double's SHORTEST DECIMAL REPRESENTATION. DuckDB's
    * CAST(DOUBLE AS VARCHAR) is shortest-repr (Ryū digits, same unique
    * digit string Java's Double.toString produces), so string surgery on
    * the cast reproduces Java's BigDecimal.valueOf(x).setScale(d, DOWN)
    * exactly; the string form also truncates negatives toward zero for
    * free. DuckDB only switches to e-notation below 1e-4 — far under the
    * magnitudes the bond chains truncate — but if it ever appears the
    * branch fails LOUDLY instead of mis-truncating.
    */
  def truncSrSql(x: String, d: Int): String = {
    val s = s"CAST(($x) AS VARCHAR)"
    s"""CAST(CASE WHEN contains($s, 'e')
           THEN error('trunc_sr e-notation: ' || $s)
         WHEN NOT contains($s, '.') THEN $s
         ELSE split_part($s, '.', 1) || '.' ||
              substr(split_part($s, '.', 2), 1, $d)
       END AS DOUBLE)"""
  }

  /** SQL mirror of [[graft.core.Num.roundPolars]] at 12 places:
    * rint(x*1e12)/1e12 with ties-to-even. The scale/divide are plain IEEE
    * ops (identical in both engines); rint is emulated as floor(y + 0.5)
    * with an explicit ties-to-even branch. y + 0.5 is EXACT here: the PV
    * magnitudes keep y < 2^41, so ulp(y) divides 0.5. Positive inputs
    * only (bond PVs).
    */
  def rint12Sql(x: String): String = {
    val y = s"(($x) * 1000000000000.0)"
    s"""((CASE WHEN $y - floor($y) = 0.5
           THEN floor($y) + CAST(CAST(floor($y) AS BIGINT) % 2 AS DOUBLE)
           ELSE floor($y + 0.5) END) / 1000000000000.0)"""
  }

  /** MinHash signature component `seed` over the normalized text `n`
    * (char-k-shingles → lexicographic min of an 8-hex-char slice of
    * md5(digest|shingle), where digest = seed/4 and the slice is seed%4)
    * — the SQL mirror of DedupOps.minhashOfShingles / MinHashSig.
    * Shared by q31/q32/q50. Four signature components share one md5
    * digest (distinct 32-bit hex ranges give four approximately
    * independent orderings), quartering the hash work per shingle vs a
    * digest per seed.
    */
  def minhashSql(seed: Int, k: Int): String =
    s"""list_min(list_transform(
          list_distinct(list_transform(
            generate_series(1, greatest(length(n) - ${k - 1}, 1)),
            i -> substr(n, i, $k))),
          x -> substr(md5('${seed / 4}' || '|' || x), ${(seed % 4) * 8 + 1}, 8)))"""

  /** `m0..m{numHashes-1}` select-list fragment over the `nd` CTE. */
  def minhashSigSelect(numHashes: Int, k: Int): String =
    (0 until numHashes).map(i => s"${minhashSql(i, k)} AS m$i")
      .mkString(", ")

  /** The banded `bands` CTE body (UNION ALL of per-band keys over `sig`)
    * — the SQL mirror of DedupOps.bandKey over adjacent pairs.
    */
  def minhashBandsSql(numBands: Int, suffix: String = ""): String =
    (0 until numBands).map { bnd =>
      val x = bnd * 2; val y = bnd * 2 + 1
      s"SELECT doc_id, md5('$bnd' || '|' || m$x || '|' || m$y) AS band FROM sig$suffix"
    }.mkString("\n      UNION ALL\n      ")

  /** Signature-agreement count between `sig` aliases `a` and `b` (the
    * MinHash Jaccard estimator's numerator) — shared by q61 and q81.
    */
  def sigAgreeSql(numHashes: Int): String = (0 until numHashes).map(i =>
    s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")

  /** Distinct word-n-grams over word list `w` — the SQL mirror of
    * NGramJaccard / DedupOps.ngramsOfWords gram construction (final slice
    * clamps, so short texts yield the whole word list as the single
    * gram). n=3 shared by q34/q50; n=8 by q56.
    */
  def gramsSql(n: Int): String =
    s"""list_distinct(list_transform(
         generate_series(0, greatest(len(w) - $n, 0)),
         i -> array_to_string(w[i+1:i+$n], ' ')))"""

  val grams3Sql: String = gramsSql(3)

  /** Quality score over `len`/`alpha`/`punct`/`nws` columns (an `sc`-style
    * CTE) — the SQL mirror of TextOps.qualityScore. Shared by q38/q48/q55.
    */
  val qualitySql: String =
    """round(
               (CASE WHEN len > 0 THEN alpha / len ELSE 0.0 END) * 0.5
               + (CASE WHEN (CASE WHEN nws > 0 THEN alpha / nws ELSE 0.0 END)
                         BETWEEN 3 AND 10 THEN 1.0 ELSE 0.0 END) * 0.3
               + (CASE WHEN (CASE WHEN len > 0 THEN punct / len ELSE 0.0 END)
                         <= 0.1 THEN 1.0 ELSE 0.0 END) * 0.2, 6)"""

  /** The length/alpha/punct/whitespace-token columns [[qualitySql]] reads,
    * as a select-list fragment over `documents`' `text`.
    */
  val qualityScColsSql: String =
    """CAST(length(text) AS DOUBLE) AS len,
             CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha,
             CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS punct,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS nws"""

  /** Per-language stopword/CJK count columns (`en de es fr zh`) as a
    * select-list fragment over `documents`' `text` — the SQL mirror of
    * the TextStats language scores. Shared by q37/q48/q75 with
    * [[langCaseSql]].
    */
  lazy val langCountsSql: String = {
    import graft.text.TextOps
    def cnt(pat: String, src: String = "lower(text)") =
      s"len(regexp_extract_all($src, '$pat'))"
    s"""${cnt(TextOps.EnPat)} AS en, ${cnt(TextOps.DePat)} AS de,
             ${cnt(TextOps.EsPat)} AS es, ${cnt(TextOps.FrPat)} AS fr,
             ${cnt(TextOps.CjkPat, "text")} AS zh"""
  }

  /** The lang-ID precedence cascade over [[langCountsSql]]'s columns —
    * the SQL mirror of TextOps.langId.
    */
  val langCaseSql: String =
    """CASE WHEN zh > 0 THEN 'zh'
                WHEN en >= es AND en >= fr AND en >= de AND en > 0 THEN 'en'
                WHEN es >= fr AND es >= de AND es > 0 THEN 'es'
                WHEN fr >= de AND fr > 0 THEN 'fr'
                WHEN de > 0 THEN 'de'
                ELSE 'und' END"""

  /** The BM25 scoring CTE chain (`toks dl consts qt dfs tf term scores`)
    * over `documents` for a fixed term set — the SQL mirror of
    * [[graft.text.Retrieval.bm25Scores]]; `scores` is (doc_id, score)
    * rounded to 6 decimals. Shared by q93/q109. Splice after WITH.
    */
  def bm25ScoresSql(terms: Seq[String], k1: Double, b: Double): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""toks AS (SELECT doc_id,
        unnest(string_split($normSql, ' ')) AS w
      FROM documents),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    consts AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                      (SELECT avg(dl) FROM dl) AS avgdl),
    qt AS (SELECT doc_id, w FROM toks WHERE w IN ($inList)),
    dfs AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM qt GROUP BY w),
    tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS f
           FROM qt GROUP BY doc_id, w),
    term AS (SELECT tf.doc_id,
        ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
          (f * ($k1 + 1.0)) /
          (f + $k1 * (1.0 - $b + $b * dl.dl / avgdl)) AS ts
      FROM tf JOIN dl ON tf.doc_id = dl.doc_id
        JOIN dfs ON tf.w = dfs.w
        CROSS JOIN consts),
    scores AS (SELECT doc_id, round(sum(ts), 6) AS score
               FROM term GROUP BY doc_id)"""
  }

  /** Rounded word-3-gram Jaccard over gram lists `$a` and `$b` — the SQL
    * mirror of DedupOps.jaccardOfTexts (round 6).
    */
  def jaccard3Sql(a: String, b: String): String =
    s"""round(CASE WHEN (len($a) + len($b)
           - len(list_filter($a, x -> list_contains($b, x)))) > 0
         THEN CAST(len(list_filter($a, x -> list_contains($b, x)))
                   AS DOUBLE)
              / CAST(len($a) + len($b)
                - len(list_filter($a, x -> list_contains($b, x)))
                AS DOUBLE)
         ELSE 0.0 END, 6)"""

  /** The `width` simhash bit terms over word-hash list `hs` and word
    * list `ws` (bit j set when the count of words whose j-th md5 hex
    * digit has its high bit set exceeds half the words) — bit j depends
    * only on nibble j, so the width-w signature is the low w bits of
    * any wider one (the engine's nibble-nesting property).
    */
  def simhashBitsSqlW(width: Int): String = (0 until width).map { j =>
    s"""(CASE WHEN 2 * len(list_filter(hs,
           h -> substr(h, ${j + 1}, 1) IN ('8','9','a','b','c','d','e','f')))
         > len(ws) THEN ${1 << j} ELSE 0 END)"""
  }.mkString(" + ")

  /** The 16 simhash bit terms — the q33 signature (fixed width 16). */
  val simhashBitsSql: String = simhashBitsSqlW(16)

  /** The `sig` CTE producing (doc_id, simhash) from `documents` — the
    * fixed-width-16 chain of the q33 oracle.
    */
  val simhashSigCtes: String = s"""
    WITH nd AS (SELECT doc_id, $normSql AS n FROM documents),
    t AS (SELECT doc_id, list_distinct(string_split(n, ' ')) AS ws FROM nd),
    h AS (SELECT doc_id, ws, list_transform(ws, w -> md5(w)) AS hs FROM t),
    sig AS (SELECT doc_id, CAST($simhashBitsSql AS INTEGER) AS simhash FROM h)"""

  /** The corpus-size-derived simhash width, as SQL: the exact mirror of
    * [[graft.dedup.DedupOps.adaptiveSimhashWidth]] — clamp(16,
    * ceil(log2 n) + 8, 31) with ceil-log2 computed INTEGER-exactly as
    * `length(bin(n - 1))` (a float `ceil(log2(n))` could disagree with
    * the engine by one ulp at exact powers of two).
    */
  val simhashWidthSql: String =
    """least(31, greatest(16,
       CAST(length(bin(count(*) - 1)) AS INTEGER) + 8))"""

  /** The Hamming radius paired with the adaptive width — the SQL mirror
    * of [[graft.dedup.DedupOps.adaptiveSimhashDist]] (3 above the
    * 16-bit floor, 2 at it; the rule SIMHASH_RECALL.json's measured
    * recall curve picks). `w` is the integer width column of the
    * width-selecting CTE (`wsel`/`swsel`), so both engines branch on
    * the SAME integer-exact width.
    */
  def simhashDistSql(wRef: String): String =
    s"(CASE WHEN $wRef > 16 THEN 3 ELSE 2 END)"

  /** The `sig` CTE chain producing (doc_id, simhash) at the
    * CORPUS-ADAPTIVE width — the q43/q136 signature: the full 31-bit
    * nibble-nested signature masked down to the width the corpus count
    * selects, exactly what the engine's `SimHashSig(width = w)`
    * computes directly.
    */
  val simhashSigCtesAdaptive: String = s"""
    WITH nd AS (SELECT doc_id, $normSql AS n FROM documents),
    t AS (SELECT doc_id, list_distinct(string_split(n, ' ')) AS ws FROM nd),
    h AS (SELECT doc_id, ws, list_transform(ws, w -> md5(w)) AS hs FROM t),
    wsel AS (SELECT $simhashWidthSql AS w FROM documents),
    sigf AS (SELECT doc_id,
               CAST(${simhashBitsSqlW(31)} AS BIGINT) AS sf FROM h),
    sig AS (SELECT doc_id,
              CAST(sf & ((CAST(1 AS BIGINT) << w) - 1) AS INTEGER)
                AS simhash
            FROM sigf, wsel)"""

  /** The full text near-dup clustering CTE chain (MinHash signatures →
    * banded LSH candidates → exact 3-gram Jaccard verify → recursive
    * min-label propagation → `cc(doc_id, cluster_id)`), WITHOUT the
    * leading `WITH RECURSIVE` — the shared prefix of q50 and q63.
    */
  def textClusterCtes(threshold: Double, numHashes: Int = 8, k: Int = 5,
                      numBands: Int = 4, nGram: Int = 3,
                      suffix: String = ""): String = s"""
    nd$suffix AS (SELECT doc_id, $normSql AS n FROM documents),
    sig$suffix AS (SELECT doc_id, ${minhashSigSelect(numHashes, k)}
                   FROM nd$suffix),
    bands$suffix AS (
      ${minhashBandsSql(numBands, suffix)}),
    cand$suffix AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands$suffix a JOIN bands$suffix b
        ON a.band = b.band AND a.doc_id < b.doc_id),
    wt$suffix AS (SELECT doc_id, string_split($normSql, ' ') AS w
           FROM documents),
    g$suffix AS (SELECT doc_id, ${gramsSql(nGram)} AS gr FROM wt$suffix),
    edges$suffix AS (
      SELECT id_a, id_b
      FROM cand$suffix
        JOIN g$suffix ga ON ga.doc_id = id_a
        JOIN g$suffix gb ON gb.doc_id = id_b
      WHERE ${jaccard3Sql("ga.gr", "gb.gr")} >= $threshold),
    sym$suffix AS (
      SELECT id_a AS a, id_b AS b FROM edges$suffix
      UNION ALL
      SELECT id_b AS a, id_a AS b FROM edges$suffix),
    lbl$suffix AS (
        SELECT doc_id AS id, doc_id AS l FROM documents
      UNION
        SELECT s.a AS id, lbl$suffix.l AS l
        FROM lbl$suffix JOIN sym$suffix s ON s.b = lbl$suffix.id
        WHERE lbl$suffix.l < s.a),
    cc$suffix AS (SELECT id AS doc_id, min(l) AS cluster_id
                  FROM lbl$suffix GROUP BY id)"""

  /** The Bloom-prescan CTE chain (normalized words → distinct n-grams →
    * eval gram set → bit positions → corpus (doc, gram) probe rows with
    * their K positions), WITHOUT the leading `WITH` — the shared prefix
    * of q67 and q70. Produces CTEs `nd g ev bits cg pr`; consumers add
    * their own join/aggregate over `pr` vs `bits`/`ev`.
    */
  def bloomPrescanCtes(n: Int, evalMod: Int): String = {
    import graft.dedup.Bloom
    s"""nd AS (
      SELECT doc_id, string_split($normSql, ' ') AS w
      FROM documents),
    g AS (SELECT doc_id, ${gramsSql(n)} AS gr FROM nd),
    ev AS (SELECT DISTINCT unnest(gr) AS gram FROM g
           WHERE doc_id % $evalMod = 0),
    bits AS (
      SELECT DISTINCT unnest(${Bloom.positionsArraySql("gram")}) AS pos
      FROM ev),
    cg AS (SELECT doc_id, unnest(gr) AS gram FROM g
           WHERE doc_id % $evalMod <> 0),
    pr AS (SELECT doc_id, gram,
             ${(0 until Bloom.K).map(j =>
               s"${Bloom.positionSql("gram", j)} AS p$j").mkString(", ")}
           FROM cg)"""
  }

  /** The K `LEFT JOIN bits bJ ON pr.pJ = bJ.pos` clauses over
    * [[bloomPrescanCtes]]'s `pr`, and the all-positions-present predicate.
    */
  def bloomJoinsSql: String = (0 until graft.dedup.Bloom.K)
    .map(j => s"LEFT JOIN bits b$j ON pr.p$j = b$j.pos")
    .mkString("\n        ")

  def bloomHitSql: String = (0 until graft.dedup.Bloom.K)
    .map(j => s"b$j.pos IS NOT NULL").mkString(" AND ")

  /** Rounded 64-dim cosine between list expressions `a` (cast per
    * element) and `b` (already double) — the SQL mirror of DotCosine's
    * sequential fold. Shared by q68/q70/q72.
    */
  def cos64Sql(a: String, b: String): String =
    s"""round(list_sum(list_transform(generate_series(1, 64),
          i -> CAST($a[i] AS DOUBLE) * $b[i]))
        / (sqrt(list_sum(list_transform($a,
             v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
         * sqrt(list_sum(list_transform($b, v -> v * v)))), 6)"""

  /** Per-label centroid CTE chain over `embeddings` (element-wise mean
    * rounded to 6) — the SQL mirror of Similarity.groupCentroids, WITHOUT
    * the leading `WITH`. Produces `e x c`; shared by q68 and q70.
    */
  val centroidCtes: String = """e AS (
      SELECT vec_id, label, embedding FROM embeddings),
    x AS (
      SELECT label, i, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
      FROM e, generate_series(1, 64) t(i) GROUP BY label, i),
    c AS (SELECT label, list(m ORDER BY i) AS centroid FROM x GROUP BY label)"""

  /** The int8 code of element expression `x` given CTE columns `mn`/`sc`
    * — the SQL mirror of QuantizeInt8's floor(y+0.5) clamp. Shared by
    * q71 and q72.
    */
  def int8CodeSql(x: String): String = s"""(CASE WHEN sc = 0 THEN 0
           ELSE CAST(least(greatest(
             floor((CAST($x AS DOUBLE) - mn) / sc + 0.5), 0), 255) AS INTEGER)
           END)"""

  /** The quantization range CTE chain over `embeddings` (per-vector
    * min/max/scale + a finiteness flag), WITHOUT the leading `WITH` —
    * produces `e r s`; consumers derive codes via [[int8CodeSql]].
    * Shared by q71 and q72.
    */
  val quantizeCtes: String = """e AS (SELECT vec_id, embedding FROM embeddings),
    r AS (
      SELECT vec_id, embedding,
             list_min(list_transform(embedding, x -> CAST(x AS DOUBLE)))
               AS mn,
             list_max(list_transform(embedding, x -> CAST(x AS DOUBLE)))
               AS mx,
             len(list_filter(embedding,
               x -> NOT isfinite(CAST(x AS DOUBLE)))) > 0 AS nonfinite
      FROM e),
    s AS (SELECT *, (mx - mn) / 255.0 AS sc FROM r)"""

  /** The low-`nBits` hyperplane-sign sum over an `embedding` column — the
    * SQL mirror of HyperplaneSketch16 restricted to planes j < nBits
    * (each plane is an independent additive term, so the 8-bit sum equals
    * `sketch16 & 255`). Shared by q46/q54 (16) and q78 (8).
    */
  def hyperplaneBitsSql(nBits: Int): String = (0 until nBits).map { j =>
    s"""(CASE WHEN list_sum(list_transform(generate_series(1,64),
            i -> CAST(embedding[i] AS DOUBLE) *
              (CASE WHEN substr(md5($j || '|' || (i-1)),1,1)
                 IN ('8','9','a','b','c','d','e','f')
               THEN 1.0 ELSE -1.0 END))) > 0 THEN ${1 << j} ELSE 0 END)"""
  }.mkString(" + ")

  /** Rounded 64-dim cosine between the `embedding` columns of relation
    * aliases `a` and `b` (both sides cast per element) — the pair form of
    * [[cos64Sql]], the SQL mirror of DotCosine. Shared by q46/q54/q78.
    */
  def cosPairSql(a: String, b: String): String =
    s"""round(list_sum(list_transform(generate_series(1, 64),
               i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform($a.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform($b.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)"""

  /** The trigram-LM scoring CTE chain over `documents` (full-corpus
    * add-one-smoothed model, per-doc mean log-prob rounded 6) — ends
    * with `sc(doc_id, n_tri, s)`; WITHOUT the leading `WITH`. Shared by
    * q87 and q153 so the two oracles cannot drift.
    */
  val lmScoreCtes: String = s"""nd AS (SELECT doc_id, $normSql AS n FROM documents),
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
           FROM tri JOIN lp USING (tri) GROUP BY doc_id)"""

  /** The exact prefix-filtered (PPJoin) J >= 0.5 pair chain over
    * `documents` — ends with `ex(id_a, id_b, jaccard)`; WITHOUT the
    * leading `WITH`. The SQL mirror of ClusterMemo.exactPairs, shared
    * by q148 and q156 so the ground truth cannot drift.
    */
  lazy val exactPairsCtes: String = s"""ndx AS (SELECT doc_id,
              string_split($normSql, ' ') AS w
            FROM documents),
    gx AS (SELECT doc_id, $grams3Sql AS gr FROM ndx),
    dg AS (SELECT doc_id, md5(gram) AS gk
           FROM (SELECT doc_id, unnest(gr) AS gram FROM gx)),
    dfs AS (SELECT gk, count(*) AS df FROM dg GROUP BY gk),
    rankedx AS (SELECT doc_id, array_agg(gk ORDER BY df, gk) AS rare
               FROM dg JOIN dfs USING (gk) GROUP BY doc_id),
    prex AS (SELECT doc_id, unnest(rare[1 : CAST(len(rare) -
              ceil(0.5 * len(rare)) + 1 AS INTEGER)]) AS gk
            FROM rankedx),
    candx AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM prex a JOIN prex b
                ON a.gk = b.gk AND a.doc_id < b.doc_id),
    ex AS (SELECT id_a, id_b, jaccard FROM
             (SELECT id_a, id_b,
                round(CAST(len(list_intersect(ga.gr, gb.gr)) AS DOUBLE) /
                  len(list_distinct(ga.gr || gb.gr)), 6) AS jaccard
              FROM candx
                JOIN gx ga ON ga.doc_id = id_a
                JOIN gx gb ON gb.doc_id = id_b)
           WHERE jaccard >= 0.5)"""

  /** The `sk`/`pairs` CTE bodies mirroring Similarity.nearDupPairs over
    * `embeddings` (md5-parity hyperplane-sign sketch → Hamming ≤ 2
    * candidates → exact rounded cosine), WITHOUT the leading `WITH` so a
    * caller can prepend `WITH` or `WITH RECURSIVE`. Shared by q46/q54.
    */
  val embeddingPairsCtes: String =
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
    sk AS (SELECT vec_id, embedding, CAST(${hyperplaneBitsSql(16)} AS INTEGER) AS sketch FROM e),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             bit_count(xor(a.sketch, b.sketch)) AS hamming,
             ${cosPairSql("a", "b")} AS sim
      FROM sk a JOIN sk b ON a.vec_id < b.vec_id
      WHERE bit_count(xor(a.sketch, b.sketch)) <= 2)"""
}
