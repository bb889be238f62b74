package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Batch fifteen: corpus statistics that drive TOKENIZER and MIXTURE
  * decisions (q114 collocation mining, q115 vocabulary-coverage curves)
  * plus graph-centrality coreset scoring over the embedding near-dup
  * graph (q116) — the "which docs are hubs of their semantic
  * neighborhood" signal a curation stack uses to pick cluster
  * representatives and to spot template farms (a doc with hundreds of
  * near-dup neighbors is boilerplate, not signal).
  */
object Pipeline15 {

  type Q = (SparkSession, String) => DataFrame
  import Tables._

  // ------------------------------------------------------------------ q114
  // PMI collocations: adjacent DIRECTIONAL bigrams scored by pointwise
  // mutual information ln(p(ab) / (p(a)p(b))) with a min-count support
  // floor — the phrase-mining pass (Mikolov et al. 2013 word2vec
  // phrases) that decides which word pairs a tokenizer should fuse.
  // Distinct from q74 (raw windowed co-occurrence counts): PMI
  // normalizes by the marginals, so "of the" (frequent but independent)
  // ranks below a genuinely associated pair.
  //
  // Scale shape: bigrams explode scan-local off the memoized words
  // artifact; pair and unigram counts are map-side-combinable aggs whose
  // exchanges carry vocab-bounded rows (vocab² worst case for pairs,
  // in practice the observed-bigram count), never corpus rows; the two
  // marginal joins ride the vocab-keyed tables; the scalar totals ride
  // ≤1-row broadcasts; and the top-30 is TakeOrdered (bounded k-heap),
  // not a global sort. Same shape at 100 TB.
  private val PmiMinCount = 20L
  private val PmiTopK = 30

  /** q114's core over an explicit (doc_id, words) frame — public for the
    * hand-fixture spec (planted collocation → exact PMI arithmetic).
    */
  def pmiCollocations(words: DataFrame, minCount: Long = PmiMinCount,
                      topK: Int = PmiTopK): DataFrame = {
    val w = col("words")
    val bg = words.filter(size(w) >= 2)
      .select(explode(zip_with(
        slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => struct(a.as("wa"), b.as("wb")))).as("p"))
      .select(col("p.wa").as("wa"), col("p.wb").as("wb"))
    val pc = bg.groupBy(col("wa"), col("wb")).agg(count(lit(1)).as("c_ab"))
    val uc = words.select(explode(w).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
    val np = pc.agg(sum(col("c_ab")).as("np"))
    val nw = uc.agg(sum(col("c")).as("nw"))
    pc.filter(col("c_ab") >= minCount)
      .join(uc.select(col("word").as("wa"), col("c").as("ca")), Seq("wa"))
      .join(uc.select(col("word").as("wb"), col("c").as("cb")), Seq("wb"))
      .crossJoin(broadcast(np)).crossJoin(broadcast(nw))
      .select(col("wa"), col("wb"), col("c_ab"),
        round(log((col("c_ab") / col("np")) /
          ((col("ca") / col("nw")) * (col("cb") / col("nw")))), 6).as("pmi"))
      .orderBy(desc("pmi"), col("wa"), col("wb"))
      .limit(topK)
  }

  private val q114: Q = (s, d) => pmiCollocations(GramMemo.words(s, d))

  private val q114Sql = s"""
    WITH nd AS (SELECT string_split(${OracleSql.normSql}, ' ') AS w
                FROM documents),
    bg AS (SELECT w[i] AS wa, w[i+1] AS wb
           FROM nd, unnest(generate_series(1, len(w) - 1)) t(i)
           WHERE len(w) >= 2),
    pc AS (SELECT wa, wb, count(*) AS c_ab FROM bg GROUP BY wa, wb),
    uc AS (SELECT unnest(w) AS word FROM nd),
    uq AS (SELECT word, count(*) AS c FROM uc GROUP BY word),
    np AS (SELECT sum(c_ab) AS np FROM pc),
    nw AS (SELECT sum(c) AS nw FROM uq)
    SELECT pc.wa, pc.wb, CAST(pc.c_ab AS BIGINT) AS c_ab,
           round(ln((pc.c_ab / np.np) /
             ((a.c / nw.nw) * (b.c / nw.nw))), 6) AS pmi
    FROM pc JOIN uq a ON a.word = pc.wa JOIN uq b ON b.word = pc.wb
    CROSS JOIN np CROSS JOIN nw
    WHERE pc.c_ab >= $PmiMinCount
    ORDER BY pmi DESC, pc.wa, pc.wb LIMIT $PmiTopK"""

  // ------------------------------------------------------------------ q115
  // Vocabulary-coverage curve: per language, the smallest vocabulary
  // size whose cumulative token mass reaches 50/90/99% — the number that
  // sizes a tokenizer's vocab budget and exposes a language whose long
  // tail a shared vocab would shred into bytes (the fertility problem).
  // Head words first, ties broken lexically, so the curve is
  // deterministic in both engines.
  //
  // Scale shape: one corpus scan into a (lang, word) count agg with
  // map-side combine — the only corpus-sized exchange carries
  // vocab × langs rows; the cumulative window then sorts VOCABULARY
  // rows per language (bounded by vocab size, not corpus size), and the
  // per-lang totals ride a ≤|langs|-row broadcast. Same shape at 100 TB.
  private val CoverageFracs = Seq(("v50", 0.5), ("v90", 0.9), ("v99", 0.99))

  /** q115's core over an explicit (lang, text) frame — public for the
    * hand-fixture spec (known distribution → exact breakpoints).
    */
  def vocabCoverage(docs: DataFrame): DataFrame =
    vocabCoverageOfWords(docs.select(col("lang"),
      split(TextOps.normalize(col("text")), " ").as("words")))

  /** [[vocabCoverage]] over an ALREADY-materialized (lang, words)
    * frame — the words artifact carries lang since r7.
    */
  def vocabCoverageOfWords(words: DataFrame): DataFrame = {
    val c = words
      .select(col("lang"), explode(col("words")).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("c"))
    val tot = c.groupBy(col("lang")).agg(sum(col("c")).as("tot"))
    val wnd = Window.partitionBy(col("lang"))
      .orderBy(desc("c"), col("word"))
    val cum = c
      .withColumn("rnk", row_number().over(wnd))
      .withColumn("cum", sum(col("c")).over(
        wnd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(tot), Seq("lang"))
    val covCols = CoverageFracs.map { case (name, f) =>
      min(when(col("cum") >= lit(f) * col("tot"), col("rnk")))
        .cast("long").as(name)
    }
    val aggCols = Seq(count(lit(1)).cast("long").as("vocab_size")) ++ covCols
    cum.groupBy(col("lang"))
      .agg(max(col("tot")).cast("long").as("total_tokens"), aggCols: _*)
      .orderBy(col("lang"))
  }

  private val q115: Q = (s, d) =>
    vocabCoverageOfWords(GramMemo.words(s, d))

  private val q115Sql = {
    val covSelects = CoverageFracs.map { case (name, f) =>
      s"CAST(min(CASE WHEN cum >= $f * tot THEN rnk END) AS BIGINT) AS $name"
    }.mkString(",\n           ")
    s"""
    WITH nd AS (SELECT lang, ${OracleSql.normSql} AS n FROM documents),
    sw AS (SELECT lang, unnest(string_split(n, ' ')) AS word FROM nd),
    c AS (SELECT lang, word, count(*) AS c FROM sw GROUP BY lang, word),
    tot AS (SELECT lang, sum(c) AS tot FROM c GROUP BY lang),
    cum AS (SELECT c.lang, c.c,
              row_number() OVER
                (PARTITION BY c.lang ORDER BY c.c DESC, c.word) AS rnk,
              sum(c.c) OVER
                (PARTITION BY c.lang ORDER BY c.c DESC, c.word
                 ROWS UNBOUNDED PRECEDING) AS cum,
              tot.tot
            FROM c JOIN tot USING (lang))
    SELECT lang, CAST(max(tot) AS BIGINT) AS total_tokens,
           CAST(count(*) AS BIGINT) AS vocab_size,
           $covSelects
    FROM cum GROUP BY lang ORDER BY lang"""
  }

  // ------------------------------------------------------------------ q116
  // Graph-centrality coreset scoring: PageRank (damping 0.85, 5 fixed
  // iterations, uniform teleport) over the embedding near-dup graph —
  // q54 clusters this graph; q116 ranks WITHIN it. High-centrality nodes
  // are the semantic hubs a coreset keeps (the representative of a dense
  // template neighborhood); isolated nodes keep the bare teleport mass.
  // Dangling mass is deliberately NOT redistributed: the score is a
  // ranking signal, not a probability (documented deviation from the
  // stochastic-matrix form; the graph is symmetric so every node with an
  // in-edge also has out-degree ≥ 1 and no rank leaks between ranked
  // nodes).
  //
  // Scale shape: edges come from the sketch-bucketed near-dup pass (all
  // equi-joins over the bounded 2^16 sketch space — never all-pairs);
  // the edge list is localCheckpointed once and each of the 5 iterations
  // is one edge-keyed equi-join + one map-side-combinable sum keyed by
  // node — the classic Pregel step as relational ops, linear in |E| per
  // iteration. Rank vectors are node-sized, never broadcast. Fixed
  // iteration count keeps the plan static (resident in one lineage) and
  // mirrors exactly into unrolled SQL.
  private val PrIters = 5
  private val PrDamping = 0.85
  private val PrSimThreshold = EmbMemo.Threshold

  /** q116's core over explicit node/edge frames — public for the
    * hand-fixture spec (star graph → hub dominance, symmetric pair →
    * equal ranks). `edges` must be one row per undirected pair (a < b).
    */
  def pagerank(nodes: DataFrame, edges: DataFrame, iters: Int = PrIters,
               damping: Double = PrDamping): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // pin the iteration-invariant structures ONCE (r11, guide §2.4):
    // un-pinned, every one of the `iters` iterations re-derived
    // (sym ⋈ deg) and re-scanned the node table — the before-plan
    // carried 12 node scans, 30 SortMergeJoins and 46 exchanges for 5
    // iterations; pinned, each iteration is one join against the
    // checkpointed edge structure + one node-keyed sum, the Pregel
    // step the header promises. At 100 TB the node re-scans are
    // corpus scans — this is the difference between 5·|E| work and
    // 5·(corpus scan + |E| join build).
    val contribBase = sym.join(deg, Seq("src")).localCheckpoint()
    val n = nodes.count().toDouble
    val nodeIds = nodes.select(col("id")).localCheckpoint()
    var pr = nodeIds.select(col("id"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = contribBase
        .join(pr.select(col("id").as("src"), col("pr")), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("pr") / col("d")).as("m"))
      pr = nodeIds
        .join(contrib.select(col("dst").as("id"), col("m")), Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("m"), lit(0.0))).as("pr"))
    }
    pr.join(deg.select(col("src").as("id"), col("d")), Seq("id"), "left")
      .select(col("id"), coalesce(col("d"), lit(0L)).as("degree"),
        round(col("pr"), 6).as("pr"))
      .orderBy(col("id"))
  }

  private val q116: Q = (s, d) => {
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val edges = EmbMemo.pairs(s, d).select(col("id_a"), col("id_b"))
    pagerank(emb.select(col("vec_id").as("id")), edges)
      .withColumnRenamed("id", "vec_id")
  }

  private lazy val q116Sql = {
    // unrolled fixed-iteration PageRank: r0..r{PrIters} CTEs generated
    // mechanically, each one edge join + grouped sum — the exact mirror
    // of the Spark loop.
    val iterCtes = (1 to PrIters).map { i =>
      s"""r$i AS (
      SELECT nodes.v,
             (1.0 - $PrDamping) / n.c + $PrDamping * coalesce(s.m, 0.0) AS pr
      FROM nodes CROSS JOIN n LEFT JOIN (
        SELECT sym.b AS v, sum(r${i - 1}.pr / deg.d) AS m
        FROM sym JOIN r${i - 1} ON r${i - 1}.v = sym.a
                 JOIN deg ON deg.v = sym.a
        GROUP BY sym.b) s ON s.v = nodes.v)"""
    }.mkString(",\n    ")
    s"""
    WITH ${OracleSql.embeddingPairsCtes},
    edges AS (SELECT id_a, id_b FROM pairs WHERE sim >= $PrSimThreshold),
    sym AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION ALL
            SELECT id_b AS a, id_a AS b FROM edges),
    nodes AS (SELECT vec_id AS v FROM embeddings),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM nodes),
    deg AS (SELECT a AS v, count(*) AS d FROM sym GROUP BY a),
    r0 AS (SELECT nodes.v, 1.0 / n.c AS pr FROM nodes CROSS JOIN n),
    $iterCtes
    SELECT r.v AS vec_id, CAST(coalesce(deg.d, 0) AS BIGINT) AS degree,
           round(r.pr, 6) AS pr
    FROM r$PrIters r LEFT JOIN deg ON deg.v = r.v
    ORDER BY vec_id"""
  }

  // ------------------------------------------------------------------ q117
  // Distributed PCA, top principal component by fixed-iteration power
  // method over the CENTERED embedding matrix — the whitening /
  // dimensionality-audit primitive (a drifting crawl shows up as a
  // rotating top component; int8 quantization ranges come from the
  // projected spread). The covariance matrix is never materialized:
  // each iteration is the two matvecs s = Cᵥ = Xᵀ(Xv) as relational
  // ops over the EXPLODED (i, j, x) element table — dot_i = Σⱼ x·vⱼ
  // (one broadcast join + row-keyed sum), then s_j = Σᵢ x·dotᵢ (one
  // dim-keyed sum, 64 rows out). Sign is fixed only at the end (v and
  // −v are the same direction) by making the largest-|loading|
  // component positive.
  //
  // Scale shape: the centered matrix stays an ARRAY column (one row per
  // vector), checkpointed once; the v-side matvec Xv is a scan-local
  // fold against a ONE-ROW broadcast v, and the Xᵀ(Xv) dim sum is `dim`
  // aggregate columns of one global agg — partial aggregation leaves
  // dim doubles per partition, so the per-iteration exchange is
  // dim × partitions doubles, independent of row count. One job per
  // iteration, each intermediate checkpointed (the λ/v branches would
  // otherwise re-evaluate the corpus pass, compounding 2× per
  // iteration). Fixed iteration count → static plan, mirrored into
  // mechanically unrolled SQL. At 100 TB: identical — no corpus-sized
  // shuffle anywhere in the loop. (At transformer dims ≳1k, swap the
  // agg-column dim sum for a posexplode + dim-keyed partial agg — same
  // exchange volume, bounded agg-buffer width.)
  private val PcaDim = 64
  private val PcaIters = 5

  /** q117's core over an explicit (id, vec) frame — public for the
    * hand-fixture spec (known dominant axis → exact direction).
    */
  def pcaTopComponent(emb: DataFrame, idCol: String, vecCol: String,
                      dim: Int = PcaDim, iters: Int = PcaIters): DataFrame = {
    // dim-indexed rows → one array row, ordered by index
    def asRow(df: DataFrame, valCol: String) =
      df.agg(transform(
        array_sort(collect_list(struct(col("j"), col(valCol)))),
        s => s.getField(valCol)).as("_arr"))
    val el = emb.select(posexplode(col(vecCol)).as(Seq("j0", "x0")))
      .select((col("j0") + 1).as("j"), col("x0").cast("double").as("x"))
    // 1-row / ≤dim-row intermediates are checkpointed: they sit in TWO
    // consumer branches each (mu → c + v0; s → λ + v), and unbroken
    // lineage would re-evaluate the corpus pass per branch, compounding
    // 2× per iteration
    val muRow = asRow(el.groupBy(col("j")).agg(avg(col("x")).as("m")), "m")
      .select(col("_arr").as("mu")).localCheckpoint()
    val c = emb.crossJoin(broadcast(muRow))
      .select(zip_with(col(vecCol), col("mu"),
        (x, m) => x.cast("double") - m).as("ca"))
      .localCheckpoint()
    var vRow = muRow
      .select(transform(col("mu"), _ => lit(1.0 / math.sqrt(dim))).as("v"))
    var res: DataFrame = null
    for (_ <- 1 to iters) {
      // ONE job per iteration: dot is a scan-local fold against the
      // broadcast 1-row v, and the dim sums are `dim` aggregate columns
      // of a single global agg — partial-agg leaves dim doubles per
      // partition, so no posexplode and no dim-keyed shuffle
      val dot = c.crossJoin(broadcast(vRow))
        .select(col("ca"), {
          import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
          column(graft.sim.DotProduct(
            expression(col("ca")), expression(col("v")))).as("d")
        })
      val sCols = (0 until dim).map(j =>
        sum(element_at(col("ca"), j + 1) * col("d")).as(s"_s$j"))
      val sRow = dot.agg(sCols.head, sCols.tail: _*).localCheckpoint()
      val sArr = array((0 until dim).map(j => col(s"_s$j")): _*)
      res = sRow.select(sArr.as("s"),
        sqrt(aggregate(transform(sArr, x => x * x),
          lit(0.0), (acc, t) => acc + t)).as("n"))
      vRow = res.select(transform(col("s"), x => x / col("n")).as("v"))
    }
    // deterministic orientation: the largest-|loading| component
    // (smallest index on a tie) is made positive
    val v = res.select(col("n"),
        posexplode(transform(col("s"), x => x / col("n")))
          .as(Seq("j0", "vj")))
      .select(col("n"), (col("j0") + 1).as("j"), col("vj"))
    val sign = v.orderBy(abs(col("vj")).desc, col("j")).limit(1)
      .select(when(col("vj") < 0, lit(-1.0)).otherwise(lit(1.0)).as("_sg"))
    v.crossJoin(broadcast(sign))
      .select(col("j").cast("long").as("j"),
        round(col("vj") * col("_sg"), 6).as("loading"),
        round(col("n"), 4).as("lambda"))
      .orderBy(col("j"))
  }

  private val q117: Q = (s, d) =>
    pcaTopComponent(embeddings(s, d), "vec_id", "embedding")

  private lazy val q117Sql = {
    val iterCtes = (1 to PcaIters).map { i =>
      s"""d$i AS (SELECT c.i, sum(c.x * v.v) AS d
           FROM c JOIN v${i - 1} v ON v.j = c.j GROUP BY c.i),
    s$i AS (SELECT c.j, sum(c.x * d.d) AS s
           FROM c JOIN d$i d ON d.i = c.i GROUP BY c.j),
    n$i AS (SELECT sqrt(sum(s * s)) AS n FROM s$i),
    v$i AS (SELECT j, s / n$i.n AS v FROM s$i CROSS JOIN n$i)"""
    }.mkString(",\n    ")
    s"""
    WITH e AS (
      SELECT vec_id AS i, j, CAST(embedding[j] AS DOUBLE) AS x
      FROM embeddings, unnest(generate_series(1, $PcaDim)) t(j)),
    mu AS (SELECT j, avg(x) AS m FROM e GROUP BY j),
    c AS (SELECT i, e.j, e.x - mu.m AS x FROM e JOIN mu ON mu.j = e.j),
    v0 AS (SELECT j, 1.0 / sqrt($PcaDim) AS v FROM mu),
    $iterCtes,
    sg AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sg
           FROM v$PcaIters ORDER BY abs(v) DESC, j LIMIT 1)
    SELECT CAST(v.j AS BIGINT) AS j, round(v.v * sg.sg, 6) AS loading,
           round(n$PcaIters.n, 4) AS lambda
    FROM v$PcaIters v CROSS JOIN sg CROSS JOIN n$PcaIters
    ORDER BY j"""
  }

  // ------------------------------------------------------------------ q118
  // Lloyd's k-means (k=16, 3 fixed iterations, seeds = the embeddings of
  // vec_id 0..15) — the IVF coarse-quantizer trainer (q36's cells are
  // exactly such centroids) and the partitioner behind semantic sharding.
  // Engine-portable determinism: assignment distance is
  // |c|² − 2·x·c (the |x|² term is constant per row and cannot change
  // the argmin), computed as a SEQUENTIAL fold on both engines, ties
  // broken by smaller centroid id; centroids are rounded to 6 dp after
  // every iteration so the next iteration's distance arithmetic is
  // bit-identical across engines (unrounded means would differ at 1e-16
  // in group-sum order and could flip a near-tie argmin).
  //
  // Scale shape: NO corpus-sized shuffle anywhere — assignment is
  // scan-local (centroids ride a ONE-ROW broadcast as an array of
  // structs; argmin is array_min over k scored entries, native
  // DotProduct inside); the update is a groupBy over k≤16 keys whose
  // dim sum is 64 aggregate columns (partial agg leaves k×dim doubles
  // per partition); the rebuilt centroid row is checkpointed per
  // iteration. A crossJoin-against-16-rows formulation would shuffle
  // 16× the corpus per iteration — this shape shuffles k×dim×partitions
  // doubles. Same at 100 TB.
  private val KmK = 16
  private val KmIters = 3

  private def dotC(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.sim.DotProduct(expression(a), expression(b)))
  }

  private def asElements(emb: DataFrame, idCol: String, vecCol: String) =
    emb.select(col(idCol).as("i"),
      transform(col(vecCol), e => e.cast("double")).as("xa"))

  // scored: per row, array of (dist = |c|² − 2x·c, k); argmin by struct
  // order = (dist, k) — ties to the smaller centroid id. The |x|² term
  // is row-constant and cannot change the argmin.
  private def bestCell = array_min(transform(col("cents"), s =>
    struct((dotC(s.getField("ca"), s.getField("ca")) -
      lit(2.0) * dotC(col("xa"), s.getField("ca"))).as("d"),
      s.getField("k").as("k"))))

  /** The trained centroid ROW (one row, array of (k, ca) structs) — the
    * quantizer artifact q118 audits and q119 searches. Seeds are the
    * vectors of ids 0..k-1; centroids round to 6dp per iteration (see
    * the q118 header note on engine-portable determinism).
    */
  def kmeansCentroidRow(emb: DataFrame, idCol: String, vecCol: String,
                        k: Int = KmK, iters: Int = KmIters,
                        dim: Int = PcaDim): DataFrame = {
    val x = asElements(emb, idCol, vecCol).localCheckpoint()
    def centRow(df: DataFrame) = df
      .agg(array_sort(collect_list(struct(col("k"), col("ca")))).as("cents"))
      .localCheckpoint()
    var cents = centRow(x.filter(col("i") < k)
      .select(col("i").cast("int").as("k"),
        transform(col("xa"), e => round(e, 6)).as("ca")))
    for (_ <- 1 to iters) {
      val assigned = x.crossJoin(broadcast(cents))
        .select(col("xa"), bestCell.getField("k").as("k"))
      val sums = (0 until dim).map(j =>
        sum(element_at(col("xa"), j + 1)).as(s"_s$j"))
      val upd = assigned.groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .select(col("k"), array((0 until dim).map(j =>
          round(col(s"_s$j") / col("n"), 6)): _*).as("ca"))
      // empty clusters keep their previous centroid (deterministic)
      val prev = cents.select(posexplode(col("cents")).as(Seq("_p", "s")))
        .select(col("s.k").as("k"), col("s.ca").as("prev_ca"))
      cents = centRow(prev.join(upd, Seq("k"), "left")
        .select(col("k"), coalesce(col("ca"), col("prev_ca")).as("ca")))
    }
    cents
  }

  /** Per-cluster audit (k, n_members, inertia) of `emb` against a
    * trained centroid row — q118's output shape.
    */
  def kmeansSummary(emb: DataFrame, idCol: String, vecCol: String,
                    cents: DataFrame): DataFrame =
    asElements(emb, idCol, vecCol).crossJoin(broadcast(cents))
      .select(bestCell.getField("k").as("k"),
        (dotC(col("xa"), col("xa")) + bestCell.getField("d")).as("d2"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("d2")), 4).as("inertia"))
      .select(col("k").cast("long").as("k"), col("n_members"),
        col("inertia"))
      .orderBy(col("k"))

  /** Scan-local cell assignment against a trained centroid row: `emb`
    * plus a `cell` column — no shuffle, no stored assignment join.
    */
  def assignCells(emb: DataFrame, idCol: String, vecCol: String,
                  cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .withColumn("xa", transform(col(vecCol), e => e.cast("double")))
      .withColumn("cell", bestCell.getField("k"))
      .drop("xa", "cents")

  /** [[assignCells]] plus the true squared distance to the assigned
    * centroid (`d2`, rounded 6) — the streaming OOD gate's payload.
    * Still fully scan-local against the 1-row broadcast artifact.
    */
  def assignCellsWithDist(emb: DataFrame, idCol: String, vecCol: String,
                          cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .withColumn("xa", transform(col(vecCol), e => e.cast("double")))
      .withColumn("_b", bestCell)
      .withColumn("cell", col("_b.k"))
      .withColumn("d2",
        round(dotC(col("xa"), col("xa")) + col("_b.d"), 6))
      .drop("xa", "cents", "_b")

  /** q118's core over an explicit (id, vec) frame — public for the
    * hand-fixture spec (two planted blobs → exact means/inertia).
    */
  def kmeansLloyd(emb: DataFrame, idCol: String, vecCol: String,
                  k: Int = KmK, iters: Int = KmIters,
                  dim: Int = PcaDim): DataFrame =
    kmeansSummary(emb, idCol, vecCol,
      kmeansCentroidRow(emb, idCol, vecCol, k, iters, dim))

  private val q118: Q = (s, d) =>
    kmeansSummary(embeddings(s, d), "vec_id", "embedding",
      EmbMemo.kmeansCents(s, d))

  private def kmDot(a: String, b: String) =
    s"list_sum(list_transform(generate_series(1, $PcaDim), " +
      s"_j -> $a[_j] * $b[_j]))"

  /** The unrolled k-means CTE chain (x, c0..cN, fin) — `fin` is the
    * final (i, xa, k, d) assignment against the trained centroids.
    * Shared by q118 (audit) and q119 (trained-cell ANN search).
    */
  private lazy val kmeansCtes: String = {
    def assign(src: String, cents: String, out: String) =
      s"""s_$out AS (
      SELECT x.i, x.xa, c.k,
             ${kmDot("c.ca", "c.ca")} - 2 * ${kmDot("x.xa", "c.ca")} AS d
      FROM $src x CROSS JOIN $cents c),
    $out AS (
      SELECT i, xa, k, d FROM (
        SELECT i, xa, k, d,
               row_number() OVER (PARTITION BY i ORDER BY d, k) AS rn
        FROM s_$out) t WHERE rn = 1)"""
    val iterCtes = (1 to KmIters).map { i =>
      s"""${assign("x", s"c${i - 1}", s"a$i")},
    mm$i AS (
      SELECT k, t.j, round(sum(xa[t.j]) / count(*), 6) AS cj
      FROM a$i, unnest(generate_series(1, $PcaDim)) t(j)
      GROUP BY k, t.j),
    m$i AS (SELECT k, list(cj ORDER BY j) AS ca FROM mm$i GROUP BY k),
    c$i AS (
      SELECT p.k, coalesce(m.ca, p.ca) AS ca
      FROM c${i - 1} p LEFT JOIN m$i m ON m.k = p.k)"""
    }.mkString(",\n    ")
    s"""x AS (
      SELECT vec_id AS i,
             list_transform(embedding, e -> CAST(e AS DOUBLE)) AS xa
      FROM embeddings),
    c0 AS (
      SELECT CAST(i AS INTEGER) AS k,
             list_transform(xa, e -> round(e, 6)) AS ca
      FROM x WHERE i < $KmK),
    $iterCtes,
    ${assign("x", s"c$KmIters", "fin")}"""
  }

  private lazy val q118Sql = s"""
    WITH $kmeansCtes
    SELECT CAST(k AS BIGINT) AS k, count(*) AS n_members,
           round(sum(${kmDot("xa", "xa")} + d), 4) AS inertia
    FROM fin GROUP BY k ORDER BY k"""

  // ------------------------------------------------------------------ q119
  // Trained-cell ANN: q36 searches the GIVEN label cells; this searches
  // the cells q118 just TRAINED — the end-to-end IVF pipeline a vector
  // store runs (train coarse quantizer → assign → probe the query's
  // cell). Assignment is scan-local on both the corpus and query sides
  // (the cell is recomputed from the broadcast centroid row, never a
  // stored-assignment shuffle join), the query set is tiny and rides
  // the existing broadcast topKWithinCell path, and rank/sim semantics
  // match q35/q36 (rounded cosine, ties to smaller id).
  private val AnnTopK = 5
  private val AnnNQueries = 10

  private val q119: Q = (s, d) => {
    val cents = EmbMemo.kmeansCents(s, d)
    val emb = assignCells(embeddings(s, d).select(col("vec_id"),
      col("embedding")), "vec_id", "embedding", cents)
    val queries = emb.filter(col("vec_id") < AnnNQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cell"))
    graft.sim.Similarity.topKWithinCell(queries, emb, AnnTopK, "cell")
      .select(col("q_id"), col("cell").cast("long").as("cell"),
        col("vec_id"), col("sim"), col("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }

  private lazy val q119Sql = s"""
    WITH $kmeansCtes,
    asg AS (SELECT i AS vec_id, k AS cell FROM fin),
    e AS (SELECT vec_id, embedding FROM embeddings),
    sims AS (
      SELECT q.vec_id AS q_id, qa.cell, c.vec_id AS vec_id,
             ${OracleSql.cosPairSql("q", "c")} AS sim
      FROM e q
        JOIN asg qa ON qa.vec_id = q.vec_id
        JOIN asg ca ON ca.cell = qa.cell
        JOIN e c ON c.vec_id = ca.vec_id AND c.vec_id <> q.vec_id
      WHERE q.vec_id < $AnnNQueries),
    ranked AS (
      SELECT *, row_number() OVER
        (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
      FROM sims WHERE sim IS NOT NULL)
    SELECT q_id, CAST(cell AS BIGINT) AS cell, vec_id, sim, rnk
    FROM ranked WHERE rnk <= $AnnTopK ORDER BY q_id, rnk"""

  // ------------------------------------------------------------------ q120
  // Semi-supervised label propagation over the embedding near-dup graph:
  // seeds (vec_id < 200 keep their curated label) spread to unlabeled
  // neighbors by 3 rounds of labeled-neighbor majority vote (count desc,
  // label asc on ties — integer-only arithmetic, so the engines agree
  // bit-for-bit with no rounding contract). The production use: a small
  // human-labeled set (quality tiers, topical classes) extended across a
  // crawl through the duplicate/similarity structure — labels flow along
  // exactly the edges dedup already paid for.
  //
  // Scale shape: reuses the memoized EmbMemo pair artifact (no second
  // sketch pass); each round is one edge-keyed equi-join + a
  // map-side-combinable (node, label) count + a per-node top-1 window
  // over ≤ |labels-per-node| rows; seeds ride the nodes table. Linear in
  // |E| per round, the Pregel shape, like q116.
  private val LpSeedMax = 200
  private val LpIters = 3

  /** q120's core over explicit node/edge frames — public for the
    * hand-fixture spec (chain propagation, tie votes, isolated nodes).
    * `nodes` = (id, label, is_seed); `edges` = one row per undirected
    * pair (id_a, id_b).
    */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
                       iters: Int = LpIters): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    val base = nodes.select(col("id"), col("is_seed"),
      when(col("is_seed"), col("label")).otherwise(lit(null)).as("lbl"))
      .localCheckpoint()
    var cur = base
    for (_ <- 1 to iters) {
      val votes = sym
        .join(cur.select(col("id").as("src"), col("lbl")), Seq("src"))
        .filter(col("lbl").isNotNull)
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
      val wnd = Window.partitionBy(col("dst"))
        .orderBy(desc("c"), col("lbl"))
      val top = votes.withColumn("_rn", row_number().over(wnd))
        .filter(col("_rn") === 1)
        .select(col("dst").as("id"), col("lbl").as("new_lbl"))
      cur = base.select(col("id"), col("is_seed"),
          when(col("is_seed"), col("lbl")).as("seed_lbl"))
        .join(top, Seq("id"), "left")
        .select(col("id"), col("is_seed"),
          coalesce(col("seed_lbl"), col("new_lbl")).as("lbl"))
        .localCheckpoint()
    }
    cur.select(col("id"), col("is_seed"),
        col("lbl").cast("long").as("label_pred"))
      .orderBy(col("id"))
  }

  private val q120: Q = (s, d) => {
    val nodes = embeddings(s, d).select(col("vec_id").as("id"),
      col("label").cast("long").as("label"),
      (col("vec_id") < LpSeedMax).as("is_seed"))
    labelPropagation(nodes, EmbMemo.pairs(s, d).select("id_a", "id_b"))
      .withColumnRenamed("id", "vec_id")
  }

  private lazy val q120Sql = {
    val iterCtes = (1 to LpIters).map { i =>
      s"""v$i AS (
      SELECT s.b AS id, l.lbl, count(*) AS c
      FROM sym s JOIN l${i - 1} l ON l.id = s.a
      WHERE l.lbl IS NOT NULL GROUP BY s.b, l.lbl),
    t$i AS (
      SELECT id, lbl FROM (
        SELECT id, lbl,
               row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl)
                 AS rn
        FROM v$i) z WHERE rn = 1),
    l$i AS (
      SELECT b.id, b.is_seed,
             CASE WHEN b.is_seed THEN b.lbl ELSE t.lbl END AS lbl
      FROM base b LEFT JOIN t$i t ON t.id = b.id)"""
    }.mkString(",\n    ")
    s"""
    WITH ${OracleSql.embeddingPairsCtes},
    edges AS (SELECT id_a, id_b FROM pairs
              WHERE sim >= ${EmbMemo.Threshold}),
    sym AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION ALL
            SELECT id_b AS a, id_a AS b FROM edges),
    base AS (
      SELECT vec_id AS id, vec_id < $LpSeedMax AS is_seed,
             CASE WHEN vec_id < $LpSeedMax THEN CAST(label AS BIGINT)
             END AS lbl
      FROM embeddings),
    l0 AS (SELECT id, is_seed, lbl FROM base),
    $iterCtes
    SELECT id AS vec_id, is_seed, lbl AS label_pred
    FROM l$LpIters ORDER BY vec_id"""
  }

  val queries: Map[String, Q] = Map(
    "q114_pmi_collocations" -> q114,
    "q115_vocab_coverage" -> q115,
    "q116_graph_centrality" -> q116,
    "q117_pca_power" -> q117,
    "q118_kmeans_lloyd" -> q118,
    "q119_ann_trained_cells" -> q119,
    "q120_label_propagation" -> q120,
  )

  val oracleSql: Map[String, String] = Map(
    "q114_pmi_collocations" -> q114Sql,
    "q115_vocab_coverage" -> q115Sql,
    "q116_graph_centrality" -> q116Sql,
    "q117_pca_power" -> q117Sql,
    "q118_kmeans_lloyd" -> q118Sql,
    "q119_ann_trained_cells" -> q119Sql,
    "q120_label_propagation" -> q120Sql,
  )
}
