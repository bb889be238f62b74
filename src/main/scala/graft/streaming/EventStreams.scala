package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events stream.
  *
  * The reference has no streaming engine (its "intraday" is polled REST
  * snapshots, SURVEY §2.10); these demonstrate that every relational
  * operator used by the intraday paths — and the two batch event queries
  * q40/q41 — run identically as streams: watermarked tumbling windows for
  * the aggregation, and flatMapGroupsWithState for gap-based sessionization
  * (the stateful shape a 100 TB pipeline would run on a real event bus).
  */
object EventStreams {

  /** events.parquet logical columns. `ts` has shipped in two physical
    * shapes across testdata generations — TIMESTAMP(NANOS), readable only
    * as int64 epoch-nanos under the nanosAsLong legacy flag, and native
    * TIMESTAMP(MICROS) without UTC adjustment, which Spark reads as
    * TIMESTAMP_NTZ — so the `ts` field here is a placeholder that
    * [[readEvents]] swaps for the shape sniffed from the directory's
    * parquet footers.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming events reader, normalized to the engine contract every
    * downstream operator builds on: `ts_us` (BIGINT epoch-micros) and
    * `ts_t` (TimestampType) — the streaming twin of
    * [[graft.queries.Tables.eventsMicros]]. A one-off batch footer read
    * resolves which physical `ts` shape the directory holds (streaming
    * reads need a static schema up front). Sessions pin
    * spark.sql.session.timeZone=UTC, so the NTZ→LTZ cast reads the naive
    * wall clock as UTC, matching DuckDB's `epoch_us` on the oracle side.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // legacy nanos data needs the flag even for the footer sniff
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(dir).schema("ts").dataType
    val schema = StructType(eventsSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    val raw = spark.readStream.schema(schema).parquet(dir)
    // same two-known-shapes contract as Tables.normalizeEventsTs (the
    // batch boundary): a third driver regeneration must fail loudly at
    // the read boundary, not 11 queries deep — EventsShapeSpec pins the
    // error path
    val withUs = tsType match {
      case LongType => raw.withColumn("ts_us", expr("ts div 1000"))
      case TimestampNTZType | TimestampType =>
        raw.withColumn("ts_us", unix_micros(col("ts").cast(TimestampType)))
      case other => throw new IllegalStateException(
        s"events physical-schema drift: ts arrived as ${other.simpleString}, " +
          "not one of the two known shapes (BIGINT epoch-nanos under " +
          "nanosAsLong; TIMESTAMP/TIMESTAMP_NTZ micros). The engine " +
          "contract is ts_us BIGINT epoch-micros + ts_t TIMESTAMP — " +
          "extend EventStreams.readEvents and Tables.normalizeEventsTs " +
          "together instead of patching event queries individually.")
    }
    withUs.withColumn("ts_t", timestamp_micros(col("ts_us"))).drop("ts")
  }

  /** Watermarked 5-minute tumbling counts per event type — the streaming
    * twin of batch query q40.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_t", "10 minutes")
      .groupBy(window(col("ts_t"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Watermarked 10-minute windows sliding every 5 — the streaming twin of
    * batch query q44 (each event lands in two overlapping buckets).
    */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_t", "10 minutes")
      .groupBy(window(col("ts_t"), "10 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup with BOUNDED state: duplicates are dropped only
    * within the event-time watermark, so state for old keys is evicted —
    * the shape a 100 TB event-bus dedup actually runs with (unbounded
    * `dropDuplicates` state would grow forever).
    */
  def dedupEvents(events: DataFrame, within: String = "30 days"): DataFrame =
    events
      .withWatermark("ts_t", within)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  case class Ev(user_id: Long, ts_us: Long, value: Double,
                ts_t: java.sql.Timestamp)
  case class SessionState(start: Long, end: Long, n: Long)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Gap-based sessionization (30-minute inactivity) with explicit state:
    * closed sessions emit when the event-time watermark passes the gap.
    */
  def sessionize(events: DataFrame): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val GapUs = 30L * 60 * 1000000

    def update(userId: Long, rows: Iterator[Ev],
               state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // watermark moved past end + gap with no new events: close it
        val s = state.get
        state.remove()
        return Iterator.single(Session(userId, s.start, s.end, s.n))
      }
      val sorted = rows.toSeq.sortBy(_.ts_us)
      var closed = List.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts_us - s.end <= GapUs =>
            // extend with min/max: a late-but-in-gap event from a later
            // batch must not move the session end BACKWARD (that would
            // also shrink the close timeout)
            cur = Some(SessionState(math.min(s.start, e.ts_us),
              math.max(s.end, e.ts_us), s.n + 1))
          case Some(s) =>
            closed ::= Session(userId, s.start, s.end, s.n)
            cur = Some(SessionState(e.ts_us, e.ts_us, 1))
          case None =>
            cur = Some(SessionState(e.ts_us, e.ts_us, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // a timeout at-or-below the current watermark throws and kills
        // the query (late events within the allowed lateness can produce
        // one); clamp just above the watermark so the session closes on
        // the next watermark advance
        val targetMs = (s.end + GapUs) / 1000
        state.setTimeoutTimestamp(
          math.max(targetMs, state.getCurrentWatermarkMs() + 1))
      }
      closed.reverseIterator
    }

    // the watermark column must survive into the grouped Dataset, so the
    // row type carries it (a .map dropping it would disable event-time
    // timeouts)
    events
      .select(col("user_id"), col("ts_us"), col("value"), col("ts_t"))
      .withWatermark("ts_t", "1 minute")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** documents.parquet physical schema (for the streaming curation twin). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(documentsSchema).parquet(dir)

  /** Streaming curation filter — the scan-local half of the batch q48/q58
    * pipeline (language ID, quality score, token bounds, PII scrub) run
    * over a document STREAM. Entirely stateless (no watermark, no state
    * store): per-row expressions stream with exactly-once file-source
    * semantics, which is how a continuous ingestion pipeline curates
    * documents as they land rather than in daily batches.
    */
  def curationFilter(docs: DataFrame, minQuality: Double = 0.9,
                     minTokens: Long = 20): DataFrame = {
    import graft.text.{Pii, TextOps}
    val feats = docs.select(col("doc_id"),
      TextOps.langId(col("text")).as("lang_pred"),
      TextOps.qualityScore(col("text")).as("quality"),
      TextOps.tokenCountWs(col("text")).as("n_tokens"),
      col("text"))
    Pii.scrub(feats.filter(col("lang_pred") === "en" &&
        col("quality") >= minQuality && col("n_tokens") >= minTokens),
        "text", "_red")
      .select(col("doc_id"), col("lang_pred"), col("quality"),
        col("n_tokens"), col("n_pii"),
        md5(to_binary(col("_red"), lit("utf-8"))).as("redacted_fp"))
  }

  /** Streaming decontamination flag — a STREAM-STATIC broadcast join:
    * each arriving document's distinct word-n-grams are tested against
    * the STATIC eval-suite gram set (one broadcast array row, equi-keyed
    * on a constant so the join is a stateless BroadcastHashJoin per
    * micro-batch — no watermark, no state store, no reprocessing). This
    * is how a continuous ingestion pipeline keeps benchmark contamination
    * out at the door instead of sweeping for it in daily batches; the
    * batch twin is q56's `is_clean` (StreamingSpec pins agreement).
    *
    * `evalGrams` must be a bounded static frame (eval suites are small by
    * construction — the same precondition as q56's broadcast); the
    * gram-set row is built once per micro-batch from the static plan.
    */
  def decontaminationFlag(docs: DataFrame, evalGrams: DataFrame,
                          n: Int = 8): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val evset = evalGrams.agg(collect_set(col("gram")).as("_ev"))
      .withColumn("_k", lit(1))
    docs
      .select(col("doc_id"),
        column(graft.dedup.NGramArray(expression(col("text")), n)).as("_g"))
      .withColumn("_k", lit(1))
      .join(broadcast(evset), Seq("_k"))
      .select(col("doc_id"),
        (!arrays_overlap(col("_g"), col("_ev"))).as("is_clean"))
  }

  /** Streaming admission filter — a STREAM-STATIC left ANTI join: only
    * documents whose content fingerprint is NOT already in the corpus
    * fingerprint table pass through. This is the ingestion half of
    * incremental dedup (batch q76): the crawler's stream drops exact
    * re-fetches at the door, statelessly (the corpus table is the state,
    * not a stream state store — no watermark, no unbounded
    * dropDuplicates memory, and re-deliveries WITHIN the stream are
    * handled by the separate dedupEvents watermark operator).
    */
  def admissionFilter(docs: DataFrame, corpusFps: DataFrame): DataFrame = {
    import graft.text.TextOps
    docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .join(corpusFps, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
  }

  /** Streaming quantile quality-gate admission — the stream twin of
    * batch q110: each arriving document's quality score is compared
    * against its source's batch-derived 90th-percentile threshold (the
    * tiny (source, thr) table from the last corpus snapshot rides a
    * broadcast into the scan). Stateless per micro-batch — no state
    * store; a source absent from the threshold table admits by default
    * (a brand-new source has no distribution to gate against yet; the
    * next snapshot recompute picks it up). This is the
    * distribution-relative admission an ingestion pipeline runs
    * continuously, with q110 as its nightly threshold recompute.
    */
  def qualityGateAdmission(docs: DataFrame,
                           thresholds: DataFrame): DataFrame = {
    import graft.text.TextOps
    docs
      .withColumn("qs", round(TextOps.qualityScore(col("text")), 6))
      .join(broadcast(thresholds), Seq("source"), "left")
      .select(col("doc_id"), col("source"), col("qs"),
        coalesce(col("qs") >= col("thr"), lit(true)).as("admit"))
  }

  /** Streaming NEAR-dup admission — the stream twin of batch q76's near
    * layer ([[admissionFilter]] is the exact-fingerprint half): each
    * arriving document probes its LSH band keys against the broadcast
    * STATIC corpus band index ([[graft.dedup.DedupOps.bandIndex]],
    * rebuilt per corpus snapshot) and Jaccard-verifies the bucket
    * members inside its own row — stateless per micro-batch, so the
    * continuous ingestion path a 100 TB crawl runs pays one scan-local
    * probe per arriving document and no state store. StreamingSpec pins
    * stream output == q76's near-layer verdicts on the same fixture.
    */
  def nearDupAdmission(docs: DataFrame, corpusIndex: DataFrame,
                       threshold: Double = 0.5): DataFrame =
    graft.dedup.DedupOps.probeBandIndex(docs, corpusIndex,
        "doc_id", "text", threshold)
      .select(col("doc_id"), col("n_near"), col("nearest_id"),
        col("is_near_dup"))

  /** The COMPLETE streaming admission verdict — batch q76's exact row
    * shape (doc_id, is_exact_dup, n_near, nearest_id, is_new) produced
    * continuously: the exact layer is a stream-static left join against
    * the corpus fingerprint table (`corpusFps`: one column `fp`), the
    * near layer is [[nearDupAdmission]]'s band-index probe, both
    * stateless per micro-batch. StreamingSpec pins stream output ==
    * batch q76 row-for-row on the same fixture — the whole incremental
    * dedup query runs at the ingestion door.
    */
  def admissionVerdict(docs: DataFrame, corpusFps: DataFrame,
                       corpusIndex: DataFrame,
                       threshold: Double = 0.5): DataFrame = {
    import graft.text.TextOps
    graft.dedup.DedupOps.probeBandIndex(docs, corpusIndex,
        "doc_id", "text", threshold)
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .join(broadcast(corpusFps.select(col("fp"))
        .withColumn("_dup", lit(1))), Seq("fp"), "left")
      .select(col("doc_id"),
        col("_dup").isNotNull.as("is_exact_dup"),
        col("n_near"),
        col("nearest_id"),
        (col("_dup").isNull && col("n_near") === 0).as("is_new"))
  }

  /** The END-TO-END streaming admission gate — the deliverable a
    * training-data team deploys: ONE readStream through the whole
    * admission family in cheap-first order — exact fingerprint, lexical
    * near-dup, source-relative quality quantile, trigram-LM floor — one
    * stateless scan-local pass per micro-batch (every gate is a
    * broadcast probe or an in-row expression: no shuffle, no watermark,
    * no state store, so composing the gates cannot blow up state).
    *
    * Short-circuit: each doc is attributed to the FIRST gate that drops
    * it (`stage` ∈ exact | near | quality | lm | null=admitted), and the
    * expensive scorers are `when()`-guarded — CaseWhen evaluates
    * branches lazily per row, so a doc dropped at the exact/near layer
    * never runs the quality regexes, and only docs surviving the
    * quality gate run the LM scorer. The near probe itself is not
    * guarded: its verdict (n_near/nearest_id) is part of the q76 output
    * contract for every doc, exact-dup or not.
    *
    * Static artifacts (the nightly recompute feeds them): `corpusFps`
    * (one column fp), `corpusIndex` ([[graft.dedup.DedupOps.bandIndex]]),
    * `thresholds` (batch q110's (source, thr)), `lmModel` (one-row
    * [[graft.text.TrigramLm.modelFrame]]) with `lmMinScore` the
    * admission floor; a doc whose LM score is null (no trigrams) or
    * whose source has no threshold admits at that gate — new sources
    * and degenerate docs are the next recompute's problem, not the
    * door's. StreamingSpec pins every verdict and score against the
    * batch q76/q110/q87 composition on the same fixture, with
    * per-stage drop counts.
    */
  def admissionPipeline(docs: DataFrame, corpusFps: DataFrame,
                        corpusIndex: DataFrame, thresholds: DataFrame,
                        lmModel: DataFrame, lmMinScore: Double,
                        nearThreshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import graft.text.{TextOps, TrigramLm, TrigramLmScore}
    val m = TrigramLm.collectModelFrame(lmModel)
    val probed = graft.dedup.DedupOps.probeBandIndex(
        docs, corpusIndex, "doc_id", "text", nearThreshold)
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .join(broadcast(corpusFps.select(col("fp"))
        .withColumn("_dup", lit(1))), Seq("fp"), "left")
      .withColumn("is_exact_dup", col("_dup").isNotNull)
      .join(broadcast(thresholds), Seq("source"), "left")
    val lexOk = !col("is_exact_dup") && !col("is_near_dup")
    val scored = probed
      .withColumn("qs",
        when(lexOk, round(TextOps.qualityScore(col("text")), 6)))
      .withColumn("_q_ok", coalesce(col("qs") >= col("thr"), lit(true)))
      .withColumn("_r", when(lexOk && col("_q_ok"),
        column(TrigramLmScore(expression(TextOps.normalize(col("text"))),
          m.tris, m.logps, m.defaultLogp))))
      .withColumn("lm_score", when(col("_r.n_tri") > 0,
        round(col("_r.lm_sum") / col("_r.n_tri"), 6)))
      .withColumn("_lm_ok",
        coalesce(col("lm_score") >= lit(lmMinScore), lit(true)))
    scored
      .withColumn("stage",
        when(col("is_exact_dup"), "exact")
          .when(col("is_near_dup"), "near")
          .when(!col("_q_ok"), "quality")
          .when(!col("_lm_ok"), "lm"))
      .select(col("doc_id"), col("source"), col("is_exact_dup"),
        col("n_near"), col("nearest_id"), col("qs"), col("lm_score"),
        col("stage"), col("stage").isNull.as("admit"))
  }

  /** embeddings.parquet physical schema (for the semantic admission twin). */
  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def readEmbeddings(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(embeddingsSchema).parquet(dir)

  /** Streaming SEMANTIC admission — the embedding-space member of the
    * admission family ([[admissionFilter]] exact, [[nearDupAdmission]]
    * lexical, [[passageAdmission]] passage-level): each arriving vector
    * probes its hyperplane-sketch bucket against the broadcast STATIC
    * corpus bucket index ([[graft.sim.Similarity.bucketIndex]], rebuilt
    * per corpus snapshot) and cosine-verifies the bucket members inside
    * its own row — stateless per micro-batch, the q78 SemDeDup rule run
    * at the ingestion door: admit iff no already-kept vector sits within
    * `threshold` cosine in the same bucket. StreamingSpec pins stream
    * verdicts == the batch bucket-join rule on the same fixture.
    */
  def semanticAdmission(vecs: DataFrame, corpusIndex: DataFrame,
                        threshold: Double = 0.2): DataFrame =
    graft.sim.Similarity.probeBucketIndex(vecs, corpusIndex, threshold)
      .select(col("vec_id"), col("n_close"), col("closest_id"),
        (!col("is_semantic_dup")).as("admit"))

  /** Streaming PASSAGE-level admission — the ingestion twin of batch q79
    * (as [[admissionFilter]]/[[nearDupAdmission]] are of q76's layers):
    * per arriving document, the fraction of its non-overlapping passage
    * hashes already present in the corpus passage set, and an admit
    * verdict under `maxDupFrac` boilerplate. The corpus passage set is
    * CORPUS-SIZED — never broadcast-able, never a stream-static shuffle
    * candidate — so membership goes through the ~25 KiB Bloom bitset
    * ([[graft.dedup.Bloom.bitsetHit]]): built once at stream start,
    * probed scan-locally inside each document's own row, stateless per
    * micro-batch. Bloom direction matters here: NO false negatives, so
    * `dup_frac_est` can only overcount — a boilerplate REJECT is
    * conservative-correct and an admitted doc is re-checked by the daily
    * batch q79 anyway (StreamingSpec pins est >= exact per doc, and
    * equality on the fixture's collision-free filter).
    *
    * `corpusPassages`: one-column `pk` frame of corpus passage hashes
    * (`explode(TextOps.passageHashes(...)).distinct()`).
    */
  def passageAdmission(docs: DataFrame, corpusPassages: DataFrame,
                       maxDupFrac: Double = 0.5, len: Int = 4): DataFrame = {
    import graft.dedup.Bloom
    import graft.text.TextOps
    val words = Bloom.bitsetOf(corpusPassages, "pk")
    docs
      .select(col("doc_id"),
        TextOps.passageHashes(col("text"), len).as("_pks"))
      .select(col("doc_id"),
        size(col("_pks")).cast("long").as("n_passages"),
        size(filter(col("_pks"), p => Bloom.bitsetHit(p, words)))
          .cast("long").as("n_dup_est"))
      .withColumn("dup_frac_est",
        round(col("n_dup_est").cast("double") / col("n_passages"), 6))
      .withColumn("admit", col("dup_frac_est") < maxDupFrac)
  }

  /** Streaming OUT-OF-DISTRIBUTION admission at the ingest door using
    * the TRAINED coarse quantizer (q118's centroid artifact, the one
    * q119 searches): each arriving vector is assigned its nearest cell
    * scan-local against the 1-row broadcast centroid row and admitted
    * iff its squared distance to that centroid is at most `maxDist` —
    * far-from-every-cell is the OOD signal (junk embeddings, modality
    * drift, an upstream encoder change). Stateless per micro-batch; the
    * artifact is retrained per corpus snapshot like
    * [[semanticAdmission]]'s bucket index. StreamingSpec pins stream
    * verdicts == the batch [[graft.queries.Pipeline15.assignCellsWithDist]]
    * rule on the same fixture.
    */
  def cellAdmission(vecs: DataFrame, cents: DataFrame,
                    maxDist: Double): DataFrame =
    graft.queries.Pipeline15
      .assignCellsWithDist(vecs, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("d2"), (col("d2") <= maxDist).as("admit"))

  /** Watermarked per-window distinct-user estimation via the KMV sketch
    * ([[graft.dedup.KmvSketch]]) — the streaming cardinality monitor a
    * pipeline dashboards (unique users per window per event type)
    * without `dropDuplicates` state proportional to the distinct count:
    * the state store holds ONE k-long sketch per open (window, type)
    * group, merged incrementally per micro-batch like any algebraic
    * aggregate. Below k distinct the estimate is exact; above it the
    * bounded (k-1)/u_k estimator takes over. == the identical batch
    * aggregation on the same data (StreamingSpec).
    */
  def windowedDistinctUsers(events: DataFrame, k: Int = 256): DataFrame = {
    import graft.dedup.Kmv
    events
      .withWatermark("ts_t", "10 minutes")
      .groupBy(window(col("ts_t"), "5 minutes"), col("event_type"))
      .agg(round(Kmv.kmvDistinct(Kmv.hash52(col("user_id")), k), 6)
        .as("est_users"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("est_users"))
  }

  /** [[windowedDistinctUsers]] with the HLL registers
    * ([[graft.dedup.HllSketch]]) instead of KMV: ONE 256-BYTE register
    * array per open (window, type) group in the state store — 8× less
    * state than the k-long KMV sketch at the same asymptotic error, and
    * the register max-merge is idempotent, so micro-batch boundaries,
    * retries and late data cannot move the estimate (== the identical
    * batch aggregation, StreamingSpec). This is the sketch a production
    * cardinality dashboard keeps per (window × type × shard) and folds
    * across shards without re-reading events.
    */
  def windowedDistinctUsersHll(events: DataFrame): DataFrame = {
    import graft.dedup.Hll
    events
      .withWatermark("ts_t", "10 minutes")
      .groupBy(window(col("ts_t"), "5 minutes"), col("event_type"))
      .agg(round(Hll.hllDistinct(Hll.md5Hex(col("user_id"))), 4)
        .as("est_users"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("est_users"))
  }

  /** STREAM-STREAM bounded-interval attribution join: every purchase
    * paired with the same user's view events at most `window` before it
    * — both sides are live streams (the one streaming join class the
    * stream-static family can't express). Uses the canonical
    * range-condition form — equi-key plus a raw time bound on the two
    * event times — which is exactly what Spark's watermark-driven state
    * eviction requires: each side buffers only `watermark + window` of
    * history per user, so state is bounded at any stream rate. Inner
    * matches emit as found (append mode); the batch/backfill twin is
    * the bucketed equi-join [[graft.ops.IntervalJoin.bucketed]]
    * (StreamingSpec pins identical pair sets on the same fixture).
    */
  def attributionPairs(views: DataFrame, purchases: DataFrame,
                       window: String = "12 hours",
                       watermark: String = "1 hour"): DataFrame = {
    val v = views.select(col("event_id").as("view_id"),
        col("ts").as("view_ts"), col("user_id"))
      .withWatermark("view_ts", watermark)
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("user_id").as("_puid"))
      .withWatermark("purchase_ts", watermark)
    v.join(p, expr(s"""user_id = _puid AND purchase_ts >= view_ts
        AND purchase_ts < view_ts + INTERVAL $window"""))
      .select(col("purchase_id"), col("view_id"), col("user_id"),
        col("purchase_ts"), col("view_ts"))
  }

  case class RateEv(event_type: String, hour_us: Long)
  case class RateState(openHour: Long, openN: Long,
                       closed: List[(Long, Long)])
  case class HourVerdict(event_type: String, ws_us: Long, n: Long,
                         z: Option[Double], is_anomaly: Boolean)

  /** Streaming hourly rate-anomaly monitor — batch q100 as live state:
    * per event type the state is ONE open hour counter plus the last 24
    * CLOSED hour counts (the z-score's trailing window) — constant
    * size at any stream rate. An hour closes (and emits its verdict)
    * when a later hour's first event arrives, which is how a monitoring
    * pipeline actually alerts: at the top of the next hour, not at
    * end-of-day batch. The z statistics are the exact integer-sum
    * moments of q100, so on in-order replay every closed hour's verdict
    * equals the batch row (StreamingSpec pins it); events for an
    * already-closed hour are dropped — the bounded-state tradeoff,
    * same class as [[dedupEvents]].
    */
  def rateAnomalyStream(events: DataFrame, trail: Int = 24,
                        zThreshold: Double = 3.0): Dataset[HourVerdict] = {
    val spark = events.sparkSession
    import spark.implicits._
    val HourUs = 3600L * 1000000L

    def verdict(tpe: String, hour: Long, n: Long,
                closed: List[(Long, Long)]): HourVerdict = {
      val m = closed.size.toLong
      val s1 = closed.map(_._2).sum
      val s2 = closed.map(c => c._2 * c._2).sum
      val z =
        if (m < 2) None
        else {
          val variance = (s2.toDouble - s1.toDouble * s1 / m) / (m - 1)
          if (variance > 0)
            Some(BigDecimal((n - s1.toDouble / m) / math.sqrt(variance))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          else None
        }
      HourVerdict(tpe, hour, n, z, z.exists(math.abs(_) > zThreshold))
    }

    def update(tpe: String, rows: Iterator[RateEv],
               state: GroupState[RateState]): Iterator[HourVerdict] = {
      val counts = rows.toSeq.groupBy(_.hour_us).toSeq.sortBy(_._1)
      var s = state.getOption.getOrElse(RateState(Long.MinValue, 0L, Nil))
      var out = List.empty[HourVerdict]
      counts.foreach { case (hour, evs) =>
        if (hour == s.openHour || s.openHour == Long.MinValue) {
          val base = if (s.openHour == Long.MinValue) 0L else s.openN
          s = RateState(hour, base + evs.size, s.closed)
        } else if (hour > s.openHour) {
          // close the open hour against the current trailing window
          out ::= verdict(tpe, s.openHour, s.openN, s.closed)
          val closed = ((s.openHour, s.openN) :: s.closed).take(trail)
          s = RateState(hour, evs.size.toLong, closed)
        }
        // hour < openHour: late event for a closed hour — dropped
      }
      state.update(s)
      out.reverseIterator
    }

    events
      .select(col("event_type"),
        (col("ts_us") - pmod(col("ts_us"), lit(HourUs))).as("hour_us"))
      .as[RateEv]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }

  case class FunnelEv(user_id: Long, ts_us: Long, event_type: String)
  case class FunnelState(t1: Long, t2: Long, t3: Long)
  case class FunnelProgress(user_id: Long, stage: Int)

  /** Streaming ordered-funnel tracker — batch q99 run as live state:
    * per user, the state is exactly THREE timestamps (first qualifying
    * view / click-after-view / purchase-after-click), so per-key state
    * is constant-size no matter how long the user's history grows —
    * the property that makes a funnel streamable at all (buffering
    * histories is unbounded). Events inside a micro-batch process in
    * ts order, which reproduces the batch conditional-min chain exactly
    * (a stage's min qualifying time is known before any later event
    * needs it: qualifying times only come from earlier events). Emits
    * each user's current stage per batch (update mode). Bounded-state
    * tradeoff, documented: an out-of-order view arriving in a LATER
    * micro-batch can lower t1, but clicks discarded against the older
    * t1 are gone — the same beyond-watermark approximation class as
    * [[dedupEvents]]; feed in-order (or batch-replay) streams for exact
    * parity, which StreamingSpec pins against q99.
    */
  def funnelStream(events: DataFrame,
                   steps: Seq[String] = Seq("view", "click", "purchase"))
      : Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    val Unset = Long.MaxValue

    def update(userId: Long, rows: Iterator[FunnelEv],
               state: GroupState[FunnelState]): Iterator[FunnelProgress] = {
      var s = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
      rows.toSeq.sortBy(e => (e.ts_us, e.user_id)).foreach { e =>
        if (e.event_type == steps(0)) {
          if (e.ts_us < s.t1) s = s.copy(t1 = e.ts_us)
        } else if (e.event_type == steps(1)) {
          if (e.ts_us >= s.t1 && e.ts_us < s.t2) s = s.copy(t2 = e.ts_us)
        } else if (e.event_type == steps(2)) {
          if (e.ts_us >= s.t2 && e.ts_us < s.t3) s = s.copy(t3 = e.ts_us)
        }
      }
      state.update(s)
      val stage =
        if (s.t3 != Unset) 3 else if (s.t2 != Unset) 2
        else if (s.t1 != Unset) 1 else 0
      Iterator.single(FunnelProgress(userId, stage))
    }

    events
      .select(col("user_id"), col("ts_us"), col("event_type"))
      .as[FunnelEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming DSIR importance scoring — q96's target-vs-raw
    * log-likelihood-ratio selection run at the ingestion door: the
    * 4096-bucket model rides ONE broadcast row ([[graft.text.Dsir
    * .modelFrame]]: lr map + unseen-bucket default) and the per-doc
    * score folds over the token array inside the row — no shuffle, no
    * state store, stateless per micro-batch. A bucket the model corpus
    * never saw takes the smoothed ct = cr = 0 default, exactly what an
    * out-of-distribution token should pay. Scores == batch q96 on any
    * fixture (same expression — StreamingSpec pins it).
    */
  def dsirScoreStream(docs: DataFrame, model: DataFrame): DataFrame =
    graft.text.Dsir.score(docs, "doc_id", "text", model)
      .withColumn("selected", col("dsir_score") > 0)

  /** Streaming count-min sketch maintainer — q97's term-frequency
    * sketch built over a document STREAM: same seeded buckets and
    * one-pass fold as the batch build ([[graft.text.Cms.sketch]] runs
    * unchanged on the streaming frame), but as a continuously-updated
    * stateful aggregation whose ENTIRE state is the ≤ 3×4096 counters —
    * the bounded-memory vocabulary tracker a 100 TB ingestion pipeline
    * keeps live (an exact per-word streaming count grows state with the
    * vocabulary; this never does). Run in update/complete mode;
    * StreamingSpec pins the final counters == the batch sketch on the
    * same fixture.
    */
  def cmsSketchStream(docs: DataFrame): DataFrame =
    graft.text.Cms.sketch(
      docs.select(explode(split(
        graft.text.TextOps.normalize(col("text")), " ")).as("w")), "w")

  /** Streaming statistical quality scoring — q87's trigram LM run at
    * the ingestion door: the bounded model rides ONE broadcast row
    * ([[graft.text.TrigramLm.modelFrame]]: logp map + unseen-trigram
    * default) joined on a constant key, and the per-doc mean
    * log-probability folds over the trigram array INSIDE the row — no
    * shuffle, no state store, stateless per micro-batch. Scores equal
    * batch [[graft.text.TrigramLm.score]] wherever the doc's trigrams
    * are covered by the model corpus; novel trigrams take the
    * smoothed default (exactly what an out-of-corpus doc should pay).
    */
  def lmScoreStream(docs: DataFrame, model: DataFrame): DataFrame = {
    import graft.text.TrigramLm
    // the one-row model frame collapses to driver arrays feeding the
    // native TrigramLmScore expression — a map-literal probe would be a
    // LINEAR key scan per trigram (Spark maps are array-backed; measured
    // 10x the whole query). The collect is a bounded one-row fetch at
    // stream build time; scoring stays a stateless scan-local
    // projection, so the streaming properties (no shuffle, no state
    // store) are unchanged.
    TrigramLm.scoreInRow(docs, TrigramLm.collectModelFrame(model),
      "doc_id", "text")
  }

  /** Streaming per-(window, type) value-quantile monitor — q131's
    * DDSketch run live: p50/p90/p99 of event values per 5-minute window
    * via the mergeable [[graft.dedup.DdSketchQuantile]] aggregate, whose
    * state per open group is the FIXED ≤ 8+8·60 bucket map no matter
    * how many distinct double values the stream carries (an exact
    * per-value histogram grows state with the value space; a latency
    * monitor cannot). Bucket map and type-1 readout are the exact q131
    * integer arithmetic, so on replay every emitted row equals the
    * batch sketch columns on the same slice (StreamingSpec pins it) —
    * and the same bucket counts fold across shards/days (the q128
    * stored-artifact economics).
    */
  def windowedValueQuantiles(events: DataFrame): DataFrame = {
    import graft.dedup.Dd
    val cents = floor(col("value") * 100).cast("long")
    events
      .withWatermark("ts_t", "10 minutes")
      .groupBy(window(col("ts_t"), "5 minutes"), col("event_type"))
      .agg(Dd.ddQuantile(cents, 0.50).as("p50_sketch"),
        Dd.ddQuantile(cents, 0.90).as("p90_sketch"),
        Dd.ddQuantile(cents, 0.99).as("p99_sketch"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("p50_sketch"), col("p90_sketch"), col("p99_sketch"))
  }

  /** Streaming per-(window, type) value mean WITH a bootstrap
    * confidence interval — the uncertainty-aware twin of the plain
    * windowed mean (a monitor without an interval invites over-reading
    * every wiggle). Structured Streaming forbids chained aggregations,
    * so the 32 deterministic Poisson replica sums ride ONE aggregation
    * as conditional columns ([[graft.ops.PoissonBoot.replicaAggs]] —
    * constant 2·B+2 longs of state per open group) and the CI reads
    * out scan-local from the sorted in-row replica means. Every weight
    * and mean is engine/replay-exact integer arithmetic, so emitted
    * rows equal the batch q158 form on the same slice (StreamingSpec
    * pins it).
    */
  def windowedValueCi(events: DataFrame): DataFrame = {
    import graft.ops.PoissonBoot
    val rep = events
      .select(col("ts_t"), col("event_type"), col("event_id"),
        round(col("value") * 1e6, 0).cast("long").as("vm"))
      .withColumn("b", explode(sequence(lit(0), lit(PoissonBoot.B - 1))))
      .withColumn("u", PoissonBoot.u52(col("event_id"), col("b")))
      .withColumn("w", expr(PoissonBoot.weightSql("u")).cast("long"))
    val aggs = PoissonBoot.replicaAggs(col("b"), col("w"), col("vm"))
    val (lo, hi) = PoissonBoot.ciFromSorted
    rep.withWatermark("ts_t", "10 minutes")
      .groupBy(window(col("ts_t"), "5 minutes"), col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("ws"), col("event_type"),
        col("n_events"),
        (expr("(CASE WHEN sm_point < 0 THEN -1 ELSE 1 END) * " +
          "((2 * abs(sm_point) + n_events) div (2 * n_events))") / 1e6)
          .as("mean_value"),
        (lo / 1e6).as("ci_lo"), (hi / 1e6).as("ci_hi"))
  }

  /** The ONE-PASS monitoring dashboard: count + HLL distinct users +
    * DDSketch value quantiles + bootstrap mean CI for every (5-minute
    * window, type) from a SINGLE streaming aggregation — the capstone
    * of the mergeable-sketch design: because every monitor is a
    * commutative bounded-state aggregate, they compose into one
    * groupBy instead of four subscriptions to the source. The
    * bootstrap's ×B row explode happens scan-local BEFORE the
    * aggregation; the non-bootstrap aggregates read only the b=0 slice
    * (their inputs are null elsewhere, and every aggregate here skips
    * nulls), so each sees exactly the unexploded stream. State per
    * open group stays constant: 1 count + 256 HLL bytes + ≤8+8·60
    * sketch buckets + 2·B+2 bootstrap longs. StreamingSpec pins every
    * column equal to the three standalone monitors on the same slice.
    */
  def monitoringDashboard(events: DataFrame): DataFrame = {
    import graft.dedup.{Dd, Hll}
    import graft.ops.PoissonBoot
    val rep = events
      .select(col("ts_t"), col("event_type"), col("event_id"),
        col("user_id"), col("value"),
        round(col("value") * 1e6, 0).cast("long").as("vm"),
        floor(col("value") * 100).cast("long").as("cents"))
      .withColumn("b", explode(sequence(lit(0), lit(PoissonBoot.B - 1))))
      .withColumn("u", PoissonBoot.u52(col("event_id"), col("b")))
      .withColumn("w", expr(PoissonBoot.weightSql("u")).cast("long"))
    val slice0 = col("b") === 0
    val bootAggs = PoissonBoot.replicaAggs(col("b"), col("w"), col("vm"))
    val aggs = Seq(
      round(Hll.hllDistinct(when(slice0, Hll.md5Hex(col("user_id")))), 4)
        .as("est_users"),
      Dd.ddQuantile(when(slice0, col("cents")), 0.50).as("p50_cents"),
      Dd.ddQuantile(when(slice0, col("cents")), 0.90).as("p90_cents"),
      Dd.ddQuantile(when(slice0, col("cents")), 0.99).as("p99_cents")) ++
      bootAggs
    val (lo, hi) = PoissonBoot.ciFromSorted
    rep.withWatermark("ts_t", "10 minutes")
      .groupBy(window(col("ts_t"), "5 minutes"), col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("ws"), col("event_type"),
        col("n_events"), col("est_users"),
        col("p50_cents"), col("p90_cents"), col("p99_cents"),
        (expr("(CASE WHEN sm_point < 0 THEN -1 ELSE 1 END) * " +
          "((2 * abs(sm_point) + n_events) div (2 * n_events))") / 1e6)
          .as("mean_value"),
        (lo / 1e6).as("ci_lo"), (hi / 1e6).as("ci_hi"))
  }

  /** The COMPOSED admission + monitoring deliverable: ONE readStream
    * through the [[admissionPipeline]] cascade, then the
    * [[windowedValueQuantiles]] DDSketch monitor AND the
    * [[windowedValueCi]] bootstrap-interval monitor run over the
    * verdict stream itself — per (5-minute window, stage): the
    * drop/admit count, sketch p50/p90/p99 of the quality score, and
    * the score's bootstrap mean CI, all in integer micro-units (qs is
    * 6-dp, so micro-units are exact — the q133 rule). This is the ops
    * dashboard of the ingestion door: admission mix, score
    * distribution drift AND the uncertainty of the mean per window
    * from one pass, no second subscription to the source (a mean
    * without its interval invites over-reading every wiggle — the q158
    * header's warning applies to this dashboard most of all). State
    * stays bounded by construction: the cascade is stateless
    * scan-local, the ×B replica explode is scan-local BEFORE the
    * aggregation, and the monitor keys on (window, stage ≤ 5) with a
    * fixed ≤ 8+8·60-bucket sketch + 2·B+3 longs per open group; the
    * sketches read only the b=0 slice, so each sees exactly the
    * unexploded stream. `ts` maps a verdict row to its event-time
    * (production: the ingest timestamp column; the spec pins parity
    * with a deterministic doc_id-derived time). Stages that never
    * score (exact/near drops: qs is null by the short-circuit
    * contract) report null quantiles AND null mean/CI — replica
    * weights are masked to score-bearing rows, so an unscored stage
    * has zero live replicas rather than a fabricated zero mean.
    */
  def admissionMonitor(docs: DataFrame, corpusFps: DataFrame,
                       corpusIndex: DataFrame, thresholds: DataFrame,
                       lmModel: DataFrame, lmMinScore: Double,
                       ts: Column, nearThreshold: Double = 0.5): DataFrame = {
    import graft.dedup.Dd
    import graft.ops.PoissonBoot
    val rep = admissionPipeline(docs, corpusFps, corpusIndex, thresholds,
        lmModel, lmMinScore, nearThreshold)
      .withColumn("ts_t", ts)
      .withColumn("qsm", round(col("qs") * 1e6).cast("long"))
      .withColumn("b", explode(sequence(lit(0), lit(PoissonBoot.B - 1))))
      .withColumn("u", PoissonBoot.u52(col("doc_id"), col("b")))
      // masked weight: only score-bearing rows join the resample — an
      // unscored doc must not inflate a replica's weight denominator
      .withColumn("w", when(col("qsm").isNotNull,
        expr(PoissonBoot.weightSql("u")).cast("long")))
    val slice0 = col("b") === 0
    val bootAggs = PoissonBoot.replicaAggs(col("b"), col("w"), col("qsm"))
    val aggs = Seq(
      Dd.ddQuantile(when(slice0, col("qsm")), 0.50).as("qs_p50_micro"),
      Dd.ddQuantile(when(slice0, col("qsm")), 0.90).as("qs_p90_micro"),
      Dd.ddQuantile(when(slice0, col("qsm")), 0.99).as("qs_p99_micro"),
      sum(when(slice0 && col("qsm").isNotNull, 1L).otherwise(0L))
        .as("n_scored")) ++ bootAggs
    val (lo, hi) = PoissonBoot.ciFromSorted
    rep.withWatermark("ts_t", "10 minutes")
      .groupBy(window(col("ts_t"), "5 minutes"),
        coalesce(col("stage"), lit("admitted")).as("stage"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("ws"), col("stage"),
        // n_events counts the b=0 slice = every offered doc, scored or not
        col("n_events").as("n_docs"),
        col("qs_p50_micro"), col("qs_p90_micro"), col("qs_p99_micro"),
        when(col("n_scored") > 0,
          expr("(CASE WHEN sm_point < 0 THEN -1 ELSE 1 END) * " +
            "((2 * abs(sm_point) + n_scored) div (2 * n_scored))"))
          .as("qs_mean_micro"),
        lo.as("qs_ci_lo_micro"), hi.as("qs_ci_hi_micro"))
  }
}
