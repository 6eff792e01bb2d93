package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch operators (SURVEY.md §2-C).
  *
  * The same logical computations as `EventOps.tumbling` and
  * `SessionOps.sessionize`, expressed over an unbounded source: watermarked
  * event-time windows for the aggregation, and `flatMapGroupsWithState`
  * for gap sessions (per-key state + event-time timeout — state size is
  * O(open sessions), not O(events), which is what survives an unbounded
  * 100 TB/day stream).
  */
object EventStream {

  /** One input event (the streaming projection of the events table). */
  case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)

  /** Emitted session (same shape as the batch `q_sessionize` output). */
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, duration_sec: Double)

  /** Open-session state carried between micro-batches. */
  case class SessionState(startUs: Long, lastUs: Long, n: Long)

  /** §2-C `windowedCounts`: watermark → tumbling (or sliding) event-time
    * window → per-type counts + value sum. The streaming twin of
    * `q_tumbling`: identical grouping semantics, plus late-data bounds.
    * Append-mode-ready (aggregation closes when the watermark passes the
    * window end). */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     slide: Option[String] = None,
                     watermark: String = "2 hours"): DataFrame = {
    val win = slide match {
      case Some(s) => window(col("ts"), windowLen, s)
      case None    => window(col("ts"), windowLen)
    }
    events
      .withWatermark("ts", watermark)
      .groupBy(win.as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("window_start"),
        col("win.end").as("window_end"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Gap threshold shared with the batch twin. */
  val GapUs: Long = graft.operators.SessionOps.GapUs

  /** §2-C `sessionize`: gap-based sessions via `flatMapGroupsWithState`.
    *
    * Per user: events in a micro-batch are processed in event-time order;
    * a gap > [[GapUs]] closes the current session and emits it. The
    * event-time timeout (watermark + gap) flushes idle sessions so state
    * never grows unboundedly. Update mode; one state row per active user. */
  def sessionize(events: Dataset[Event],
                 watermark: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed: flush the open session
            val out = state.getOption.map(emit(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.user_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val us = micros(e.ts)
              cur match {
                case Some(s) if us - s.lastUs > GapUs =>
                  closed += emit(userId, s)
                  cur = Some(SessionState(us, us, 1))
                case Some(s) =>
                  cur = Some(s.copy(lastUs = math.max(s.lastUs, us), n = s.n + 1))
                case None =>
                  cur = Some(SessionState(us, us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // time out once the watermark passes the gap after last event
              state.setTimeoutTimestamp((s.lastUs + GapUs) / 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** Exact micros from a Timestamp: whole seconds from the epoch millis
    * plus the FULL sub-second nanos — `getTime * 1000` pads milliseconds
    * with zeros and can land a sub-millisecond event on the wrong side of
    * the gap boundary vs the batch twin's `unix_micros`. */
  private def micros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def emit(userId: Long, s: SessionState): Session =
    Session(userId, fromMicros(s.startUs),
      fromMicros(s.lastUs), s.n, (s.lastUs - s.startUs) / 1e6)

  /** §2-C `sessionWindowStream`: gap-based sessions via Spark's NATIVE
    * `session_window` — the declarative twin of [[sessionize]]'s
    * flatMapGroupsWithState (same gap semantics up to the boundary tie:
    * the built-in merges while the gap is STRICTLY below the threshold)
    * and the streaming twin of `SessionOps.sessionWindow`
    * (q_session_window). The built-in operator owns session merge and
    * state cleanup under the watermark; append mode emits each session
    * exactly once, when the watermark passes its close. Scale shape is
    * the batch one: state and merge are partition-local after the
    * user_id shuffle. */
  def sessionWindowStream(events: DataFrame,
                          gap: String = "4 hours",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** A user's first qualified time per funnel stage (Long.MaxValue =
    * stage not yet reached); fixed size |steps|, so total state is
    * O(users × steps × 8 B) — the bounded cost of a live funnel. */
  case class FunnelState(times: List[Long])

  /** Emitted once per (user, stage): the moment the user first qualified. */
  case class StageHit(user_id: Long, stage: Int, ts: Timestamp)

  /** §2-C `funnelStream`: the LIVE funnel — the streaming twin of
    * `SessionOps.funnel`. Per user, `flatMapGroupsWithState` keeps one
    * first-qualified time per stage and emits a [[StageHit]] the moment
    * a stage is first reached (stage i qualifies when the event's type
    * is steps(i−1) and its time is STRICTLY after the stored
    * stage-(i−1) time — the batch operator's chain verbatim). Stage
    * counts/conversion are a downstream agg over the emitted hits.
    *
    * Each micro-batch is processed in event-time order, so for
    * in-order-by-batch arrival the emitted hits equal the batch funnel
    * exactly (spec-asserted); an out-of-order event that lands in a
    * LATER micro-batch can only delay a qualification, never invent one
    * — the append-mode hits stay set-once-correct, which is the
    * monitoring contract (the nightly batch funnel remains the exact
    * accounting). State never times out: a user mid-funnel stays
    * trackable indefinitely at 8·|steps| bytes. */
  def funnelStream(events: Dataset[Event],
                   steps: Seq[String] = graft.operators.SessionOps.FunnelSteps,
                   watermark: String = "2 hours"): Dataset[StageHit] = {
    import events.sparkSession.implicits._
    // Same 2-9-step contract as the batch funnel, PLUS distinctness:
    // stepIdx maps each event type to ONE stage, so a chain with a
    // repeated type (view->click->view — which the batch fold supports)
    // would silently drop the earlier stage. Refuse it here rather than
    // diverge from batch semantics.
    require(steps.size >= 2 && steps.size <= 9, "funnel needs 2-9 steps")
    require(steps.distinct.size == steps.size,
      s"funnelStream needs distinct step types (got $steps); " +
        "repeated-type chains are batch-funnel-only")
    val stepIdx = steps.zipWithIndex.toMap
    events
      .filter(col("event_type").isin(steps: _*))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          val times = state.getOption.map(_.times.toArray)
            .getOrElse(Array.fill(steps.size)(Long.MaxValue))
          val hits = Seq.newBuilder[StageHit]
          batch.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
            val us = micros(e.ts)
            val i = stepIdx(e.event_type)
            val qualified = times(i) == Long.MaxValue &&
              (i == 0 || (times(i - 1) != Long.MaxValue && us > times(i - 1)))
            if (qualified) {
              times(i) = us
              hits += StageHit(userId, i + 1, fromMicros(us))
            }
          }
          state.update(FunnelState(times.toList))
          hits.result().iterator
      }
  }

  /** §2-C `anomalyStream`: live 3σ scoring against PERSISTED per-user
    * moments — the deployment split of `q_anomaly`: a nightly batch job
    * writes `StatsOps.userMoments` (n, S, Q — exact integers) and the
    * stream scores each CLOSED day against them (watermarked tumbling
    * 1-day window emits a day's cent sum once late data can no longer
    * change it). The moments ride in as a THUNK re-evaluated per
    * micro-batch (the `profileStream`/`classifyStream`/`annSearchStream`
    * convention, unified here in round 10): a nightly refresh written
    * to a NEW path is picked up by the next trigger without a query
    * restart — the file-listing snapshot trap applies per batch, not
    * per query. The flag test IS `StatsOps.exceeds3Sigma`
    * and the day sum IS the batch `dailyCents` definition — shared
    * expressions, so batch and stream cannot drift. Stream-static join
    * on user_id: stateless beyond the window agg, no stream-side
    * moments state. */
  def anomalyStream(events: DataFrame, moments: () => DataFrame,
                    watermark: String = "1 day")
                   (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.StatsOps
    // the day-sum agg must live in the streaming engine (watermarked
    // state; append mode emits each day once, when it closes); the
    // moments join runs per micro-batch so the THUNK re-resolves a
    // refreshed artifact live — round 10's unification: every
    // stream-static model/baseline side now takes () => DataFrame
    val days = events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), window(col("ts"), "1 day").as("w"))
      .agg((sum(col("value").cast(graft.functions.EventCols.d18)) * 100)
        .cast("long").as("xc"))
      .select(col("user_id"), col("w.start").cast("date").as("day"), col("xc"))
    days.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(batch.join(moments(), "user_id") // user_id, n, s, q
          .filter(StatsOps.exceeds3Sigma)
          .select(col("user_id"), col("day"),
            (col("xc") / 100.0).as("day_sum"), col("n").as("n_days")), id)
      }
      .start()
  }

  /** §2-C streaming profile DRIFT — the live face of `q_profile_drift`,
    * completing the ingest-QA family's batch/stream pair (q_profile /
    * q_profile_by_source / q_drop_diff / q_anomaly all have one): each
    * micro-batch of documents is a DROP, profiled per source and
    * diffed against the persisted baseline manifest (a prior
    * `CorpusOps.profileBySource` output), emitting the per-(source,
    * col_name, metric) drift rows. A per-batch profile is a
    * per-trigger COMPLETE computation, not a running aggregate — the
    * [[annSearchStream]] shape — so it runs through `foreachBatch`:
    * the drift frame for each trigger goes to `sink` with the batch id.
    *
    * The whole computation IS `CorpusOps.profileDrift` — one shared
    * definition, so batch and stream cannot drift about drift. The
    * baseline rides in as a THUNK re-evaluated every micro-batch
    * ([[annSearchStream]]'s convention): a nightly baseline refresh
    * written to a NEW path is picked up by the next trigger without a
    * query restart — the file-listing-snapshot trap ([[anomalyStream]]'s
    * contract) applies per-batch, not per-query. Cost: profiling the
    * batch is one pass over the batch; the join touches two
    * |sources|×|cols| manifests — KBs at any scale. */
  def profileStream(docs: DataFrame, baseline: () => DataFrame)
                   (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.operators.CorpusOps.profileDrift(batch, baseline()), id)
      }
      .start()

  /** §2-C streaming exactly-once dedup: drop duplicate event ids within
    * the watermark horizon — the streaming twin of `q_dedup_exact` for an
    * at-least-once ingest (Kafka replays, task retries). State is bounded
    * by the watermark: ids older than it are evicted, which is the only
    * way unbounded-stream dedup stays O(window). */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** §2-C streaming incremental NEAR-dup dedup: the streaming twin of
    * `DedupOps.dedupIncremental`, completing the twin pattern — the
    * micro-batch IS the delta. Each batch of (doc_id, text) documents
    * maps to its MinHash band keys (`DedupOps.minhashBandKeys` — one
    * row-level native-expression signature pass, stateless, so it runs
    * unchanged on an unbounded stream) and stream-static-joins the
    * PERSISTED corpus band index (the write-once (band, key)-bucketed
    * frame a real pipeline maintains with `Tables.writeBucketed`; note
    * the static side's file listing is snapshotted at DataFrame build —
    * an index refresh needs a new path + query restart, same contract as
    * [[anomalyStream]]). Corpus×corpus pairs never
    * form — candidates are (new, corpus) band collisions only, exactly
    * the batch twin's universe (spec-asserted batch-equivalent on the
    * same delta in StreamingSpec).
    *
    * The trailing `dropDuplicates` collapses multi-band collisions AND
    * re-reports of the same pair across micro-batches (an at-least-once
    * source replaying docs). Its state grows with the distinct REPORTED
    * pair set — the matches, not the corpus; a production deployment
    * whose stream carries an ingest timestamp should swap in
    * `dropDuplicatesWithinWatermark` to bound state by the replay
    * horizon instead (the same trade [[dedupStream]] makes). Append
    * mode; exactly-once into a file sink via checkpointed offsets +
    * the transactional sink log (restart spec'd like
    * [[writePartitionedStream]]). */
  def dedupIncrementalStream(docs: DataFrame, corpusIndex: DataFrame,
                             k: Int = graft.operators.DedupOps.MinhashK,
                             bands: Int = graft.operators.DedupOps.Bands)
      : DataFrame =
    graft.operators.DedupOps.minhashBandKeys(docs, k, bands).as("d")
      .join(corpusIndex.as("c"),
        col("d.band") === col("c.band") && col("d.key") === col("c.key"))
      .select(col("d.doc_id").as("doc_new"), col("c.doc_id").as("doc_corpus"))
      .dropDuplicates("doc_new", "doc_corpus")

  /** §2-C streaming incremental EMBEDDING dedup — the rp-LSH twin of
    * [[dedupIncrementalStream]], completing the 2×2 (MinHash/rp ×
    * batch/stream) ingestion matrix: each micro-batch of
    * (vec_id, embedding) rows maps to its random-hyperplane band keys
    * (the stateless native `rp_band_keys` — stream-safe like the
    * MinHash signature pass), stream-static-joins the persisted corpus
    * band index, fetches the collided corpus vectors from the persisted
    * vector table, and cosine-verifies at τ. The embedding payload
    * rides the micro-batch's exploded band stream — unlike the batch
    * path, which keeps its band stream payload-free — because a
    * micro-batch delta is small by definition and the ride saves a
    * stream-stream self-join (which would need watermark state).
    * Cosine verify runs BEFORE the pair dedup so the dropDuplicates
    * state holds (vec_new, vec_corpus, cos) rows, never the 64-float
    * payload. Batch-equivalence vs `DedupOps.dedupEmbeddingIncremental`
    * on the same delta is spec-asserted; the state-bound and
    * exactly-once stories are [[dedupIncrementalStream]]'s. */
  def dedupEmbeddingIncrementalStream(vecs: DataFrame,
                                      corpusIndex: DataFrame,
                                      corpusVectors: DataFrame,
                                      tau: Double = 0.4,
                                      bands: Int = graft.plans.RpLsh.Bands,
                                      bitsPerBand: Int = graft.plans.RpLsh.BitsPerBand)
      : DataFrame = {
    import graft.functions.VectorFuns
    graft.plans.GraftFunctions.register(vecs.sparkSession)
    val delta = vecs
      .select(col("vec_id"), col("embedding"),
        VectorFuns.l2normNative(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0.0)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(call_function("rp_band_keys", col("embedding"),
          lit(bands), lit(bitsPerBand))).as(Seq("band", "key")))
    val corpus = corpusVectors
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        VectorFuns.l2normNative(col("embedding")).as("c_nrm"))
      .filter(col("c_nrm") > 0.0)
    delta.as("d")
      .join(corpusIndex.as("ci"),
        col("d.band") === col("ci.band") && col("d.key") === col("ci.key"))
      .select(col("d.vec_id").as("vec_new"), col("d.embedding").as("embedding"),
        col("d.nrm").as("nrm"), col("ci.vec_id").as("vec_corpus"))
      .join(corpus, col("vec_corpus") === col("c_id"))
      .select(col("vec_new"), col("vec_corpus"),
        VectorFuns.cosine6Pre(col("embedding"), col("c_emb"),
          col("nrm"), col("c_nrm")).as("cos"))
      .filter(col("cos") >= tau)
      .dropDuplicates("vec_new", "vec_corpus")
  }

  /** §2-C streaming curation — scrub-on-ingest, the streaming twin of
    * `CorpusOps.curate`: every GATE of the batch manifest is a stateless
    * row-level Column (language, quality, probe decontamination, split,
    * token count), so the gate chain runs unchanged on an unbounded
    * stream of (doc_id, text, source) rows — one micro-batch pass, no
    * state. The one STATEFUL stage — the exact-dup representative —
    * becomes the two ingestion-shaped pieces every incremental operator
    * here uses:
    *   1. docs whose text_hash already exists in the STANDING corpus
    *      drop via a stream-static LEFT-ANTI join against the persisted
    *      hash index (a one-column (text_hash) frame the batch estate
    *      maintains; its file listing is snapshotted at DataFrame
    *      build, so an index refresh needs a new path + query restart
    *      — [[anomalyStream]]'s contract);
    *   2. within and across micro-batches, `dropDuplicates(text_hash)`
    *      keeps the FIRST arrival as the representative — arrival order
    *      replaces the batch path's min-doc_id convention, the honest
    *      streaming semantics (the min id of copies that have not
    *      arrived yet is unknowable).
    * State is one 32-char hash per distinct ingested text — never the
    * text itself; an ingest-timestamped deployment swaps in
    * `dropDuplicatesWithinWatermark` to bound it by the replay horizon
    * ([[dedupStream]]'s trade). Append mode; exactly-once via the
    * checkpointed transactional file sink like every sink here. */
  def curateStream(docs: DataFrame, corpusHashIndex: DataFrame,
                   publishedGates: Boolean = false,
                   badwords: Seq[String] = Nil): DataFrame = {
    import graft.functions.TextFuns
    import graft.operators.CorpusOps
    if (publishedGates) graft.plans.GraftFunctions.register(docs.sparkSession)
    // the gate chain is CorpusOps.gated — ONE definition across
    // corpusFilter/curate/this, so batch and stream cannot drift; the
    // WIDE manifest's published gates (gopher ∧ C4 ∧ repetition ∧
    // blocklist — CorpusOps.publishedGateCol, shared with curateFullOf)
    // are ALL stateless row-level booleans, so they ride the same
    // micro-batch pass when enabled. Only the LM band cannot stream
    // (corpus-level model) — a deployment screens it downstream against
    // a persisted model snapshot.
    val gated0 = CorpusOps.gated(docs, decontaminate = true)
    val gatedAll =
      if (publishedGates)
        gated0.filter(CorpusOps.publishedGateCol(badwords, repetition = true))
      else gated0
    gatedAll
      .join(corpusHashIndex.select(col("text_hash")), Seq("text_hash"), "left_anti")
      .dropDuplicates("text_hash")
      .select(col("doc_id"), col("source"), col("quality_score"),
        size(TextFuns.tokens(col("text"))).as("n_tokens"),
        CorpusOps.splitOf(col("doc_id")).as("split"))
  }

  /** §2-C streaming bloom DECONTAMINATION — the scrub-on-ingest face of
    * `CorpusOps.contaminationBloom`, completing the decontamination
    * family's batch/stream pair the way curateStream pairs q_curate:
    * every arriving doc's token n-grams are screened by the broadcast
    * probe bitmap (a row-level codegen'd `bloom_contains` — no join, no
    * shuffle, nothing stateful), emitting flagged (doc_id, gram) hits.
    * The whole screen is `CorpusOps.bloomFlaggedRaw` — the SAME
    * definition the batch operator aggregates, so the two estates
    * cannot drift (batch adds distinct+count; the stream adds
    * `dropDuplicates`, whose state is the REPORTED hits only — false
    * positives included, a tiny fraction of the stream; an
    * ingest-timestamped deployment swaps in
    * dropDuplicatesWithinWatermark, the [[dedupStream]] trade). The
    * probes frame is static — file-backed probes snapshot their listing
    * at DataFrame build, so a probe-set refresh needs a new path +
    * query restart ([[anomalyStream]]'s contract). At 100 TB/day the
    * stream cost is exactly the batch screen's: one pass, bitmap
    * broadcast, only hits move. */
  def contaminationBloomStream(docs: DataFrame, probes: DataFrame,
                               hexChars: Int = graft.plans.GraftBloom.DefaultHexChars)
      : DataFrame =
    graft.operators.CorpusOps.bloomFlaggedRaw(docs, probes, hexChars)
      .dropDuplicates("doc_id", "gram")

  /** §2-C streaming ANN SERVING — the search-side twin next to the
    * ingestion-side [[dedupEmbeddingIncrementalStream]], completing the
    * index estate's two deployment faces: an unbounded stream of
    * (q_id, embedding) request vectors searches the PERSISTED int8
    * index (`AnnOps.quantizedVectors`' layout off disk), emitting each
    * request's top-k.
    *
    * Per-query top-k is a RANKING — not expressible as a watermarked
    * streaming aggregation — so the query runs through `foreachBatch`:
    * every trigger's requests form a bounded frame and the ordinary
    * batch serving plan (`AnnOps.annIvfQ8Multi` — centroid sums once
    * per batch, probed-list pruning, windows over queries×candidates)
    * answers the whole batch in one go; `sink` receives the batch's
    * results (+ the batch id) and appends them wherever the serving
    * store lives. This IS the deployment shape of a retrieval service
    * on micro-batch infrastructure: amortize the index pass over each
    * request batch, never re-train anything. The static index frame is
    * re-evaluated per micro-batch, so a nightly index rebuild picks up
    * without restarting the query (the stream-static convention here).
    * Batch-equivalence vs the batch search on the same queries is
    * spec-asserted in StreamingSpec. */
  def annSearchStream(queries: DataFrame, index: () => DataFrame,
                      k: Int = 5, nProbe: Int = 2)
                     (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.operators.AnnOps.annIvfQ8Multi(index(), batch, k, nProbe),
          id)
      }
      .start()

  /** §2-C streaming WARC ingest (round 18) — the live face of
    * `PdfOps.warcToCorpus`, so a live crawl's PDF estate no longer
    * waits for the nightly batch: each micro-batch of WARC record rows
    * lands in the CLEAN document schema — the HTML route
    * (`HtmlOps.warcToDocuments`) ∪ the PDF route (`PdfOps
    * .pdfDocumentsOf`), with the same content-based routing (a %PDF-
    * body behind a lying header sniffs into the PDF walk, never the
    * void). Ingest is a per-trigger COMPLETE computation — the
    * records→documents map holds no cross-batch state (revisit/dedup
    * is [[curateStream]]'s job downstream), and the HTML route caches
    * its two-consumer frame internally — so it runs through
    * `foreachBatch` executing the SHARED batch function per trigger
    * (the [[profileStream]]/[[annSearchStream]] shape): batch and
    * stream cannot drift because they are the same code. `sink`
    * receives each trigger's document frame + batch id (append it to
    * the corpus store). Batch twin: `q_pdf_text` grades the PDF walk
    * under the oracle; batch ≡ stream on a WARC fixture with an HTML +
    * PDF + broken-PDF record is spec-asserted in StreamingSpec. */
  def warcToCorpusStream(records: DataFrame)
                        (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    records.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.operators.PdfOps.warcToCorpus(batch), id)
      }
      .start()

  /** §2-C streaming MEDIA INVENTORY (round 18) — the live face of
    * `MediaOps.mediaInventoryOf`, riding beside [[warcToCorpusStream]]
    * on the same record stream: each micro-batch of WARC records is
    * named (declared-vs-sniffed), measured (the MP4/MP3/WebP/Ogg
    * walks), and lie-flagged per trigger. The inventory is stateless
    * per record, and runs through `foreachBatch` executing the SHARED
    * batch function (batch and stream are the same code — the
    * [[warcToCorpusStream]] contract). */
  def mediaInventoryStream(records: DataFrame)
                          (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    records.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.operators.MediaOps.mediaInventoryOf(batch), id)
      }
      .start()

  /** §2-C stream-STREAM interval join: pair each left event with the
    * same user's right events landing within `(l_ts, l_ts + maxGap]` —
    * the attribution shape (view→click, impression→conversion) that
    * NEEDS two live sides, where [[enrichStream]]'s broadcast dim can't
    * help. The streaming twin of the batch `q_window_after`/range-join
    * family.
    *
    * Both sides are watermarked and the join condition carries an
    * explicit time bound, so Spark derives state-eviction watermarks for
    * BOTH buffers: each side holds only `watermark + maxGap` of events
    * per user — state is O(rate × gap), never O(stream). Without the
    * time bound the state would grow without limit; this operator makes
    * the bound part of its signature. Shuffle: both sides hash-partition
    * on user_id once, the interval predicate evaluates inside the
    * co-partitioned join — the same one-keyed-shuffle budget as the
    * batch twin. Inner join → append mode; results emit as soon as both
    * sides arrive (no watermark wait on the match itself). */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       maxGap: String = "10 minutes",
                       watermark: String = "20 minutes",
                       joinType: String = "inner"): DataFrame = {
    // the gap is spliced into SQL text — accept only a plain duration
    // literal so a malformed caller value fails HERE, not as a parser
    // error three operators deep
    require(maxGap.matches("\\d+ (millisecond|second|minute|hour|day)s?"),
      s"maxGap must be '<n> <unit>', got '$maxGap'")
    val l = left.select(col("user_id"), col("ts").as("l_ts"),
        col("event_type").as("l_type"), col("value").as("l_value"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_type").as("r_type"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
        col("user_id") === col("r_user") &&
          col("r_ts") > col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGap"),
        joinType)
      .select(col("user_id"), col("l_ts"), col("l_type"), col("l_value"),
        col("r_ts"), col("r_type"), col("r_value"))
  }

  /** The NEGATIVE-attribution face of [[streamStreamJoin]]: left events
    * with NO matching right event inside the gap — e.g. views that never
    * converted, ingest batches that never acked. Structured Streaming
    * semantics worth spelling out: a LEFT OUTER interval join cannot
    * emit the null-matched row until the WATERMARK passes the end of the
    * left row's match window (only then is "no match" final) — so
    * results trail by `watermark + maxGap`, the price of a correct
    * negative. State stays bounded exactly like the inner join. */
  def streamStreamUnmatched(left: DataFrame, right: DataFrame,
                            maxGap: String = "10 minutes",
                            watermark: String = "20 minutes"): DataFrame =
    streamStreamJoin(left, right, maxGap, watermark, "left_outer")
      .filter(col("r_ts").isNull)
      .select(col("user_id"), col("l_ts"), col("l_type"), col("l_value"))

  /** §2-C stream-static CLASSIFICATION: score each micro-batch of
    * documents against a PERSISTED NB model (the
    * `ClassifierOps.nbModel` grid + `nbPrior` table written at train
    * time) — the train-batch / apply-stream deployment of the
    * classifier family, e.g. live langid on an ingest stream before
    * routing. Per batch: `ClassifierOps.nbApply` (broadcast model, one
    * token pass, doc-partitioned argmax) — the SAME function the batch
    * estate uses, so stream and batch predictions cannot drift. The
    * model frames ride in as THUNKS re-evaluated per micro-batch (the
    * profileStream convention): a nightly retrain at a NEW path is
    * picked up without restarting the query.
    *
    * Input contract: `docs` carries (doc_id, lang, text) — `lang` is
    * only echoed as the "actual" column; for an UNLABELED stream pass a
    * constant (`lit("unknown").as("lang")`), the prediction ignores
    * it. */
  def classifyStream(docs: DataFrame, model: () => DataFrame,
                     prior: () => DataFrame)
                    (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.operators.ClassifierOps.nbApply(batch, model(), prior()), id)
      }
      .start()

  /** §2-C stream-static enrichment: join the unbounded stream against a
    * bounded dimension, broadcast per micro-batch — no stream-side
    * state at all, unlike a stream-stream join. The dim is a THUNK
    * re-evaluated every trigger (the shared static-side convention —
    * see [[anomalyStream]]), so a slowly-changing-dimension refresh at
    * a new path is live by the next batch with no query restart. This
    * is the dimension-enrichment shape of `q_revenue_nation` on a live
    * stream; at 100 TB/day the stream never shuffles. */
  def enrichStream(events: DataFrame, dim: () => DataFrame,
                   key: String = "user_id")
                  (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(batch.join(broadcast(dim()), Seq(key), "left"), id)
      }
      .start()

  /** §2-C streaming TOKENIZATION — the deployment face of the trained
    * BPE tokenizer (rows 97-98): each micro-batch of documents encodes
    * against the PERSISTED artifact (`BpeOps.readTokenizer` of a
    * nightly `trainTokenizer` run) through the same `encodeWithVocab`
    * the batch estate uses — stream and batch token counts cannot
    * drift (spec-asserted equal). The tokenizer rides in as a thunk:
    * a nightly retrain at a new path is picked up live. Stateless —
    * the merge table + vocab broadcast per batch, the encode is the
    * batch op's pure map. */
  def tokenizeStream(docs: DataFrame,
                     tokenizer: () => (DataFrame, DataFrame))
                    (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val (mt, vocab) = tokenizer()
        sink(graft.operators.BpeOps.encodeWithVocab(batch, mt, vocab), id)
      }
      .start()

  /** §2-C streaming sink: append the stream to a day-partitioned parquet
    * layout with exactly-once file commits (checkpointed offsets +
    * Spark's transactional file sink). The streaming twin of
    * `Sinks.writePartitionedByDay` — downstream BATCH readers
    * partition-prune the same `day=` directories, which is how a live
    * ingest and the 100 TB batch estate share one table layout. */
  def writePartitionedStream(events: DataFrame, path: String,
                             checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.sources.Sinks.withDay(events)
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("day")
      .outputMode(OutputMode.Append())
      .start()

  /** §2-C streaming twin of `SessionOps.windowAfter`: stream-stream
    * interval join — for each type-A event, the type-B events of the same
    * user within `band` after it. Watermarks on BOTH sides bound the join
    * state (Spark drops buffered rows once the watermark passes the
    * interval), which is what keeps an unbounded self-correlation feasible
    * — state is O(events in the band window), not O(stream). Append mode. */
  def windowAfterStream(typeA: DataFrame, typeB: DataFrame,
                        band: String = "6 hours",
                        watermark: String = "2 hours"): DataFrame = {
    val a = typeA.withWatermark("ts", watermark)
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"),
        col("ts").as("a_ts"))
    val b = typeB.withWatermark("ts", watermark)
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
    a.join(b, expr(
      s"a_user = b_user AND b_ts > a_ts AND b_ts <= a_ts + interval $band"))
  }
}
