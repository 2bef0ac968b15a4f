package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value). Each has a batch twin in
  * graft.Queries so correctness is pinned by the DuckDB oracle while the
  * streaming path is pinned by streaming==batch suite checks.
  *
  * Scale notes: all three are keyed-state operators whose state is bounded
  * by watermarking — the 100 TB/day version only tunes watermark delay,
  * shuffle partitions, and state-store provider (RocksDB).
  */
object StreamingOps {

  /** Tumbling 1h windowed aggregation with watermark — the streaming twin
    * of Queries.q6EventWindows.
    */
  def windowedEventCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("event_count"), sum("value").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("event_count"), col("sum_value"))

  /** Gap-based sessions via the built-in session_window (Catalyst-native
    * state merging) — streaming twin of Queries.pSessions.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("n_events"))

  /** Streaming exact dedup: first occurrence of each content fingerprint
    * wins; watermarking bounds the dedup state to the lateness horizon —
    * the streaming twin of Dedup.exactDedup for continuous ingestion.
    */
  def dedupStream(
      docs: DataFrame,
      fingerprintCol: String,
      eventTimeCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark(eventTimeCol, watermark)
      // WithinWatermark, not plain dropDuplicates: only the watermarked
      // variant lets the state store purge expired fingerprints — the
      // plain one keys state on fingerprint forever (unbounded state)
      .dropDuplicatesWithinWatermark(fingerprintCol)

  /** Stream-stream interval join: match each `right` event to `left`
    * events of the same user within [0, window] after the left event —
    * e.g. purchases attributed to clicks. State on both sides is bounded
    * by the watermark + interval condition.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"), col("event_id").as("r_id"))
    l.join(
      r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $window"))
      .select(col("user_id"), col("l_id"), col("r_id"),
        unix_timestamp(col("l_ts")).as("l_epoch"),
        unix_timestamp(col("r_ts")).as("r_epoch"))
  }

  // -------- streaming near-dup dedup: MinHash bucket state ---------------

  /** One (band, bucket) row of a streaming doc's banded MinHash signature. */
  case class BandedDoc(
      doc_id: Long, ts: java.sql.Timestamp, band: Int, bucket: Long, signature: Seq[Long])

  /** A detected near-dup: `doc_id` matched `dup_of` (an earlier-seen doc in
    * a shared bucket) at `est_jaccard` estimated similarity. The same pair
    * can surface from several bands; aggregate per doc downstream.
    */
  case class NearDupHit(doc_id: Long, dup_of: Long, est_jaccard: Double)

  /** Per-bucket keyed state: the docs seen in this bucket. POSITIONAL
    * semantics keep the state-store schema stable across upgrades (an
    * added field would fail Spark's state-schema compatibility check on
    * checkpoint resume): the first `maxPerBucket` entries are the STORED
    * docs (with signatures on the exact-hit path), and entries past that
    * are an id-only FIFO of docs that arrived while the store was full —
    * their signatures are not kept (the cap is the point), but
    * remembering the ids keeps a doc that re-arrives in a later
    * micro-batch from being emitted a second time. The FIFO region is
    * itself capped (ids are 8 bytes, so the cap is generous); past it
    * the operator degrades to at-least-once per doc — consumers that
    * need exactly-one hit per doc aggregate on doc_id downstream (they
    * already must: the same pair can surface from several bands).
    */
  case class BucketState(docs: Seq[BucketStateDoc])
  case class BucketStateDoc(doc_id: Long, signature: Seq[Long])

  /** The shared per-bucket state protocol of [[nearDupHitsStream]] and
    * [[nearDupCandidatesStream]] — ONE copy of the invariants both docs
    * claim to share: deterministic arrival order (event time, then id),
    * re-arrival suppression via an O(1) membership set, store-then-
    * overflow append with FIFO eviction of the oldest overflow entry,
    * and the max(event time, watermark) + horizon timeout anchor.
    * `emit` sees each NEW doc plus the currently stored entries (never
    * the overflow region) and produces that doc's output rows.
    */
  private def bucketStateLoop[T](
      rows: Iterator[BandedDoc],
      state: GroupState[BucketState],
      maxPerBucket: Int,
      stateHorizonMs: Long,
      keepSignature: Boolean)(
      emit: (BandedDoc, Seq[BucketStateDoc]) => Iterator[T]): Iterator[T] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var docs = state.getOption.map(_.docs).getOrElse(Seq.empty)
      val seen = scala.collection.mutable.HashSet.empty[Long]
      docs.foreach(d => seen += d.doc_id)
      val overflowCap = maxPerBucket * 8
      val out = Seq.newBuilder[T]
      var maxTs = 0L
      rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
        if (d.ts.getTime > maxTs) maxTs = d.ts.getTime
        if (!seen.contains(d.doc_id)) {
          seen += d.doc_id
          out ++= emit(d, docs.take(maxPerBucket))
          if (docs.length < maxPerBucket)
            docs = docs :+ BucketStateDoc(d.doc_id, if (keepSignature) d.signature else Seq.empty)
          else {
            docs = docs :+ BucketStateDoc(d.doc_id, Seq.empty)
            if (docs.length - maxPerBucket > overflowCap)
              docs = docs.patch(maxPerBucket, Nil, 1)
          }
        }
      }
      state.update(BucketState(docs))
      // anchor on max(event time, watermark): on the FIRST batch the
      // watermark is still 0, and a watermark-only anchor would expire
      // every bucket before the second batch arrives
      state.setTimeoutTimestamp(
        math.max(maxTs, state.getCurrentWatermarkMs()) + stateHorizonMs)
      out.result().iterator
    }
  }

  /** Streaming half of the batch MinHash pipeline: per-row signatures
    * (scalar — no streaming aggregation needed) banded into (band, bucket)
    * keys. Buckets are bit-identical to the batch path's
    * (`MinHashSignature.signatureOf` / `sliceHash` share the aggregate's
    * seeds and mixer — parity is suite-pinned), so a streaming detector
    * can be backfilled or cross-checked against `Dedup.minhashPairs`
    * output on the same data.
    */
  def minhashBanded(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      watermark: String = "1 hour"): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.graft.MinHashSignature
    import org.apache.spark.sql.graft.ShingleHashesFn.shingle_hashes
    val rows = numHashes / bands
    require(rows > 0 && numHashes % bands == 0,
      s"bands=$bands must divide evenly into numHashes=$numHashes")
    docs
      // drop bad rows up front: the batch twin sheds them harmlessly in
      // its explode, but here they would hit the typed flatMap (NPE in
      // signatureOf / non-nullable Long decode) and a single bad record
      // must not kill a continuous query. Filter AFTER the cast, on the
      // casted column — and use try_cast, which yields null on a
      // malformed value where ANSI-mode cast would throw: a non-numeric
      // string id is not null pre-cast, so a pre-cast guard lets it
      // through to the decode. Null text propagates through
      // tokens/shingle_hashes to a null shingle column; null ts would
      // NPE in the state function's sort.
      .select(
        col(idCol).try_cast("long").as("doc_id"),
        col(tsCol).as("ts"),
        shingle_hashes(graft.pipeline.TextFunctions.tokens(col(textCol)), shingleSize).as("sh"))
      .where(col("doc_id").isNotNull && col("ts").isNotNull && col("sh").isNotNull)
      .as[(Long, java.sql.Timestamp, Seq[Long])]
      .flatMap { case (id, ts, sh) =>
        val sig = MinHashSignature.signatureOf(sh, numHashes)
        val sigSeq = sig.toSeq
        (0 until bands).map { b =>
          BandedDoc(id, ts, b, MinHashSignature.sliceHash(sig, b * rows, rows, b.toLong), sigSeq)
        }
      }
      // AFTER the typed flatMap: an opaque map severs event-time lineage,
      // so the watermark must be declared on the output's ts field
      .withWatermark("ts", watermark)
  }

  /** Streaming near-dup detection: per-(band, bucket) keyed state stores
    * the signatures seen in that bucket; an arriving doc is flagged
    * against its best signature match at >= `threshold` estimated Jaccard
    * (fraction of agreeing components — the same estimator as the batch
    * `minhashPairs`). The per-bucket store is capped at `maxPerBucket`
    * (the batch path's bucket-frequency guard: a degenerate bucket holding
    * half the corpus must not become O(n) state and O(n^2) compares), and
    * event-time timeout purges buckets idle past the watermark plus
    * `stateHorizonMs` — state is bounded by rate x horizon, the RocksDB
    * state-store knobs tune the rest at scale.
    *
    * Payload note: exact in-bucket comparison requires each doc's FULL
    * signature in every one of its band rows, so the state shuffle and
    * store carry a bands× signature multiplier. At production volume use
    * [[nearDupCandidatesStream]], which shuffles and stores ids only and
    * defers verification downstream (the batch propose/verify split).
    */
  def nearDupHitsStream(
      banded: Dataset[BandedDoc],
      threshold: Double = 0.5,
      maxPerBucket: Int = 64,
      stateHorizonMs: Long = 3600000L): Dataset[NearDupHit] = {
    import banded.sparkSession.implicits._
    banded
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          bucketStateLoop(rows, state, maxPerBucket, stateHorizonMs,
            keepSignature = true) { (d, stored) =>
            var bestId = -1L
            var bestJ = 0.0
            stored.foreach { sd =>
              val n = math.min(sd.signature.length, d.signature.length)
              var agree = 0
              var i = 0
              while (i < n) {
                if (sd.signature(i) == d.signature(i)) agree += 1
                i += 1
              }
              val j = if (n == 0) 0.0 else agree.toDouble / n
              if (j > bestJ || (j == bestJ && bestId >= 0 && sd.doc_id < bestId)) {
                bestJ = j
                bestId = sd.doc_id
              }
            }
            if (bestId >= 0 && bestJ >= threshold)
              Iterator.single(NearDupHit(d.doc_id, bestId, math.rint(bestJ * 1e6) / 1e6))
            else Iterator.empty
          }
      }
  }

  /** Signature-free band row: what [[nearDupCandidatesStream]] actually
    * shuffles — 4 primitive columns, no `Seq[Long]` payload.
    */
  case class BandedIdRow(doc_id: Long, ts: java.sql.Timestamp, band: Int, bucket: Long)

  /** An LSH candidate pair: `doc_id` shares a band bucket with the
    * earlier-seen `candidate_of`. NOT yet a verified near-dup — verify
    * downstream exactly as the batch path does (the same pair can also
    * surface from several bands; aggregate before verifying).
    */
  case class CandidatePair(doc_id: Long, candidate_of: Long)

  /** The production-volume streaming near-dup shape: CANDIDATE generation
    * only, with the signature payload stripped BEFORE the state shuffle.
    *
    * [[nearDupHitsStream]] compares full signatures inside every bucket,
    * which forces each doc's signature to ride all `bands` of its band
    * rows through the shuffle and sit in every bucket's state — a bands×
    * payload multiplier (default 16-hash config: ~136 bytes of signature
    * per row and per stored doc) that single-stage exact-hit semantics
    * cannot avoid. This operator instead mirrors the batch pipeline's
    * propose/verify split ([[graft.pipeline.Dedup.minhashCandidatePairs]]
    * then exact verification): per-bucket state keeps only doc ids
    * (empty signatures in the shared [[BucketState]] — 8 meaningful
    * bytes per doc, same `maxPerBucket` cap and re-arrival FIFO), the
    * shuffle carries 4 primitive columns (enforced by projecting the
    * typed input down to [[BandedIdRow]] — Catalyst prunes the signature
    * out of the exchange), and every arriving doc emits one
    * [[CandidatePair]] per stored earlier doc in its bucket. Verification
    * — estimated-Jaccard against a maintained signature artifact (cf.
    * [[graft.pipeline.Dedup.bandedCorpusArtifact]]) or exact-Jaccard
    * against text — runs downstream in `foreachBatch`, where it joins a
    * candidate-bounded set instead of riding every state row. State is
    * rate × horizon × 8 bytes instead of × signature width; candidate
    * counts are bounded by `maxPerBucket` per bucket per arrival exactly
    * like the batch bucket-frequency guard.
    */
  def nearDupCandidatesStream(
      banded: Dataset[BandedDoc],
      maxPerBucket: Int = 64,
      stateHorizonMs: Long = 3600000L): Dataset[CandidatePair] = {
    import banded.sparkSession.implicits._
    val slim = banded
      .select(col("doc_id"), col("ts"), col("band"), col("bucket"))
      .as[BandedIdRow]
    slim
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[BandedIdRow], state: GroupState[BucketState]) =>
          // re-widen AFTER the shuffle (free: the slim projection already
          // paid off in the exchange) so both operators share ONE state
          // loop and state schema
          val widened = rows.map(r => BandedDoc(r.doc_id, r.ts, r.band, r.bucket, Seq.empty))
          bucketStateLoop(widened, state, maxPerBucket, stateHorizonMs,
            keepSignature = false) { (d, stored) =>
            stored.iterator.map(earlier => CandidatePair(d.doc_id, earlier.doc_id))
          }
      }
  }

  /** The verify half of the streaming propose/verify split: estimate
    * Jaccard for a micro-batch of [[CandidatePair]]s by signature
    * component agreement — the SAME estimator as the batch
    * `Dedup.minhashPairs` — against a signature table (the maintained
    * corpus artifact's signatures plus the recent batch's; at 100 TB
    * this joins a CANDIDATE-BOUNDED set, never the corpus). Designed for
    * `foreachBatch` on [[nearDupCandidatesStream]] output:
    *
    * {{{
    * cands.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
    *   StreamingOps.verifyCandidatesBatch(batch, signatures, 0.5)
    *     .write.mode("append").parquet(out)
    * }.start()
    * }}}
    *
    * Emits ALL qualifying (doc_id, dup_of, est_jaccard) pairs (the
    * candidate generator already deduplicates per (pair, band) via its
    * distinct and bounded state; this applies a final `distinct`), so
    * streamed-candidates + this verification equals the batch
    * `minhashPairs` output — suite-pinned.
    */
  def verifyCandidatesBatch(
      cands: DataFrame,
      signatures: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val agree = aggregate(
      zip_with(col("sa.signature"), col("sb.signature"),
        (x, y) => when(x === y, 1.0).otherwise(0.0)),
      lit(0.0), (acc, x) => acc + x)
    cands.select("doc_id", "candidate_of").distinct()
      .join(signatures.as("sa"), col("candidate_of") === col("sa.id"))
      .join(signatures.as("sb"), col("doc_id") === col("sb.id"))
      .withColumn("est_jaccard", round(agree / size(col("sa.signature")), 6))
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_id"), col("candidate_of").as("dup_of"), col("est_jaccard"))
  }

  // -------- streaming as-of enrichment ------------------------------------

  /** Tagged input for [[asofEnrichStream]]: `side = 0` right (reference)
    * rows with a value, `side = 1` left rows to enrich. `ts` drives the
    * watermark; `ts_us` is the exact event time (micros) used for
    * matching, carried separately because `java.sql.Timestamp` keeps
    * only milliseconds through the encoder.
    */
  case class AsofEvent(
      user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
      side: Int, id: Long, value: Double)

  case class AsofRightRow(ts_us: Long, id: Long, value: Double)
  case class AsofPendingLeft(ts_us: Long, id: Long)
  case class AsofKeyState(rights: Seq[AsofRightRow], pending: Seq[AsofPendingLeft])

  case class AsofOut(
      user_id: Long, left_id: Long, ts_us: Long,
      right_id: Option[Long], right_ts_us: Option[Long], right_value: Option[Double])

  /** Streaming twin of [[graft.pipeline.AsofJoin.asofJoin]]: every left
    * row is enriched with its key's most recent right row at-or-before
    * it. A left row is FINALIZED only once the watermark passes its
    * event time — every right row that could precede it has then
    * arrived (within the watermark contract), so out-of-order delivery
    * inside the delay cannot change the match, and the emitted rows
    * equal the batch join on the same data (suite-pinned parity,
    * including the batch path's payload-max tie rule).
    *
    * State per key is bounded by the watermark: rights newer than the
    * watermark (arrival-rate x delay) plus ONE older right (the current
    * as-of candidate for future lefts — older ones can never win
    * again), and the not-yet-final lefts. Event-time timeouts re-fire
    * keys whose pending lefts become final with no new data.
    */
  def asofEnrichStream(
      events: Dataset[AsofEvent],
      watermark: String = "1 hour",
      toleranceUs: Option[Long] = None): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofKeyState, AsofOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[AsofEvent], state: GroupState[AsofKeyState]) =>
          val st = state.getOption.getOrElse(AsofKeyState(Nil, Nil))
          var rights = st.rights
          var pending = st.pending
          rows.foreach { e =>
            if (e.side == 0) rights = rights :+ AsofRightRow(e.ts_us, e.id, e.value)
            else pending = pending :+ AsofPendingLeft(e.ts_us, e.id)
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // (ts, id, value) ascending: lastOption of the <= t_l prefix is
          // the batch join's (time, payload-max) winner
          val sorted = rights.sortBy(r => (r.ts_us, r.id, r.value))
          val (ready, stillPending) = pending.partition(_.ts_us <= wmUs)
          val out = ready.sortBy(p => (p.ts_us, p.id)).map { p =>
            val m = sorted.takeWhile(_.ts_us <= p.ts_us).lastOption
              .filter(r => toleranceUs.forall(t => p.ts_us - r.ts_us <= t))
            AsofOut(uid, p.id, p.ts_us,
              m.map(_.id), m.map(_.ts_us), m.map(_.value))
          }
          // purge: rights past the watermark stay; of the older ones only
          // the latest can still win a future left
          val (old, fresh) = sorted.partition(_.ts_us <= wmUs)
          val keep = old.lastOption.toSeq ++ fresh
          if (stillPending.isEmpty && keep.isEmpty) state.remove()
          else {
            state.update(AsofKeyState(keep, stillPending))
            if (stillPending.nonEmpty)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          }
          out.iterator
      }
  }

  // -------- custom keyed state: running per-user counters ----------------

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserStats(user_id: Long, n_events: Long, sum_value: Double)

  /** flatMapGroupsWithState running aggregate: emits the refreshed per-user
    * stats on every batch — the template for custom state the declarative
    * operators can't express.
    */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(userId, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { e => n += 1; s += e.value }
          val next = UserStats(userId, n, s)
          state.update(next)
          Iterator.single(next)
      }
  }
}
