package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.SessionEvent

/** Structured Streaming surface (SURVEY §2.7): the reference's streaming
  * *intent* — hourly file micro-batches, arrival-driven sensors, Kafka
  * scaffold, cross-batch Redis state — made real.
  *
  *  - File/Kafka arrival gating (`src/pipeline_dag.py:65-88`'s HTTP poll
  *    sensors) is native to `readStream`: new files/offsets are discovered
  *    per micro-batch, no sensor code.
  *  - The hourly `{hour}` templating becomes a 1-hour tumbling window with
  *    a watermark for late data (the reference just put late events in the
  *    next hour's file).
  *  - The cross-stage Redis state (`src/data_processor.py:90-98`) becomes
  *    the state store of `flatMapGroupsWithState`.
  */
object StreamingOps {

  /** Per-key pending-start state for streaming sessionization. */
  final case class PendingStart(startMs: Long)

  /** Emitted on every matched start/end pair. */
  final case class SessionPair(clientId: String, durationSec: Double)

  /** Streaming sessionization with the reference's exact scan semantics
    * (`src/batch_tlb.py:46-62`): later start wins, orphan ends ignored,
    * pending start carries across micro-batches in the state store.
    *
    * Events are sorted by event time within each micro-batch; cross-batch
    * ordering is the source's arrival order (for files, filename order) —
    * the same contract the reference has across hourly files.
    */
  def sessionPairs(events: Dataset[SessionEvent]): Dataset[SessionPair] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.clientId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (clientId: String, batch: Iterator[SessionEvent], state: GroupState[PendingStart]) =>
          var pending: Option[Long] = state.getOption.map(_.startMs)
          val out = Vector.newBuilder[SessionPair]
          batch.toVector.sortBy(_.timestamp.getTime).foreach { e =>
            e.eventType match {
              case "page_view_start" => pending = Some(e.timestamp.getTime)
              case "page_view_end" =>
                pending.foreach { s =>
                  out += SessionPair(clientId, (e.timestamp.getTime - s) / 1000.0)
                  pending = None
                }
              case _ =>
            }
          }
          pending match {
            case Some(s) => state.update(PendingStart(s))
            case None    => state.remove()
          }
          out.result().iterator
      }
  }

  /** Watermarked 1-hour tumbling event counts by type — the streaming form
    * of the reference's per-hour batch files.
    */
  def hourlyCounts(
      events: DataFrame,
      tsCol: String = "timestamp",
      typeCol: String = "eventType",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), "1 hour"), col(typeCol))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").as("hour_start"),
        col(typeCol),
        col("n"))

  /** Streaming OHLC candles: per (window, key) the first/last (by event
    * time, tie-broken on a caller tiebreak column for determinism under
    * replay), min, max and count of an integer metric — the batch
    * [[graft.ops.TimeSeries.ohlc]] as a watermarked windowed
    * aggregation. `min_by`/`max_by` over a (ts, tie) struct replace the
    * batch op's ordered window pass, because streaming state can merge
    * out-of-order batches — an ordered window can't.
    */
  def ohlcStream(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      windowLen: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame = {
    val ord = struct(col(tsCol), col(tieCol))
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("volume"),
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"))
      .select(col("window.start").as("period_start"), col(keyCol),
        col("volume"), col("open"), col("high"), col("low"), col("close"))
  }

  /** Streaming exact dedup within a watermark horizon: the streaming form
    * of the exact-dedup extension op. State is bounded — a key's
    * fingerprint is dropped from the store once the watermark passes its
    * event time, which is the only way unbounded streams can dedup without
    * unbounded memory.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String], tsCol: String,
      lateness: String = "1 hour"): DataFrame = {
    // lateness == null → inherit an upstream watermark (Spark disallows
    // redefining one mid-chain when composing stateful operators)
    val marked = if (lateness == null) events else events.withWatermark(tsCol, lateness)
    marked.dropDuplicatesWithinWatermark(keyCols)
  }

  /** Stream-stream correlation join — the streaming form of the
    * reference's J4 event⋈trace correlation when both sides arrive as
    * streams. Each side is watermarked and the join carries a time-range
    * bound (`|traceTs − eventTs| ≤ within`): the range plus the watermarks
    * is what lets Spark expire unmatched rows from the join state store,
    * keeping state finite on unbounded streams. Inner semantics, like J4.
    */
  def correlateStreams(
      events: DataFrame,
      traces: DataFrame,
      key: String = "traceId",
      eventTsCol: String = "timestamp",
      traceTsCol: String = "traceTs",
      within: String = "1 hour"): DataFrame = {
    val e = events.withWatermark(eventTsCol, within)
    val t = traces.withWatermark(traceTsCol, within)
    e.join(
      t,
      e(key) === t(key) &&
        t(traceTsCol) >= e(eventTsCol) - expr(s"INTERVAL $within") &&
        t(traceTsCol) <= e(eventTsCol) + expr(s"INTERVAL $within"))
      .drop(t(key))
  }

  /** A (key, event-time) row for keyed admission control. */
  final case class KeyedEvent(key: String, ts: java.sql.Timestamp)

  /** Per-key admission state: admitted count per open window. Bounded by
    * construction — the watermark filter stops events for closed windows,
    * so at most ⌈lateness/window⌉+1 entries stay live per key.
    */
  final case class WindowQuotas(admitted: Map[Long, Int])

  /** Streaming per-key rate cap — the streaming form of quota sampling:
    * admit at most `maxPerWindow` events per key per tumbling window,
    * drop the rest. Ingest-side throttling for corpus pipelines (cap a
    * domain/source that floods the stream) with BOUNDED state: per-window
    * counts are pruned as soon as the watermark closes the window (the
    * watermark also filters any stragglers for it), and a whole key's
    * state dies by event-time timeout when all its windows close.
    *
    * Which events of an overfull window are admitted follows micro-batch
    * arrival order (deterministic counts, arrival-dependent membership) —
    * the same contract as any online admission control.
    */
  def rateLimit(
      events: Dataset[KeyedEvent],
      windowMillis: Long,
      maxPerWindow: Int,
      lateness: String = "1 hour"): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    rateLimitTyped(events, (e: KeyedEvent) => e.key, (e: KeyedEvent) => e.ts,
      "ts", windowMillis, maxPerWindow, lateness)
  }

  /** Generic form of [[rateLimit]]: cap arbitrary rows (documents with
    * their payloads, not just (key, ts) pairs) per key per window, so the
    * limiter composes inside a full pipeline — parse → quality gate →
    * rateLimit → dedup — without losing columns.
    */
  def rateLimitTyped[T](
      events: Dataset[T],
      keyFn: T => String,
      tsFn: T => java.sql.Timestamp,
      tsCol: String,
      windowMillis: Long,
      maxPerWindow: Int,
      lateness: String = "1 hour")(implicit ev: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    require(windowMillis > 0 && maxPerWindow > 0, "window and cap must be positive")
    // lateness == null → inherit an upstream watermark (see dedupStream)
    val marked = if (lateness == null) events else events.withWatermark(tsCol, lateness)
    marked
      .groupByKey(keyFn)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, batch: Iterator[T], state: GroupState[WindowQuotas]) =>
          val watermark = if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs() else 0L
          var admitted = state.getOption.map(_.admitted).getOrElse(Map.empty[Long, Int])
            .filter { case (w, _) => (w + 1) * windowMillis > watermark } // prune closed windows
          val out = Vector.newBuilder[T]
          batch.toVector.sortBy(e => tsFn(e).getTime).foreach { e =>
            val w = math.floorDiv(tsFn(e).getTime, windowMillis)
            val n = admitted.getOrElse(w, 0)
            if (n < maxPerWindow) {
              out += e
              admitted = admitted.updated(w, n + 1)
            }
          }
          if (admitted.isEmpty) state.remove()
          else {
            state.update(WindowQuotas(admitted))
            // expire the key's state when its newest window closes
            val horizon = (admitted.keys.max + 1) * windowMillis
            if (horizon > watermark) state.setTimeoutTimestamp(horizon)
          }
          out.result().iterator
      }(org.apache.spark.sql.Encoders.product[WindowQuotas], ev)
  }

  /** Per-key last-kept timestamp for [[debounceStream]]. */
  final case class DebounceState(lastKeptMs: Long)

  /** Streaming throttle-dedup: admit an event only when it is at least
    * `minGapMs` after the key's last ADMITTED event — the stateful twin
    * of the batch `TimeSeries.debounce` (which is lag-based against the
    * previous row; streaming state makes the strictly stronger
    * last-KEPT-row semantics natural, since the admitted frontier lives
    * in the state store anyway).
    *
    * State lifecycle: one long per key, expired via event-time timeout as
    * soon as the watermark passes `lastKept + minGapMs` — beyond that
    * point no admissible (non-late) event can violate the gap, so
    * dropping the state cannot change results. Within a micro-batch,
    * events replay in event-time order (stable for equal stamps), exactly
    * like the other stateful ops here.
    */
  def debounceStream(
      events: Dataset[KeyedEvent],
      minGapMs: Long,
      lateness: String = "1 hour"): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    require(minGapMs >= 0, s"minGapMs must be >= 0: $minGapMs")
    val marked = if (lateness == null) events else events.withWatermark("ts", lateness)
    marked
      .groupByKey(_.key)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, batch: Iterator[KeyedEvent], state: GroupState[DebounceState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var last = state.getOption.map(_.lastKeptMs)
            val out = Vector.newBuilder[KeyedEvent]
            batch.toVector.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              if (last.forall(l => t - l >= minGapMs)) { out += e; last = Some(t) }
            }
            last.foreach { l =>
              val horizon = l + minGapMs
              if (horizon > state.getCurrentWatermarkMs()) {
                state.update(DebounceState(l))
                state.setTimeoutTimestamp(horizon)
              } else state.remove()
            }
            out.result().iterator
          }
      }(org.apache.spark.sql.Encoders.product[DebounceState],
        org.apache.spark.sql.Encoders.product[KeyedEvent])
  }

  /** Space-saving counter state: item → (count, overestimate bound). */
  final case class HeavyHitterState(items: Map[String, (Long, Long)])

  /** One tracked counter after a micro-batch: `count` is an UPPER bound
    * on the item's true frequency; `count − err` a LOWER bound (the
    * space-saving guarantees). `bucket` is the state shard.
    */
  final case class HeavyHitter(bucket: Int, item: String, count: Long, err: Long)

  /** Streaming heavy hitters via the SPACE-SAVING sketch: continuously
    * tracks (approximately) the most frequent items of an unbounded
    * stream with HARD-BOUNDED state — `capacity` counters per state
    * shard, however many distinct items flow past. A tracked item's true
    * count is always within `[count − err, count]`, and any item with
    * true frequency > N/capacity (per shard) is guaranteed tracked — the
    * classic guarantee that makes this THE production top-k: exact
    * streaming counts need unbounded state.
    *
    * Sharding: items hash into `shards` state keys, each with its own
    * counter table — no single hot state key at scale, and per-shard
    * results union into global candidates (space-saving counters are
    * shard-mergeable on the query side). Emits every tracked counter per
    * shard per micro-batch (Update mode); state never exceeds
    * shards × capacity entries. Counter updates replay the batch in
    * arrival order — the sketch's contents are order-dependent by
    * construction (as in any space-saving implementation); the
    * [count − err, count] bounds hold for every order.
    */
  def heavyHittersStream(
      items: Dataset[String],
      capacity: Int,
      shards: Int = 16): Dataset[HeavyHitter] = {
    import items.sparkSession.implicits._
    require(capacity >= 1, s"capacity must be >= 1: $capacity")
    require(shards >= 1, s"shards must be >= 1: $shards")
    items
      .groupByKey(it => math.floorMod(it.hashCode, shards))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (bucket: Int, batch: Iterator[String], state: GroupState[HeavyHitterState]) =>
          var counters = state.getOption.map(_.items).getOrElse(Map.empty[String, (Long, Long)])
          batch.foreach { it =>
            counters.get(it) match {
              case Some((c, e)) => counters = counters.updated(it, (c + 1, e))
              case None if counters.size < capacity => counters = counters.updated(it, (1L, 0L))
              case None =>
                // evict the minimum-count counter (ties: smallest item for
                // determinism given the arrival order); its count becomes
                // the newcomer's overestimate bound
                val (minItem, (minC, _)) = counters.minBy { case (k, (c, _)) => (c, k) }
                counters = (counters - minItem).updated(it, (minC + 1, minC))
            }
          }
          state.update(HeavyHitterState(counters))
          counters.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
            .map { case (k, (c, e)) => HeavyHitter(bucket, k, c, e) }
      }
      .flatMap(identity)
  }

  /** Per-key state for [[decayedScoreStream]]: the last `lags+1` values,
    * newest first.
    */
  final case class DecayState(recent: List[Long])

  /** One decayed-score emission per key per micro-batch. */
  final case class DecayedScore(key: String, decayedScore: Long, nObs: Long)

  /** Streaming form of [[graft.ops.TimeSeries.decayedScore]]: per key,
    * the dyadic-weight bounded-lag EMA (`Σ_{j=0..lags} v(t−j)·2^(lags−j)`)
    * over the last `lags+1` observed values, carried across micro-batches
    * in the state store. Emits the score after each batch that touched
    * the key. Values must arrive in event order per key within the
    * stream's delivery order — the same contract as the batch op's
    * `orderCols`, here delegated to the source (per-key ordered topics /
    * file sequence).
    *
    * State is O(lags) longs per key — bounded regardless of stream
    * length, the property that lets a freshness score run forever.
    */
  def decayedScoreStream(
      events: Dataset[(String, Long)],
      lags: Int = 7): Dataset[DecayedScore] = {
    import events.sparkSession.implicits._
    require(lags >= 0 && lags < 62, s"bad lags: $lags")
    events
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[(String, Long)], state: GroupState[DecayState]) =>
          var recent = state.getOption.map(_.recent).getOrElse(Nil)
          var seen = 0L
          batch.foreach { case (_, v) =>
            recent = (v :: recent).take(lags + 1)
            seen += 1
          }
          state.update(DecayState(recent))
          val score = recent.zipWithIndex.map { case (v, j) => v * (1L << (lags - j)) }.sum
          DecayedScore(key, score, seen)
      }
  }

  /** Incremental column profiler — the streaming form of
    * [[graft.ops.Audit.columnDrift]]'s per-snapshot side: per profiled
    * column, running (rows, nulls, min, max, sum) maintained by Spark's
    * OWN stateful aggregation (update mode), so each micro-batch merges
    * its partial stats into the state store instead of rescanning
    * history. Exact distinct is deliberately absent: it is not
    * bounded-state mergeable — pair with `approx_count_distinct` when an
    * estimate is acceptable.
    *
    * Works identically on a batch frame (plain agg) and a streaming one
    * (update-mode stateful agg) — the unpivot is a map-side explode of a
    * column-count-sized literal array, combined before the shuffle, so
    * the shuffle carries per-column partials only.
    */
  def columnProfileStream(rows: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val pairs = rows.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("long").as("v"))): _*)).as("p"))
      .select(col("p.column_name").as("column_name"), col("p.v").as("v"))
    pairs.groupBy("column_name").agg(
      count(lit(1)).as("n"),
      count(when(col("v").isNull, 1)).as("nulls"),
      min(col("v")).as("min"),
      max(col("v")).as("max"),
      sum(col("v")).as("sum"))
  }

  /** Continuous sample-ratio-mismatch monitor over an ASSIGNMENT stream
    * (one record per experiment unit — the randomizer's log): running
    * per-arm counts with the exact milli chi-square and the 3.841
    * suspect gate, updated every micro-batch, so a broken assignment
    * pipeline alarms within a trigger interval instead of at readout
    * time ([[graft.ops.Eval.srmCheck]] is the batch form; for EXPOSURE
    * streams, where units repeat, compose [[dedupStream]] in front —
    * the same double-counting rule the batch op enforces with its
    * distinct).
    *
    * Scale shape: one global streaming aggregation — two counters of
    * state, total. The same code path runs on a batch frame unchanged.
    */
  def srmMonitorStream(assignments: DataFrame, treatedCol: Column): DataFrame =
    assignments
      .agg(count_if(treatedCol).as("n_t"), count_if(!treatedCol).as("n_c"))
      .withColumn("chisq_milli",
        expr("(1000L * (n_t - n_c) * (n_t - n_c)) div (n_t + n_c)"))
      .withColumn("srm_suspect", col("chisq_milli") >= 3841L)

  private def md5Prefix32(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)

  /** Sparse HLL register state for [[hllRegisterStream]] (absent = 0). */
  final case class HllRegState(regs: Map[Long, Long])

  /** One register row per (group, bucket), zero-filled to all 2^b rows. */
  final case class HllRegister(group: String, bucket: Long, register: Long)

  /** Streaming HLL register maintenance — the streaming form of
    * [[graft.ops.Sketch.hllByGroup]]'s register build, proving the
    * mergeable-sketch claim end-to-end in a stream: per group, the
    * 2^b-register set lives in the state store, each micro-batch folds
    * its values in by per-register max, and the registers emitted after
    * ANY prefix of the stream are bit-identical to
    * [[graft.ops.Sketch.hllRegisters]] run in batch over the same values
    * (same md5 contract: 32-bit hex prefix, top-b bucket split, integer
    * rank = wBits − ⌊log₂ w⌋ — asserted in `StreamingSpec`). State is
    * O(2^b) longs per group, bounded forever; the per-register max fold
    * is commutative and idempotent, so replayed or reordered batches
    * cannot corrupt it — the same property that merges the stream's
    * registers with any batch-built shard via
    * [[graft.ops.Sketch.hllMerge]]. Emits each touched group's full
    * zero-filled register set per micro-batch (Update mode); feed the
    * latest emission to [[graft.ops.Sketch.hllEstimate]].
    */
  def hllRegisterStream(
      values: Dataset[(String, String)],
      b: Int = 6): Dataset[HllRegister] = {
    import values.sparkSession.implicits._
    require(b >= 2 && b <= 12, s"b must be in [2,12]: $b")
    val wBits = 32 - b
    val m = 1 << b
    values
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (group: String, batch: Iterator[(String, String)], state: GroupState[HllRegState]) =>
          var regs = state.getOption.map(_.regs).getOrElse(Map.empty[Long, Long])
          batch.foreach { case (_, v) =>
            val u = md5Prefix32(v)
            val bucket = u / (1L << wBits)
            val w = u % (1L << wBits)
            val rank =
              if (w == 0L) (wBits + 1).toLong
              else (wBits - (63 - java.lang.Long.numberOfLeadingZeros(w))).toLong
            if (rank > regs.getOrElse(bucket, 0L)) regs = regs.updated(bucket, rank)
          }
          state.update(HllRegState(regs))
          (0 until m).map(bk => HllRegister(group, bk.toLong, regs.getOrElse(bk.toLong, 0L)))
      }
      .flatMap(identity)
  }

  /** Single-cell state for [[countMinCellStream]]. */
  final case class CmCellCount(n: Long)

  /** One count-min cell `(r, c, n)` — the mergeable unit. */
  final case class CmCell(r: Long, c: Long, n: Long)

  /** Streaming count-min maintenance — the streaming form of
    * [[graft.ops.Sketch.countMinTopK]]'s counter build: every value fans
    * out to `rows` salted cells (`md5₃₂(value ":" r) % width`, the batch
    * op's exact hash contract), the stream groups by CELL, and each
    * cell's count is one Long in the state store — cell-add IS the
    * count-min merge algebra, so per-batch increments are merges and the
    * cell table after any stream prefix equals the batch counter table
    * over the same values (asserted in `StreamingSpec`). State is
    * bounded by rows × width cells regardless of stream length or
    * cardinality; frequency estimates are query-side (min over a
    * value's `rows` probed cells), exactly as in the batch op.
    */
  def countMinCellStream(
      values: Dataset[String],
      rows: Int = 4,
      width: Int = 512): Dataset[CmCell] = {
    import values.sparkSession.implicits._
    require(rows >= 1 && width >= 2, s"bad cm params: $rows/$width")
    values
      .flatMap(v => (0L until rows.toLong).map(r => (r, md5Prefix32(s"$v:$r") % width)))
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (cell: (Long, Long), batch: Iterator[(Long, Long)], state: GroupState[CmCellCount]) =>
          val n = state.getOption.map(_.n).getOrElse(0L) + batch.size
          state.update(CmCellCount(n))
          CmCell(cell._1, cell._2, n)
      }
  }

  /** Top-(k+1) priority state for [[prioritySampleStream]]:
    * (priority, id, weight), priority desc / id asc.
    */
  final case class PriSampleState(rows: List[(Long, Long, Long)])

  /** One sampled row per group per micro-batch emission. */
  final case class PriSample(group: String, id: Long, weight: Long, est_weight: Long)

  /** Streaming per-group Duffield priority sampling — the streaming form
    * of [[graft.ops.Sampling.prioritySamplePerGroup]]: each group keeps
    * its top-(k+1) priorities `(w·2³² div (md5₃₂(id)+1))` in the state
    * store (the priority is a pure function of the row — the batch op's
    * exact md5 contract), merges every micro-batch in, and emits the
    * current k-row sample with the `max(w, τ)` estimator (τ = the
    * (k+1)-th priority; 0 while the group is smaller — sample =
    * population, estimator degenerate-exact). Because a top-k of
    * deterministic priorities is a MERGEABLE order statistic, the
    * sample after any stream prefix is IDENTICAL to the batch op run
    * over the same rows (asserted in `StreamingSpec`) — a uniform
    * weight-proportional without-replacement sample that runs forever
    * in O(k) state per group.
    *
    * Contracts carried over from the batch op: weights in (0, 2³¹)
    * (violations throw — silently dropping them would bias the
    * estimator), ids unique across the stream (a re-arriving id is
    * folded by max priority, so exact duplicates are inert, but
    * distinct rows sharing an id draw correlated uniforms exactly as
    * documented on the batch op).
    */
  def prioritySampleStream(
      rows: Dataset[(String, Long, Long)],
      k: Int): Dataset[PriSample] = {
    import rows.sparkSession.implicits._
    require(k >= 1, s"k must be >= 1: $k")
    rows
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (group: String, batch: Iterator[(String, Long, Long)], state: GroupState[PriSampleState]) =>
          var top = state.getOption.map(_.rows).getOrElse(Nil)
          batch.foreach { case (_, id, w) =>
            if (w <= 0L || w >= (1L << 31)) throw new IllegalArgumentException(
              s"prioritySampleStream: weight $w of id $id outside (0, 2^31) — pre-scale weights")
            val pri = w * 4294967296L / (md5Prefix32(id.toString) + 1L)
            val existing = top.find(_._2 == id)
            if (!existing.exists(_._1 >= pri))
              top = ((pri, id, w) :: top.filterNot(_._2 == id))
                .sortBy { case (p, i, _) => (-p, i) }.take(k + 1)
          }
          state.update(PriSampleState(top))
          val tau = if (top.length == k + 1) top.last._1 else 0L
          top.take(k).map { case (_, id, w) =>
            PriSample(group, id, w, math.max(w, tau))
          }
      }
      .flatMap(identity)
  }

  /** Per-band-bucket state for [[hammingPairsStream]]: the most recent
    * `maxBucket` (id, hash) residents, newest first.
    */
  final case class BandBucketState(ids: List[(Long, Long)])

  /** One verified near-dup candidate pair (a_id < b_id). */
  final case class HammingCandidate(a_id: Long, b_id: Long, hamming: Long)

  /** Streaming banded-Hamming near-dup candidates — the streaming form
    * of [[graft.ops.Dedup.hammingPairs]], i.e. dedup-at-ingest for a
    * crawl stream: each arriving 64-bit fingerprint fans out to its
    * `bands` band buckets (the batch op's exact band split: arithmetic
    * shift + mask), the stream groups by (band, bits), and each bucket
    * keeps its most recent `maxBucket` residents in the state store. An
    * arrival emits a popcount-verified pair (hamming ≤ `maxHamming`,
    * a_id < b_id) against every current resident of its bucket.
    *
    * Equality contract (asserted in `StreamingSpec`): while no bucket
    * has evicted, the DISTINCT set of emitted pairs after any stream
    * prefix equals the batch op over the same prefix — completeness is
    * the same pigeonhole bound (`maxHamming ≤ bands−1` enforced), and a
    * pair colliding in several bands is re-emitted once per band, so
    * downstream consumers dedup or upsert idempotently (the batch op's
    * `.distinct()`). State is O(maxBucket) ids per bucket FOREVER — the
    * explicit recency window that makes infinite streams affordable:
    * eviction trades match-vs-ancient-history for bounded state,
    * exactly like every windowed stream dedup. Re-arriving ids are
    * inert (no self-pairs, no duplicate residency).
    */
  def hammingPairsStream(
      hashes: Dataset[(Long, Long)],
      maxHamming: Int = 7,
      bands: Int = 8,
      maxBucket: Int = 64): Dataset[HammingCandidate] = {
    import hashes.sparkSession.implicits._
    require(bands >= 1 && 64 % bands == 0, s"bands must divide 64: $bands")
    require(maxHamming >= 0 && maxHamming <= bands - 1,
      s"completeness needs maxHamming <= bands - 1: $maxHamming vs ${bands - 1}")
    require(maxBucket >= 1, s"maxBucket must be >= 1: $maxBucket")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    hashes
      .flatMap { case (id, h) =>
        (0 until bands).map(b => (b.toLong, (h >> (b * width)) & mask, id, h))
      }
      .groupByKey(r => (r._1, r._2))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (_: (Long, Long), batch: Iterator[(Long, Long, Long, Long)],
         state: GroupState[BandBucketState]) =>
          var ids = state.getOption.map(_.ids).getOrElse(Nil)
          val out = List.newBuilder[HammingCandidate]
          batch.foreach { case (_, _, id, h) =>
            if (!ids.exists(_._1 == id)) {
              ids.foreach { case (oid, oh) =>
                val d = java.lang.Long.bitCount(h ^ oh)
                if (d <= maxHamming)
                  out += HammingCandidate(math.min(id, oid), math.max(id, oid), d.toLong)
              }
              ids = ((id, h) :: ids).take(maxBucket)
            }
          }
          state.update(BandBucketState(ids))
          out.result()
      }
      .flatMap(identity)
  }

  /** Per-host politeness state: the next free fetch slot and how many
    * URLs this host has been granted over the stream's lifetime.
    */
  final case class HostSlotState(granted: Long)

  /** One scheduled fetch. */
  final case class ScheduledFetch(host: String, url: String, priority: Long,
      fetch_offset_ms: Long)

  /** Streaming form of [[graft.ops.Crawl.politenessSchedule]]'s slotting
    * half — politeness at crawl-ingest grain. Input rows are
    * (host, canonical url, priority): canonicalization is a pure Column
    * (proven streaming-safe in `StreamingSpec`) and frontier dedup is
    * the stream-dedup leg's job, so this leg holds ONE counter per host
    * in the state store and grants delay-spaced slots forever.
    *
    * Order contract: a live frontier cannot sort the future, so slots
    * grant in arrival order ACROSS micro-batches; WITHIN a micro-batch
    * the group sorts by (priority desc, url asc) — the batch op's order
    * — so a stream that sees its whole frontier in one batch emits
    * exactly [[graft.ops.Crawl.politenessSchedule]]'s schedule
    * (asserted in `StreamingSpec`). `maxPerHost` caps lifetime grants:
    * past it a host's URLs drop (re-queue upstream on a later round).
    *
    * State is O(1) per host forever — a single counter, the cheapest
    * leg in the store.
    */
  def politenessStream(
      urls: Dataset[(String, String, Long)],
      delayMs: Long = 1000L,
      maxPerHost: Int = 1000): Dataset[ScheduledFetch] = {
    import urls.sparkSession.implicits._
    require(delayMs > 0, s"delayMs must be > 0: $delayMs")
    require(maxPerHost > 0, s"maxPerHost must be > 0: $maxPerHost")
    urls
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (host: String, batch: Iterator[(String, String, Long)],
         state: GroupState[HostSlotState]) =>
          var granted = state.getOption.map(_.granted).getOrElse(0L)
          // explicit reverse ordering, not arithmetic negation: -pri
          // overflows Long.MinValue and would sort that priority FIRST.
          // URL ties compare by UTF-8 bytes UNSIGNED — Spark's string
          // sort order — not Ordering[String]'s UTF-16 code units: for
          // supplementary-plane characters the two orders diverge and
          // would break the one-batch parity with the batch op's window.
          val utf8Order: Ordering[String] = (a: String, b: String) => {
            val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            var i = 0
            val n = math.min(x.length, y.length)
            while (i < n && x(i) == y(i)) i += 1
            if (i < n) (x(i) & 0xff) - (y(i) & 0xff) else x.length - y.length
          }
          val ordered = batch.toSeq.sortBy { case (_, url, pri) => (pri, url) }(
            Ordering.Tuple2(Ordering[Long].reverse, utf8Order))
          val out = ordered.flatMap { case (_, url, pri) =>
            if (granted < maxPerHost) {
              val f = ScheduledFetch(host, url, pri, granted * delayMs)
              granted += 1
              Some(f)
            } else None
          }
          state.update(HostSlotState(granted))
          out
      }
      .flatMap(identity)
  }

  /** Per-URL recrawl state: last content hash + lifetime counters. */
  final case class UrlHashState(lastHash: String, nFetches: Long, nChanges: Long)

  /** One observed fetch with its change verdict and running counters. */
  final case class FetchObservation(url: String, ts_ms: Long, changed: Boolean,
      n_fetches: Long, n_changes: Long)

  /** Streaming change detection — the state half of
    * [[graft.ops.Crawl.recrawlPriority]] at ingest grain: each URL keeps
    * its LAST content hash (plus two counters) in the state store, and
    * every arriving fetch emits whether the page changed since the
    * previous fetch, with running fetch/change totals. Within a
    * micro-batch the group folds in `ts_ms` order (ties by hash — inert,
    * equal-hash swaps can't flip a verdict), so a stream that sees its
    * whole history emits exactly the batch op's lag flags (asserted in
    * `StreamingSpec`). Out-of-order arrival ACROSS batches is the
    * documented streaming tradeoff: a fetch older than the stored state
    * compares against the newest hash seen, not its true predecessor —
    * the same last-write semantics every at-ingest detector has.
    *
    * State is O(1) per URL forever: one hash and two longs.
    */
  def changeDetectStream(
      fetches: Dataset[(String, Long, String)]): Dataset[FetchObservation] = {
    import fetches.sparkSession.implicits._
    fetches
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (url: String, batch: Iterator[(String, Long, String)],
         state: GroupState[UrlHashState]) =>
          var st = state.getOption.getOrElse(UrlHashState(null, 0L, 0L))
          // Option-wrapped hash in the sort key: None (null hash) orders
          // first, matching Spark's nulls-first ascending window order —
          // and a raw null String would NPE the Ordering
          val out = batch.toSeq.sortBy { case (_, ts, h) => (ts, Option(h)) }.map {
            case (_, ts, h) =>
              // a null on EITHER side is no-change — the batch op's
              // `=!=` lag comparison is null-propagating, and the parity
              // contract binds this leg to the same rule
              val changed = st.lastHash != null && h != null && st.lastHash != h
              st = UrlHashState(h, st.nFetches + 1, st.nChanges + (if (changed) 1L else 0L))
              FetchObservation(url, ts, changed, st.nFetches, st.nChanges)
          }
          state.update(st)
          out
      }
      .flatMap(identity)
  }

  /** The steady-state crawl CONTROL LOOP — the composition a crawler
    * actually runs, chaining the three proven streaming legs into one
    * pipeline: fetch observations `(url, ts_ms, content_hash)` stream
    * in, [[changeDetectStream]] keeps per-URL change state in the state
    * store, and each micro-batch re-prioritizes the URLs it touched from
    * the STREAM'S OWN counters (no re-read of raw history — the whole
    * point of the stateful leg) and re-schedules the next fetch round
    * with per-host politeness and per-URL robots delay hints. `sink`
    * receives each round's schedule (production: upsert into the
    * frontier store).
    *
    * Equality contract (asserted in `StreamingSpec`): the priority
    * arithmetic IS [[graft.ops.Crawl.recrawlPriority]]'s
    * (`priorityFromCounters` — one shared implementation) and the
    * scheduling IS [[graft.ops.Crawl.politenessScheduleWithDelays]]
    * (called verbatim per batch), so a stream that sees its whole
    * history in one batch emits exactly
    * `politenessScheduleWithDelays ∘ recrawlPriority` over that history;
    * across batches the counters continue from state and each round
    * schedules the URLs the batch touched, with priorities equal to the
    * full-history batch op restricted to those URLs.
    *
    * State is [[changeDetectStream]]'s O(1) per URL; everything else is
    * per-batch batch-plan work (group agg + broadcast-sized hint join +
    * the capped politeness window).
    *
    * `asOfMs`: None (the steady-state default) derives each round's
    * as-of from THAT batch's max fetch timestamp — an indefinitely-
    * running loop cannot freeze a launch-time constant, or the moment
    * observed timestamps pass it every changing page's age (and so its
    * priority) goes NEGATIVE and the ranking inverts toward static
    * pages. Some(fixed) is for deterministic replays/backfills whose
    * whole history predates the fixed point (the batch op's "pass the
    * corpus max" rule).
    */
  def crawlSchedulerStream(
      fetches: Dataset[(String, Long, String)],
      asOfMs: Option[Long] = None,
      delayHints: DataFrame,
      defaultDelayMs: Long = 1000L,
      maxPerHost: Int = 1000)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[FetchObservation] =
    changeDetectStream(fetches).writeStream.outputMode("update")
      .foreachBatch { (batch: Dataset[FetchObservation], batchId: Long) =>
        // counters are monotone within a URL's batch fold, so the max of
        // each IS the final state after this batch
        val latest = batch.toDF().groupBy(col("url"))
          .agg(max(col("ts_ms")).as("__last"),
            max(col("n_fetches")).as("n_fetches"),
            max(col("n_changes")).as("n_changes"))
        if (!latest.isEmpty) {
          // batch max ≥ every __last in the batch, so ages stay ≥ 0
          val asOf = asOfMs.getOrElse(
            latest.agg(max(col("__last"))).head().getLong(0))
          val frontier = graft.ops.Crawl.priorityFromCounters(latest, asOf)
            .join(delayHints, Seq("url"), "left")
            .select(col("url"), col("priority"), col("delay_ms"))
          sink(graft.ops.Crawl.politenessScheduleWithDelays(frontier,
            defaultDelayMs = defaultDelayMs, maxPerHost = maxPerHost), batchId)
        }
      }

  /** The three-channel discovery frontier as a STREAM — production
    * frontiers are incremental by definition: pages arrive, their
    * anchor/sitemap/feed discoveries accumulate, and each micro-batch
    * re-emits the politeness schedule over everything admitted so far.
    * The discovery+admission half is
    * [[graft.ops.Crawl.discoveryAdmitted]] VERBATIM (map-side page
    * work + broadcast joins against the static file sets, so the
    * batch q422 composite and this stream cannot diverge); the
    * accumulation is a complete-mode streaming count keyed on the
    * canonical URL — that count state IS the frontier store, bounded
    * by the number of distinct admitted URLs (exactly what a real
    * frontier persists); the per-batch politeness pass is
    * [[graft.ops.Crawl.politenessSchedule]] called verbatim on the
    * complete counts. Equality contract (pinned in `StreamingSpec`):
    * after any prefix of arrivals, the sinked schedule equals the
    * batch composite over the pages seen so far — quarantined
    * candidates (unparseable URLs, robots-disallowed paths,
    * never-fetched files) drop identically on both sides.
    */
  def discoveryFrontierStream(
      pages: DataFrame,
      sitemapFiles: DataFrame,
      feedFiles: DataFrame,
      admissionRobots: Column,
      delayMs: Long = 1000L,
      maxPerHost: Int = 1000)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    graft.ops.Crawl.discoveryAdmitted(pages, sitemapFiles, feedFiles, admissionRobots)
      .groupBy(col("url"))
      .agg(count(lit(1)).as("priority"))
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(graft.ops.Crawl.politenessSchedule(batch.toDF(),
          delayMs = delayMs, maxPerHost = maxPerHost), batchId)
      }

  /** WARC files as they LAND: a `binaryFile` stream over a crawl
    * output directory, each newly-arrived file exploded to record rows
    * by the same member walk + strict framing as the batch path
    * ([[graft.ops.Warc.parseWarc]] — literally: the stream reuses the
    * batch operator, so the two cannot diverge). The archive side of
    * crawl ingest at stream grain — pair with [[crawlSchedulerStream]]
    * (the control side) for the full live loop. File identity is the
    * 64-bit hash of the path (stable across restarts; the checkpoint
    * already guarantees each file processes once). Shuffle-free.
    */
  def warcFileStream(
      spark: SparkSession,
      dir: String,
      maxBytesPerMember: Int = 1 << 26,
      maxBytesTotal: Long = 1L << 32): Dataset[graft.ops.Warc.WarcRecordRow] = {
    import spark.implicits._
    val media = spark.readStream.format("binaryFile")
      // streaming file sources need the schema declared; this is
      // binaryFile's fixed one
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        lit("warc").as("kind"),
        col("content").as("payload"),
        lit("application/warc").as("mime_type"),
        col("length").as("size_bytes"))
      .as[graft.ops.Multimodal.MediaRow]
    graft.ops.Warc.parseWarc(media, maxBytesPerMember, maxBytesTotal = maxBytesTotal)
  }

  /** CDXJ sidecar lines as crawl files LAND — production crawls index
    * each container when it arrives, not in a second pass over the
    * archive. A `binaryFile` stream over the crawl directory feeds the
    * SAME batch exporter ([[graft.ops.Warc.toCdxjFiles]] — literally
    * one code path, so live lines cannot diverge from a batch re-index);
    * `filename` is the landed file's basename, which is what the line's
    * random-access pointer must name. Per-file map work, shuffle-free,
    * append mode; a malformed file quarantines WHOLE (the indexing walk
    * shares the parse walk's all-or-nothing contract).
    */
  def cdxjStream(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Warc.toCdxjFiles(
      spark.readStream.format("binaryFile")
        .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
        .load(dir)
        .select(regexp_extract(col("path"), "[^/]+$", 0).as("filename"),
          col("content").as("payload")))

  /** Read the reference's user-exp JSON shape as a file stream. */
  def userExpStream(spark: SparkSession, dir: String): Dataset[SessionEvent] = {
    import spark.implicits._
    spark.readStream
      .schema(graft.model.Schemas.userExp)
      .json(dir)
      .select(
        col("clientId"),
        to_timestamp(col("timestamp")).as("timestamp"),
        col("eventType"))
      .as[SessionEvent]
  }
}
