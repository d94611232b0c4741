package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators for the event-pipeline shape of the
  * `events` table (event_id, ts, user_id, event_type, value).
  *
  * The reference is a batch-columnar library with no streaming story; this
  * module is the Spark-native answer for the same data flowing continuously:
  * watermarked event-time windows, exactly-once dedup within the watermark,
  * and gap-based sessionization via typed state. All operators are
  * partitioned by their natural key (window/event key, event id, user id) —
  * state lives in the state store sharded across executors, nothing
  * accumulates on the driver, so the topology holds at cluster scale.
  */
object StreamOps {

  /** Tumbling-window counts/sums per event type with a watermark: late rows
    * beyond `watermark` drop, window state is evicted once the watermark
    * passes — bounded state at any input rate. */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
                     window: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count("*").as("n"), sum("value").as("total"))

  /** Streaming exact-dedup on event id within the watermark horizon — the
    * streaming form of the batch `t02_exact_dedup` pipeline. */
  def dedupe(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long, total: Double)
  // not private: the state Encoder instantiates it from generated code
  case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Gap-based sessionization: a session closes after `gapMs` of user
    * inactivity (enforced by event-time timeout against the watermark).
    * State per user is four scalars — O(active users), not O(events). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 watermark: String = "10 minutes"): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          } else {
            var closed = List.empty[Session]
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // min(start, t): a late-but-in-gap event may extend the session backwards
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1, s.total + e.value))
                case Some(s) => // gap exceeded → close, start fresh
                  closed ::= Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming geofencing: a stream of point events joined against a static
    * zone table on a spatial predicate. The stream-static inner join plans
    * through the same [[graft.plans.SpatialJoinStrategy]] as batch queries
    * (Structured Streaming's incremental planner applies session
    * extraStrategies per micro-batch), so each micro-batch probes a
    * broadcast STRtree of the zones instead of a nested-loop join —
    * per-batch cost O(batch · log zones), no stream state. */
  def geofence(points: DataFrame, zones: DataFrame,
               pointGeom: String = "geom", zoneGeom: String = "zone",
               predicate: String = "st_contains"): DataFrame = {
    graft.functions.GeoFunctions.register(points.sparkSession)
    points.join(zones, call_function(predicate, col(zoneGeom), col(pointGeom)))
  }

  /** Windowed token counts — the trending-terms shape: explode a token
    * array, then count per (tumbling window, token) under a watermark.
    * State is O(active windows × vocabulary actually seen), sharded by
    * (window, token) across executors; finalized windows emit in append
    * mode once the watermark passes, and late rows beyond it drop. The
    * per-window top-k RANK runs downstream as a batch step over the
    * finalized rows (stream→rank is not incremental; finalized append
    * output is exactly a batch table). */
  def windowedTokenCounts(events: DataFrame, tokensCol: String = "toks",
                          watermark: String = "2 minutes",
                          window: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(col(tokensCol)).as("token"))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("token"))
      .agg(count("*").as("n"))

  case class PosEvent(device_id: Long, ts: Timestamp, zone: String)
  case class Transition(device_id: Long, ts: Timestamp, from_zone: String, to_zone: String)
  // not private: the state Encoder instantiates it from generated code
  case class ZoneState(zone: String)

  /** Streaming zone ENTER/EXIT transitions: per-device custom state over a
    * zone-tagged position stream (tag upstream — e.g. the [[geofence]]
    * stream-static join — so the stateful op never touches geometry). A
    * transition row emits whenever a device's zone differs from the zone
    * it was last seen in, INCLUDING across micro-batches: state is the
    * last zone per device (one string — O(devices), not O(events)), so a
    * device that ends batch 1 in zone A and opens batch 2 in zone B emits
    * exactly one A→B row. First sighting emits null→zone (the ENTER).
    *
    * Rows inside a micro-batch are processed in event-time order (the
    * group iterator is unordered; we sort the per-device batch slice —
    * bounded by per-device batch volume). Cross-batch order is the
    * stream's arrival order: pair with a watermark + tolerance upstream
    * if the source can reorder across batches. */
  def zoneTransitions(events: Dataset[PosEvent]): Dataset[Transition] = {
    implicit val outEnc: Encoder[Transition] = Encoders.product[Transition]
    implicit val stEnc: Encoder[ZoneState] = Encoders.product[ZoneState]
    events
      .groupByKey(_.device_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[ZoneState, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (id, rows, state: GroupState[ZoneState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var last = state.getOption.map(_.zone).orNull
          val out = scala.collection.mutable.ListBuffer.empty[Transition]
          sorted.foreach { e =>
            if (e.zone != last) {
              out += Transition(id, e.ts, last, e.zone)
              last = e.zone
            }
          }
          if (last != null) state.update(ZoneState(last))
          out.iterator
      }
  }

  case class BandRow(doc_id: Long, band: Int, bk: Long)
  case class BandVerdict(doc_id: Long, band: Int, first: Boolean)
  case class BandState(seen: Boolean)

  /** Streaming near-duplicate suppression: each arriving document fans out
    * to `bands` simhash band keys (8 contiguous bits each), and per band
    * key a state-store entry remembers whether the band was EVER seen —
    * in a previous micro-batch or by an earlier (lower doc_id) row of the
    * current one. A document survives only if ALL its bands are first
    * arrivals; one shared band with anything earlier marks it a near-dup
    * (the streaming face of t06/t07's batch LSH dedup — same banding
    * logic, state store instead of a self-join).
    *
    * Emits per-(doc, band) verdicts; the caller ANDs them per doc (in the
    * sink query, or a downstream `groupBy(doc_id).agg(min(first))`). Scale:
    * state is one boolean per distinct band key, sharded across executors
    * by band key — the same key cardinality argument as the batch LSH
    * bucket join, with no growth in doc count beyond the distinct-key
    * space. Pair with a TTL/timeout if the key space is unbounded over
    * months of stream. */
  def neardupSuppress(docs: DataFrame, bands: Int = 4,
                      simCol: String = "sim", idCol: String = "doc_id"): Dataset[BandVerdict] = {
    implicit val inEnc: Encoder[BandRow] = Encoders.product[BandRow]
    implicit val outEnc: Encoder[BandVerdict] = Encoders.product[BandVerdict]
    implicit val stEnc: Encoder[BandState] = Encoders.product[BandState]
    val fan = docs.select(explode(array((0 until bands).map(b =>
        struct(col(idCol).cast("long").as("doc_id"), lit(b).as("band"),
               shiftright(col(simCol).cast("long"), b * 8).bitwiseAND(lit(255L)).as("bk"))): _*)).as("r"))
      .select("r.*").as[BandRow]
    fan
      .groupByKey(r => (r.band, r.bk))(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .flatMapGroupsWithState[BandState, BandVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[BandState]) =>
          val sorted = rows.toSeq.sortBy(_.doc_id)
          val seenBefore = state.exists
          if (!seenBefore) state.update(BandState(seen = true))
          sorted.iterator.zipWithIndex.map { case (r, i) =>
            BandVerdict(r.doc_id, r.band, first = !seenBefore && i == 0)
          }
      }
  }

  case class EnrichEvent(user_id: Long, ts: Timestamp, kind: String, value: Long)
  case class EnrichedClick(user_id: Long, ts: Timestamp, value: Long,
                           profile_value: java.lang.Long)
  case class ProfileState(v: Long)

  /** CDC-style latest-value enrichment: one stream carries both dimension
    * updates (kind = "profile") and fact rows (anything else); each fact
    * row is tagged with the MOST RECENT profile value for its key seen so
    * far — the streaming as-of-backward join, with the dimension side as
    * per-key state instead of a second shuffle. Within a micro-batch rows
    * process in (ts, profile-first, value) order so an equal-ts update is
    * visible to its facts (the AsofJoin tie rule); across batches the
    * state store carries the last value. Facts with no profile yet emit
    * NULL. State = ONE value per key, sharded by key — O(keys), the
    * smallest possible enrichment state. */
  def latestValueEnrich(events: Dataset[EnrichEvent]): Dataset[EnrichedClick] = {
    implicit val outEnc: Encoder[EnrichedClick] = Encoders.product[EnrichedClick]
    implicit val stEnc: Encoder[ProfileState] = Encoders.product[ProfileState]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[ProfileState, EnrichedClick](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (id, rows, state: GroupState[ProfileState]) =>
          val sorted = rows.toSeq.sortBy(e =>
            (e.ts.getTime, if (e.kind == "profile") 0 else 1, e.value))
          var cur: Option[Long] = state.getOption.map(_.v)
          val out = scala.collection.mutable.ListBuffer.empty[EnrichedClick]
          sorted.foreach { e =>
            if (e.kind == "profile") cur = Some(e.value)
            else out += EnrichedClick(id, e.ts, e.value,
              cur.map(Long.box).orNull)
          }
          cur.foreach(v => state.update(ProfileState(v)))
          out.iterator
      }
  }

  case class AnomEvent(user_id: Long, ts: Timestamp, event_id: Long, vmilli: Long)
  case class AnomVerdict(user_id: Long, event_id: Long, vmilli: Long,
                         n_prior: Long, anomaly: Boolean)
  case class AnomState(n: Long, s: Long, q: Long)

  /** Streaming anomaly detection against the RUNNING per-key statistics:
    * an event is anomalous when it sits more than k sigmas from the mean
    * of all PRIOR events for its key. The test is EXACT — values are
    * integer milli-units, state is (count, Σv, Σv²) in longs, and the
    * k-sigma comparison is cross-multiplied into integers
    * ((v·n − s)² > k²·(n·q − s²), evaluated in BigInt so nothing
    * overflows) — no floating point ever enters the decision, so a batch
    * SQL replay (cumulative windows in an INT128 engine) agrees
    * bit-for-bit. Rows process in (ts, event_id) order within a batch;
    * cross-batch the state store carries the three longs per key —
    * O(keys), sharded by key. */
  def anomalies(events: Dataset[AnomEvent], minPrior: Int = 5,
                kSigma: Int = 3): Dataset[AnomVerdict] = {
    implicit val outEnc: Encoder[AnomVerdict] = Encoders.product[AnomVerdict]
    implicit val stEnc: Encoder[AnomState] = Encoders.product[AnomState]
    val kSq = BigInt(kSigma.toLong * kSigma)
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[AnomState, AnomVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (id, rows, state: GroupState[AnomState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(AnomState(0L, 0L, 0L))
          val out = scala.collection.mutable.ListBuffer.empty[AnomVerdict]
          sorted.foreach { e =>
            val flag = st.n >= minPrior && {
              val lhs = BigInt(e.vmilli) * st.n - BigInt(st.s)
              lhs * lhs > kSq * (BigInt(st.n) * st.q - BigInt(st.s) * st.s)
            }
            out += AnomVerdict(id, e.event_id, e.vmilli, st.n, flag)
            st = AnomState(st.n + 1, st.s + e.vmilli,
                           st.q + e.vmilli * e.vmilli)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Stream-stream event-time interval join: pair each left row with every
    * right row sharing `key` whose `ts` lands in [left.ts, left.ts +
    * maxLag] — the attribution shape (view→click, request→response,
    * order→fill). Both sides carry a watermark and the join condition
    * bounds right's event time relative to left's in both directions,
    * which is exactly what Spark's symmetric-hash join needs to evict
    * state: a buffered row drops as soon as the other side's watermark
    * proves no future match can exist, so state is O(key-rate × lag
    * horizon), not O(stream). Inner matches emit in the micro-batch where
    * the later side arrives — append output needs no watermark flush.
    * State shards by `key` across executors; nothing sits on the driver.
    *
    * Output keeps both sides' columns under `l`/`r` qualifiers —
    * disambiguate with `selectExpr("l.x", "r.y", …)` downstream. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   maxLag: String = "10 minutes",
                   watermark: String = "20 minutes",
                   tsCol: String = "ts"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark).alias("r")
    l.join(r, expr(s"l.$key = r.$key AND r.$tsCol >= l.$tsCol" +
      s" AND r.$tsCol <= l.$tsCol + interval $maxLag"))
  }

  /** LEFT OUTER form of [[intervalJoin]]: unmatched left rows ARE
    * emitted, but only once the watermark proves no future right row can
    * still land in their interval — Spark holds the left row in state
    * until `l.ts + maxLag` passes the watermark, then emits it
    * null-padded. The completeness/latency trade is explicit: outer
    * results lag the watermark horizon, inner results don't. Both sides
    * need the event-time range condition for state eviction, same as the
    * inner form. */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, key: String,
                        maxLag: String = "10 minutes",
                        watermark: String = "20 minutes",
                        tsCol: String = "ts"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark).alias("r")
    l.join(r, expr(s"l.$key = r.$key AND r.$tsCol >= l.$tsCol" +
      s" AND r.$tsCol <= l.$tsCol + interval $maxLag"), "leftOuter")
  }
}
