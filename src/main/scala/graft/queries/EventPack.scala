package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.operators.{AsOfJoin, Multimodal, Sessionize}
import graft.streaming.EventStream

/** Events (windowed time aggregation — the batch twin of the
  * Structured Streaming pipeline) and multimodal blob plumbing.
  */
object EventPack extends QueryPack {

  /** Shared input shape for both as-of formulations: clicks to enrich,
    * purchases to look up, with micros-epoch longs as the ordering
    * columns (the native exec's v1 restriction is long key/ts). */
  private def asOfInputs(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    // alias round-trip on the right key: clicks and purchases derive
    // from the SAME scan, so a plain select would carry user_id with
    // one exprId on BOTH sides of the join — Catalyst column pruning
    // then treats them as one attribute and prunes the right side's
    // key out from under the native exec's reference binding
    // (AsOfJoinNative's doc; AsOfNativeSpec uses the same freshening)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("pts_us"),
        col("value"))
      .withColumnRenamed("p_user", "user_id")
    (clicks, purchases)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the Z-order curve arithmetic under the hash gate: per-event
    // Morton value of (value, user_id) over corpus min/max bounds —
    // the same expression putZOrdered lays files out by, replayed
    // bit-for-bit in DuckDB (16-term interleave over the identical
    // double normalization)
    "q_zorder" -> ((s, d) => {
      import org.apache.spark.sql.functions.{broadcast, col, min, max}
      val ev = Tables.events(s, d)
      val bounds = ev.agg(min(col("value")).as("alo"), max(col("value")).as("ahi"),
        min(col("user_id")).as("blo"), max(col("user_id")).as("bhi"))
      ev.crossJoin(broadcast(bounds))
        .select(col("event_id"),
          graft.functions.ZOrder.zValue(
            col("value"), col("alo"), col("ahi"),
            col("user_id"), col("blo"), col("bhi"), bits = 16).as("z"))
    }),
    // hourly tumbling window per event_type; same expressions as the
    // streaming query (EventStreamSpec asserts stream == batch)
    "q_event_window" -> ((s, d) =>
      EventStream.hourlyBatch(Tables.events(s, d))),

    // approx distinct users per hour: the streaming windowed-KMV's
    // batch twin (EventStreamSpec pins stream == batch bit-for-bit;
    // the stream holds ≤ k longs per open window where an exact
    // streaming distinct retains every key ever seen). k=16 so the
    // estimator genuinely estimates at gate scale; the exact count
    // rides along so the gate rows show the sketch error
    "q_event_kmv_window" -> ((s, d) => {
      val ev = Tables.events(s, d)
      EventStream.kmvWindowedBatch(ev, "cast(user_id as string)",
          windowSec = 3600L, k = 16)
        .join(ev.select(window(col("ts"), "3600 seconds")("start")
              .cast("long").as("window_start"), col("user_id"))
            .groupBy("window_start")
            .agg(countDistinct(col("user_id")).as("exact_users")),
          Seq("window_start"))
    }),

    // SLIDING (overlapping) windows — "the last hour every 15 min":
    // each event lands in dur/slide = 4 epoch-aligned windows; same
    // expressions as the streaming query (EventStreamSpec asserts
    // stream == batch), membership arithmetic replayed in the oracle
    "q_event_sliding" -> ((s, d) =>
      EventStream.slidingBatch(Tables.events(s, d), "1 hour", "15 minutes")),

    // sliding windowed-KMV: approx distinct users over "the last day
    // every 6 h" — day windows so per-window distinct clears k and the
    // estimator genuinely estimates (hour windows hold ~14 events at
    // gate scale); exact count rides along like q_event_kmv_window
    "q_event_kmv_sliding" -> ((s, d) => {
      val ev = Tables.events(s, d)
      EventStream.kmvWindowedBatch(ev, "cast(user_id as string)",
          windowSec = 86400L, k = 16, slideSec = 21600L)
        .join(ev.groupBy(window(col("ts"), "86400 seconds", "21600 seconds")
              .as("w"))
            .agg(countDistinct(col("user_id")).as("exact_users"))
            .select(col("w.start").cast("long").as("window_start"),
              col("exact_users")),
          Seq("window_start"))
    }),

    // exact per-window heavy hitters — the batch twin the streaming
    // Misra-Gries summary is pinned against (EventStreamSpec
    // containment property); day windows at 1.5% support so the cut
    // genuinely selects (~227 of ~4500 window-user pairs at sf0.01)
    "q_event_heavy_window" -> ((s, d) =>
      EventStream.heavyHittersWindowedBatch(Tables.events(s, d),
        "cast(user_id as string)", support = 0.015, windowSec = 86400L)),

    // "top talkers over the last day, every 6 h" — the sliding
    // composition of the two forms above: exact heavy hitters per
    // OVERLAPPING window (each event judged against every containing
    // window's own total); the streaming Misra-Gries twin takes the
    // same slideSec and is pinned by the EventStreamSpec containment
    // property
    "q_event_heavy_sliding" -> ((s, d) =>
      EventStream.heavyHittersWindowedBatch(Tables.events(s, d),
        "cast(user_id as string)", support = 0.015, windowSec = 86400L,
        slideSec = 21600L)),

    // blob metadata projection: binary column + typed struct
    "q_multimodal_meta" -> ((s, d) =>
      Multimodal.asBlobTable(Tables.documents(s, d), "doc_id", "text")
        .select(col("id"), octet_length(col("data")).cast("long").as("n_bytes"),
                col("meta.format").as("format"), col("meta.width").as("width"))),

    // decode dispatch + feature extraction over blob partitions: text
    // blobs take the byte-level path (format 'bin'); real PNG/JPEG
    // pixel decode is pinned in MultimodalSpec against generated images
    "q_multimodal_features" -> ((s, d) => {
      val blobs = Multimodal.asBlobTable(Tables.documents(s, d), "doc_id", "text")
      Multimodal.extractFeatures(blobs).toDF()
        .select(col("id"), col("n_bytes"), col("format"), col("checksum"))
    }),

    // stub-path resize: text blobs sniff "bin", so they byte-subsample
    // to w*h with updated meta; the OBSERVABLE contract (output size =
    // min(len, w*h), new dims) is SQL-expressible, so it gets a full
    // oracle even though the "pixel" math is a stub for non-media bytes
    "q_multimodal_resize" -> ((s, d) => {
      val blobs = Multimodal.asBlobTable(Tables.documents(s, d), "doc_id", "text")
      Multimodal.resized(blobs, w = 64, h = 48)
        .select(col("id"), octet_length(col("data")).cast("long").as("n_bytes"),
                col("meta.width").as("width"), col("meta.height").as("height"))
    }),

    // REAL resize end-to-end: each doc's bytes become grayscale pixels
    // in a genuine PNG container, pixel-resized to 16×12 (Graphics2D
    // bilinear), then the RESIZED bytes are re-decoded by the real
    // codec — format/width/height in the output come from sniffing and
    // parsing the resized PNG itself, so a silent fall-back to the
    // byte stub would hash-mismatch ("bin", 0, 0)
    "q_multimodal_resize_real" -> ((s, d) => {
      val pngs = Multimodal.asPngBlobTable(Tables.documents(s, d), "doc_id", "text")
      Multimodal.extractFeatures(Multimodal.resized(pngs, w = 16, h = 12)).toDF()
        .select(col("id"), col("format"), col("width"), col("height"))
    }),

    // video-shaped frame sampling: n evenly spaced byte-span frames
    // per blob; frame boundaries are pure arithmetic on the byte
    // length, so (id, frame_idx, frame_len) is fully oracle-checkable
    "q_multimodal_frames" -> ((s, d) => {
      val blobs = Multimodal.asBlobTable(Tables.documents(s, d), "doc_id", "text")
      Multimodal.frameSample(blobs, n = 4).toDF()
        .select(col("id"), col("frame_idx"),
                octet_length(col("frame")).cast("long").as("frame_len"))
    }),

    // perceptual-hash fingerprints end-to-end on REAL containers:
    // each doc's bytes become grayscale pixels in a genuine PNG
    // (width 16), the real codec decodes them back, and the 9×8
    // integer box-average luminance grid + 64-bit dHash are computed
    // from the DECODED pixels — on gray pixels luminance == the byte
    // value exactly, so the whole decode→grid→fp stage replays as
    // integer arithmetic in the oracle. Sub-grid images (h < 8 rows,
    // i.e. docs under 113 bytes) emit null grid/fp: the exclusion
    // rule is itself under the hash, never a silent drop
    "q_image_grid" -> ((s, d) => {
      val pngs = Multimodal.asPngBlobTable(Tables.documents(s, d),
        "doc_id", "text", width = 16)
      Multimodal.imageFingerprints(pngs)
        .select(col("id"),
          expr("array_join(transform(grid, x -> cast(x as string)), ' ')")
            .as("grid_str"),
          col("fp"))
    }),

    // image NEAR-dup pairs — the multimodal twin of q_dedup_simhash:
    // dHash fingerprints from the real decode above, then the SHARED
    // 16-bit-chunk banding + bucket cap + bounded hamming verify
    // (Dedup.hammingNearDups). The oracle replays fingerprints,
    // banding, the 64-bucket cap AND the hamming cut, so the full
    // candidate discipline is hash-pinned, not just the pair set
    "q_image_neardup" -> ((s, d) => {
      val pngs = Multimodal.asPngBlobTable(Tables.documents(s, d),
        "doc_id", "text", width = 16)
      Multimodal.imageNearDups(pngs, maxHamming = 3, maxBucket = 64)
    }),

    // incremental image near-dup: odd-id images arrive as the batch,
    // even-id images stand in for the STORED fingerprint table (the
    // ingest shape — only the batch is decoded; the corpus side is
    // (id, fp) rows); cross-side banding with the corpus-side bucket
    // cap, both sides' fingerprints and the band join replayed in the
    // oracle
    "q_image_neardup_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val newPngs = Multimodal.asPngBlobTable(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", width = 16)
      val corpusFps = Multimodal.imageFingerprints(
          Multimodal.asPngBlobTable(
            docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
            width = 16))
        .filter(col("fp").isNotNull).select(col("id"), col("fp"))
      Multimodal.imageNearDupsIncremental(newPngs, corpusFps,
        maxHamming = 3, maxBucket = 64)
    }),

    // REAL audio decode end-to-end: each doc's bytes are wrapped in a
    // genuine RIFF/WAVE container (PCM s16le mono @8kHz), then parsed
    // back by the JDK AudioSystem — channels/rate from the header,
    // frames = even(len)/2, duration = frames/8 ms, all replayable as
    // arithmetic on octet_length(text) in the oracle
    "q_multimodal_audio" -> ((s, d) => {
      val wavs = Multimodal.asWavBlobTable(Tables.documents(s, d), "doc_id", "text")
      Multimodal.audioMeta(wavs).toDF()
        .select(col("id"), col("channels"), col("sample_rate_hz"),
          col("frames"), round(col("duration_ms"), 4).as("duration_ms"))
    }),

    // gap-based sessionization (batch twin of the stateful stream op)
    "q_sessionize" -> ((s, d) =>
      Sessionize.sessions(Tables.events(s, d), "user_id", "ts")),

    // as-of join: each click enriched with the user's latest prior
    // purchase — on the NATIVE plan (custom LogicalPlan + Strategy +
    // sort-merge SparkPlan, plans/AsOfJoinNative.scala): one exchange
    // per side and a single forward merge holding at most ONE candidate
    // right row, where the compositional window formulation
    // materializes the tagged union. AsOfNativeSpec pins native ==
    // compositional (which q_asof_window keeps under the same oracle).
    "q_asof" -> ((s, d) => {
      val (clicks, purchases) = asOfInputs(s, d)
      // output = left cols ++ right cols; the equi-key appears on both
      // sides under the same name (the native API matches by name), so
      // rename positionally before selecting
      graft.plans.AsOfJoinNative.asOf(clicks, purchases, "user_id", "ts_us", "pts_us")
        .toDF("event_id", "user_id", "ts_us", "r_user_id", "pts_us", "value")
        .select(col("event_id"), col("user_id"), col("ts_us"),
                coalesce(col("pts_us"), lit(-1L)).as("asof_ts_us"),
                coalesce(col("value"), lit(-1.0)).as("asof_value"))
    }),

    // the compositional (tag + union + keyed window) formulation stays
    // under the same DuckDB ASOF JOIN oracle: it is the cross-check
    // that keeps the native exec honest in the gate, and the fallback
    // for key/ts types outside the native v1 long-only restriction
    "q_asof_window" -> ((s, d) => {
      val (clicks, purchases) = asOfInputs(s, d)
      // no-match rows carry -1 sentinels instead of NULL: result
      // comparators that sort rows handle NULL-in-sort-key orderings
      // inconsistently across engines
      AsOfJoin.asOf(clicks, purchases, "user_id", "ts_us", "pts_us", Seq("value"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
                coalesce(col("asof_ts"), lit(-1L)).as("asof_ts_us"),
                coalesce(col("asof_value"), lit(-1.0)).as("asof_value"))
    }),

    // trailing 7-day moving aggregates over daily counts: the RANGE
    // frame is on the integer day VALUE (missing days shrink the
    // window on both engines identically); avg is one deterministic
    // division per row, never a cross-row double sum
    "q_moving_avg" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
        .rangeBetween(-6, 0)
      Tables.events(s, d)
        .select(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cnt7", sum(col("cnt")).over(w))
        .withColumn("avg7",
          round(col("cnt7").cast("double") / lit(7.0), 4))
    }),

    // EWMA trend over the same daily counts — the exact fixed-point
    // form (α = 1/2, bounded window, power-of-two weights): num/den
    // are pure BIGINT folds, one final division per row, so the
    // smoothing replays bit-for-bit where a recursive float EWMA
    // could not
    "q_ewma_trend" -> ((s, d) =>
      graft.operators.EventAnalytics.ewmaTrend(
        Tables.events(s, d)
          .select(col("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt")),
        "event_type", "day", "cnt")),

    // inter-arrival gap histogram on power-of-two second buckets —
    // the bucket is integer bit-length arithmetic, not floor(log2):
    // exact on both engines at bucket boundaries
    "q_event_gaps" -> ((s, d) =>
      graft.operators.EventAnalytics.interArrivalHistogram(
        Tables.events(s, d), "user_id", "ts", "event_id")),

    // ordered-stage funnel view → click → purchase: each stage must
    // strictly follow the user's earliest completion of the previous
    "q_funnel" -> ((s, d) =>
      graft.operators.EventAnalytics.funnel(
        Tables.events(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))),

    // retention cohorts: first-activity day × day offset → users
    // (cohort emitted as epoch DAYS — the gate compares no date/
    // timestamp values, same convention as q_range_join)
    "q_retention" -> ((s, d) =>
      graft.operators.EventAnalytics.retention(
          Tables.events(s, d), "user_id", "ts")
        .select(datediff(col("cohort_date"), lit("1970-01-01"))
            .as("cohort_day"),
          col("offset_days"), col("users"))),

    // robust per-type anomaly flags: modified z-score against LOWER
    // median + MAD — both rank SELECTIONS, no interpolation, so med/
    // mad are data values both engines agree on exactly
    "q_anomaly" -> ((s, d) =>
      graft.operators.EventAnalytics.robustOutliers(
        Tables.events(s, d), "event_type", "value", "event_id")),

    // bot detection: robust outliers over per-user EVENT RATES — the
    // volume-anomaly complement to q_anomaly's value anomalies; one
    // synthetic 'all' group, exact rank medians over the 500-user
    // count table (the scale path flips exact=false)
    "q_bot_users" -> ((s, d) =>
      graft.operators.EventAnalytics.robustOutliers(
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).cast("double").as("n_events"))
          .withColumn("grp", lit("all")),
        "grp", "n_events", "user_id")),

    // semi-structured props column: JSON field extraction + integer
    // aggregation (sums stay exact — no double crosses the shuffle)
    "q_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("cnt_k"))),
  )

  /** 16-term Morton interleave in SQL, generated to match
    * [[graft.functions.ZOrder.interleave]] term for term. */
  private def zInterleaveSql(na: String, nb: String): String =
    (0 until 16).map { i =>
      s"((($na >> $i) & 1) << ${2 * i}) | ((($nb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")

  /** [[graft.functions.ZOrder.normalized]] in SQL: identical double
    * arithmetic — (v − lo) / span × maxI, floored, clamped. */
  private def zNormSql(v: String, lo: String, hi: String): String =
    s"""CASE WHEN $v IS NULL OR (CAST($hi AS DOUBLE) - CAST($lo AS DOUBLE)) <= 0
       |     THEN 0
       |     ELSE least(65535, greatest(0, CAST(floor(
       |       (CAST($v AS DOUBLE) - CAST($lo AS DOUBLE))
       |         / (CAST($hi AS DOUBLE) - CAST($lo AS DOUBLE)) * 65535)
       |       AS BIGINT)))
       |END""".stripMargin

  /** Shared CTE prefix for the image perceptual-hash oracles: rebuild
    * the asPngBlobTable(width=16) pixel stream from the documents
    * bytes (hex(encode(text)) — the q_multimodal_features byte path,
    * UTF-8-true), apply the Multimodal.luminanceGrid cell assignment
    * (cx = px·9/16, cy = py·8/h, floor-mean) and the dHash64FromGrid
    * bit rule (bit cy·8+cx set iff right neighbor strictly brighter;
    * bit 63 is BIGINT min-value — DuckDB refuses 1<<63, so the sum
    * accumulates in HUGEINT and re-signs at the end). Feasibility
    * (h ≥ 8) replays the operator's sub-grid exclusion. Ends in
    * `grid` (doc_id, cy, cx, m) and `fp` (doc_id, fp). */
  private val imageFpCtes: String =
    """hx AS (
      |  SELECT doc_id, lower(hex(encode(text))) AS h FROM documents
      |),
      |dims AS (
      |  SELECT doc_id, h, len(h) // 2 AS nb,
      |    GREATEST(1, CAST(ceil((len(h) // 2) / 16.0) AS BIGINT)) AS ih
      |  FROM hx
      |),
      |pix AS (
      |  SELECT doc_id, ih, t.i,
      |    CASE WHEN t.i < nb THEN
      |      (strpos('0123456789abcdef', h[2*t.i+1:2*t.i+1]) - 1) * 16
      |      + (strpos('0123456789abcdef', h[2*t.i+2:2*t.i+2]) - 1)
      |    ELSE 0 END AS v
      |  FROM dims, unnest(range(16 * ih)) AS t(i)
      |  WHERE ih >= 8
      |),
      |grid AS (
      |  SELECT doc_id, CAST(((i // 16) * 8) // ih AS INT) AS cy,
      |    CAST(((i % 16) * 9) // 16 AS INT) AS cx,
      |    CAST(sum(v) // count(*) AS INT) AS m
      |  FROM pix GROUP BY 1, 2, 3
      |),
      |fp AS (
      |  SELECT g1.doc_id,
      |    CAST(coalesce(sum(CASE WHEN g2.m > g1.m THEN
      |      CASE WHEN g1.cy * 8 + g1.cx = 63
      |           THEN CAST(-9223372036854775808 AS HUGEINT)
      |           ELSE CAST(CAST(1 AS BIGINT) << (g1.cy * 8 + g1.cx) AS HUGEINT)
      |      END ELSE CAST(0 AS HUGEINT) END), 0) AS BIGINT) AS fp
      |  FROM grid g1 JOIN grid g2
      |    ON g1.doc_id = g2.doc_id AND g1.cy = g2.cy AND g2.cx = g1.cx + 1
      |  GROUP BY 1
      |)""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "q_image_grid" ->
      s"""WITH $imageFpCtes,
         |gs AS (
         |  SELECT doc_id, array_to_string(list(m ORDER BY cy, cx), ' ') AS g
         |  FROM grid GROUP BY doc_id
         |)
         |SELECT d.doc_id AS id, gs.g AS grid_str, fp.fp
         |FROM documents d
         |LEFT JOIN gs ON d.doc_id = gs.doc_id
         |LEFT JOIN fp ON d.doc_id = fp.doc_id""".stripMargin,

    // cross-side banding: corpus (even ids) chunk table capped at 64,
    // batch (odd ids) probes it — the same fp CTEs split by parity
    "q_image_neardup_incr" ->
      s"""WITH $imageFpCtes,
         |cchunks AS (
         |  SELECT doc_id AS id, fp.fp, jj.band,
         |    (fp.fp >> (jj.band * 16)) & 65535 AS sig
         |  FROM fp CROSS JOIN (SELECT CAST(unnest(range(4)) AS INT) AS band) jj
         |  WHERE doc_id % 2 = 0
         |),
         |nchunks AS (
         |  SELECT doc_id AS id, fp.fp, jj.band,
         |    (fp.fp >> (jj.band * 16)) & 65535 AS sig
         |  FROM fp CROSS JOIN (SELECT CAST(unnest(range(4)) AS INT) AS band) jj
         |  WHERE doc_id % 2 = 1
         |),
         |csizes AS (SELECT band, sig, count(*) AS c FROM cchunks GROUP BY 1, 2),
         |cpruned AS (
         |  SELECT ch.id, ch.fp, ch.band, ch.sig FROM cchunks ch
         |  JOIN csizes s ON s.band = ch.band AND s.sig = ch.sig
         |  WHERE s.c <= 64
         |)
         |SELECT DISTINCT n.id AS doc_new, c.id AS doc_corpus,
         |  CAST(bit_count(xor(n.fp, c.fp)) AS INT) AS hamming
         |FROM nchunks n JOIN cpruned c
         |  ON n.band = c.band AND n.sig = c.sig AND n.id != c.id
         |WHERE bit_count(xor(n.fp, c.fp)) <= 3""".stripMargin,

    // banding + 64-bucket cap + hamming <= 3 replayed verbatim from
    // the q_dedup_simhash oracle, over the dHash fingerprints above
    "q_image_neardup" ->
      s"""WITH $imageFpCtes,
         |chunks AS (
         |  SELECT doc_id AS id, fp.fp, jj.band,
         |    (fp.fp >> (jj.band * 16)) & 65535 AS sig
         |  FROM fp CROSS JOIN (SELECT CAST(unnest(range(4)) AS INT) AS band) jj
         |),
         |sizes AS (SELECT band, sig, count(*) AS c FROM chunks GROUP BY 1, 2),
         |pruned AS (
         |  SELECT ch.id, ch.fp, ch.band, ch.sig FROM chunks ch
         |  JOIN sizes s ON s.band = ch.band AND s.sig = ch.sig
         |  WHERE s.c <= 64
         |)
         |SELECT DISTINCT l.id AS doc_a, r.id AS doc_b,
         |  CAST(bit_count(xor(l.fp, r.fp)) AS INT) AS hamming
         |FROM pruned l JOIN pruned r
         |  ON l.band = r.band AND l.sig = r.sig AND l.id < r.id
         |WHERE bit_count(xor(l.fp, r.fp)) <= 3""".stripMargin,

    "q_zorder" ->
      s"""WITH b AS (
         |  SELECT min(value) AS alo, max(value) AS ahi,
         |         min(user_id) AS blo, max(user_id) AS bhi
         |  FROM events
         |),
         |n AS (
         |  SELECT event_id,
         |    ${zNormSql("value", "b.alo", "b.ahi")} AS na,
         |    ${zNormSql("user_id", "b.blo", "b.bhi")} AS nb
         |  FROM events, b
         |)
         |SELECT event_id, ${zInterleaveSql("na", "nb")} AS z FROM n
         |""".stripMargin,
    "q_event_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // the per-window KMV replayed (the q_approx_distinct_grouped
    // construction with the hour bucket as the group): distinct
    // 60-bit md5 hashes per window, k-smallest cut via the window
    // rank, the same max/count read-out and double expression.
    // Spark's 3600 s tumbling windows are epoch-aligned, so
    // date_trunc('hour') under the UTC session is the same bucket
    "q_event_kmv_window" -> {
      val fold = TextPack.hexFoldSql("h", 15)
      s"""WITH hx AS (
         |  SELECT DISTINCT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
         |      AS window_start,
         |    substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS h
         |  FROM events WHERE user_id IS NOT NULL
         |),
         |hv AS (SELECT DISTINCT window_start, $fold AS hv FROM hx),
         |topk AS (
         |  SELECT window_start, hv, row_number() OVER (
         |    PARTITION BY window_start ORDER BY hv) AS rn
         |  FROM hv
         |),
         |ks AS (
         |  SELECT window_start, max(hv) AS hk, count(*) AS m
         |  FROM topk WHERE rn <= 16 GROUP BY 1
         |),
         |ex AS (
         |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
         |    count(DISTINCT user_id) AS exact_users
         |  FROM events GROUP BY 1
         |)
         |SELECT ks.window_start,
         |  CASE WHEN m < 16 THEN m
         |       ELSE CAST(floor(15.0 / (CAST(hk AS DOUBLE)
         |                               / 1152921504606846976.0)) AS BIGINT)
         |  END AS approx_distinct,
         |  exact_users
         |FROM ks JOIN ex USING (window_start)""".stripMargin
    },

    // sliding-window membership replayed: an event at t belongs to the
    // 4 epoch-aligned hour windows starting at (t_us // slide_us − j)
    // · 900 s for j = 0..3 — exactly Spark's window(ts, 1h, 15m)
    // assignment when dur divides by slide (integral //, so boundary
    // events land deterministically on both engines)
    "q_event_sliding" ->
      """WITH w AS (
        |  SELECT event_type, value,
        |    ((epoch_us(ts) // 900000000) - j) * 900 AS window_start
        |  FROM events, generate_series(0, 3) AS t(j)
        |)
        |SELECT window_start, event_type, count(*) AS cnt,
        |  round(sum(value), 2) AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin,

    // the q_event_kmv_window replay over SLIDING day/6 h membership:
    // same exploded window-start arithmetic as q_event_sliding, then
    // the identical distinct-hash / k-smallest / read-out machinery
    "q_event_kmv_sliding" -> {
      val fold = TextPack.hexFoldSql("h", 15)
      s"""WITH ew AS (
         |  SELECT ((epoch_us(ts) // 21600000000) - j) * 21600 AS window_start,
         |    user_id
         |  FROM events, generate_series(0, 3) AS t(j)
         |  WHERE user_id IS NOT NULL
         |),
         |hx AS (
         |  SELECT DISTINCT window_start,
         |    substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS h
         |  FROM ew
         |),
         |hv AS (SELECT DISTINCT window_start, $fold AS hv FROM hx),
         |topk AS (
         |  SELECT window_start, hv, row_number() OVER (
         |    PARTITION BY window_start ORDER BY hv) AS rn
         |  FROM hv
         |),
         |ks AS (
         |  SELECT window_start, max(hv) AS hk, count(*) AS m
         |  FROM topk WHERE rn <= 16 GROUP BY 1
         |),
         |ex AS (
         |  SELECT window_start, count(DISTINCT user_id) AS exact_users
         |  FROM ew GROUP BY 1
         |)
         |SELECT ks.window_start,
         |  CASE WHEN m < 16 THEN m
         |       ELSE CAST(floor(15.0 / (CAST(hk AS DOUBLE)
         |                               / 1152921504606846976.0)) AS BIGINT)
         |  END AS approx_distinct,
         |  exact_users
         |FROM ks JOIN ex USING (window_start)""".stripMargin
    },

    // exact windowed heavy hitters: per-day value counts vs the
    // ceil(support · window-rows) cut — identical IEEE double ceil on
    // both engines
    "q_event_heavy_window" ->
      """WITH w AS (
        |  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS window_start,
        |    CAST(user_id AS VARCHAR) AS v
        |  FROM events WHERE user_id IS NOT NULL
        |),
        |t AS (SELECT window_start, count(*) AS n_window FROM w GROUP BY 1),
        |c AS (SELECT window_start, v, count(*) AS cnt FROM w GROUP BY 1, 2)
        |SELECT c.window_start, c.v, c.cnt, t.n_window
        |FROM c JOIN t USING (window_start)
        |WHERE cnt >= ceil(0.015 * n_window)""".stripMargin,

    // the sliding form: the q_event_sliding membership explode feeding
    // the q_event_heavy_window count-vs-ceil cut
    "q_event_heavy_sliding" ->
      """WITH w AS (
        |  SELECT ((epoch_us(ts) // 21600000000) - j) * 21600 AS window_start,
        |    CAST(user_id AS VARCHAR) AS v
        |  FROM events, generate_series(0, 3) AS t(j)
        |  WHERE user_id IS NOT NULL
        |),
        |t AS (SELECT window_start, count(*) AS n_window FROM w GROUP BY 1),
        |c AS (SELECT window_start, v, count(*) AS cnt FROM w GROUP BY 1, 2)
        |SELECT c.window_start, c.v, c.cnt, t.n_window
        |FROM c JOIN t USING (window_start)
        |WHERE cnt >= ceil(0.015 * n_window)""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id AS id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  'txt' AS format, CAST(length(text) % 1024 AS INT) AS width
        |FROM documents""".stripMargin,
    // text blobs sniff "bin", whose checksum is the plain h = h*31 + b
    // byte fold with Java long wraparound — replayed with HUGEINT
    // arithmetic mod 2^64 and re-signed at the end (bytes via
    // hex(encode(text)), same as the q_fingerprint oracle). The real
    // ImageIO pixel path (png/jpeg) stays JVM-only and is pinned in
    // MultimodalSpec; was rows-only through round 12.
    "q_multimodal_features" ->
      """WITH hx AS (
        |  SELECT doc_id, lower(hex(encode(text))) AS h FROM documents
        |),
        |f AS (
        |  SELECT doc_id,
        |    CAST(len(h) // 2 AS BIGINT) AS n_bytes,
        |    list_reduce(
        |      list_prepend(CAST(0 AS HUGEINT),
        |        list_transform(range(len(h) // 2),
        |          i -> CAST((strpos('0123456789abcdef', h[2*i+1:2*i+1]) - 1) * 16
        |                 + (strpos('0123456789abcdef', h[2*i+2:2*i+2]) - 1) AS HUGEINT))),
        |      (acc, b) -> (acc * 31 + b) % 18446744073709551616) AS m
        |  FROM hx
        |)
        |SELECT doc_id AS id, n_bytes, 'bin' AS format,
        |  CAST(CASE WHEN m >= 9223372036854775808 THEN m - 18446744073709551616
        |            ELSE m END AS BIGINT) AS checksum
        |FROM f""".stripMargin,

    // the container truncates the payload to an even byte count at
    // 2 bytes/frame, 8 kHz mono — so frames = octet_length // 2, and
    // what AudioSystem reads back is exactly this arithmetic
    "q_multimodal_audio" ->
      """SELECT doc_id AS id, 1 AS channels, 8000 AS sample_rate_hz,
        |  CAST(octet_length(CAST(text AS BLOB)) // 2 AS BIGINT) AS frames,
        |  round((octet_length(CAST(text AS BLOB)) // 2) / 8.0, 4) AS duration_ms
        |FROM documents""".stripMargin,

    "q_multimodal_resize" ->
      """SELECT doc_id AS id,
        |  CAST(LEAST(octet_length(CAST(text AS BLOB)), 64 * 48) AS BIGINT) AS n_bytes,
        |  64 AS width, 48 AS height
        |FROM documents""".stripMargin,

    // the dims/format are re-read from the RESIZED bytes by the real
    // decoder, so this pins the real-codec path end-to-end: any row
    // falling back to the stub would surface as ('bin', 0, 0)
    "q_multimodal_resize_real" ->
      """SELECT doc_id AS id, 'png' AS format, 16 AS width, 12 AS height
        |FROM documents""".stripMargin,

    // frame i of n=4 spans [i*sz, (i+1)*sz), sz = len/4, last frame
    // takes the remainder — pure integer arithmetic replayed in SQL
    "q_multimodal_frames" ->
      """SELECT d.doc_id AS id, CAST(r.range AS BIGINT) AS frame_idx,
        |  CAST(CASE WHEN r.range < 3
        |            THEN octet_length(CAST(d.text AS BLOB)) // 4
        |            ELSE octet_length(CAST(d.text AS BLOB))
        |                 - 3 * (octet_length(CAST(d.text AS BLOB)) // 4)
        |       END AS BIGINT) AS frame_len
        |FROM documents d, range(4) r""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        |w AS (
        |  SELECT user_id, ts_ms,
        |    CASE WHEN lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) IS NULL
        |           OR ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) > 1800000
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e
        |), s AS (
        |  SELECT user_id, ts_ms,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts_ms
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM w
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS cnt, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
        |FROM s GROUP BY 1, 2""".stripMargin,

    "q_asof" ->
      """SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
        |  coalesce(epoch_us(r.ts), -1) AS asof_ts_us,
        |  coalesce(r.value, -1.0) AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts""".stripMargin,

    // identical oracle: both formulations must produce the same rows
    "q_asof_window" ->
      """SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
        |  coalesce(epoch_us(r.ts), -1) AS asof_ts_us,
        |  coalesce(r.value, -1.0) AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts""".stripMargin,

    "q_moving_avg" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) AS day,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, day, cnt,
        |  CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS cnt7,
        |  round(CAST(CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
        |    / 7.0, 4) AS avg7
        |FROM daily""".stripMargin,

    // the fixed-point EWMA replayed term for term: W=8 lag reads with
    // power-of-two weights, BIGINT num/den (explicit CASE addition —
    // never an aggregate sum, so no HUGEINT promotion), one final
    // round-6 division; trend divides by the ROUNDED ewma exactly as
    // the Spark side does
    "q_ewma_trend" -> {
      val W = 8
      def terms(f: Int => String) = (0 until W).map(f).mkString("\n    + ")
      val num = terms(j =>
        s"coalesce(lag(cnt, $j) OVER w * ${1L << (W - 1 - j)}, 0)")
      val den = terms(j =>
        s"CASE WHEN lag(cnt, $j) OVER w IS NOT NULL THEN ${1L << (W - 1 - j)} ELSE 0 END")
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) AS day,
         |    count(*) AS cnt
         |  FROM events GROUP BY 1, 2
         |),
         |folded AS (
         |  SELECT event_type, day, cnt,
         |    $num AS num,
         |    $den AS den
         |  FROM daily
         |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
         |)
         |SELECT event_type, day, cnt,
         |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS ewma,
         |  CASE WHEN round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) > 0
         |    THEN round(CAST(cnt AS DOUBLE)
         |      / round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6), 6)
         |  END AS trend
         |FROM folded""".stripMargin
    },

    // gap bucket = bit length of the integer second gap — both
    // engines' bin() agree digit-for-digit, so boundary gaps (exact
    // powers of two) can't straddle buckets the way floor(log2)
    // doubles can
    "q_event_gaps" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |),
        |g AS (
        |  SELECT (ts_us - lag(ts_us) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, event_id)) // 1000000
        |    AS gap_s
        |  FROM e
        |)
        |SELECT CAST(CASE WHEN gap_s = 0 THEN 0
        |                 ELSE len(bin(gap_s)) END AS INT) AS bucket,
        |  count(*) AS cnt
        |FROM g WHERE gap_s IS NOT NULL GROUP BY 1""".stripMargin,

    "q_funnel" ->
      """WITH base AS (
        |  SELECT user_id AS u, epoch_us(ts) AS t, event_type AS s
        |  FROM events
        |),
        |r1 AS (SELECT u, min(t) AS t0 FROM base WHERE s = 'view' GROUP BY 1),
        |r2 AS (
        |  SELECT base.u, min(t) AS t0 FROM base JOIN r1 USING (u)
        |  WHERE s = 'click' AND t > r1.t0 GROUP BY 1
        |),
        |r3 AS (
        |  SELECT base.u, min(t) AS t0 FROM base JOIN r2 USING (u)
        |  WHERE s = 'purchase' AND t > r2.t0 GROUP BY 1
        |)
        |SELECT CAST(1 AS INT) AS stage, 'view' AS stage_name,
        |  (SELECT count(*) FROM r1) AS users
        |UNION ALL SELECT CAST(2 AS INT), 'click', (SELECT count(*) FROM r2)
        |UNION ALL SELECT CAST(3 AS INT), 'purchase',
        |  (SELECT count(*) FROM r3)""".stripMargin,

    "q_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events
        |),
        |coh AS (SELECT u, min(day) AS cohort_date FROM days GROUP BY 1)
        |SELECT CAST(cohort_date - DATE '1970-01-01' AS INT) AS cohort_day,
        |  CAST(day - cohort_date AS INT) AS offset_days,
        |  count(*) AS users
        |FROM days JOIN coh USING (u)
        |GROUP BY 1, 2""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS cnt_k
        |FROM events GROUP BY 1""".stripMargin,

    // the q_anomaly replay over the per-user count table (one 'all'
    // group; counts cast double exactly as the Spark side)
    "q_bot_users" ->
      """WITH base AS (
        |  SELECT user_id, 'all' AS grp,
        |    CAST(count(*) AS DOUBLE) AS value
        |  FROM events GROUP BY user_id
        |),
        |n AS (SELECT grp, count(*) AS n FROM base GROUP BY 1),
        |medr AS (
        |  SELECT grp, value, row_number() OVER (PARTITION BY grp
        |    ORDER BY value, user_id) AS rn
        |  FROM base
        |),
        |med AS (
        |  SELECT medr.grp, value AS med
        |  FROM medr JOIN n USING (grp) WHERE rn = (n + 1) // 2
        |),
        |dev AS (
        |  SELECT b.user_id, b.grp, b.value, med.med,
        |    abs(b.value - med.med) AS adev
        |  FROM base b JOIN med USING (grp)
        |),
        |madr AS (
        |  SELECT grp, adev, row_number() OVER (PARTITION BY grp
        |    ORDER BY adev, user_id) AS rn
        |  FROM dev
        |),
        |mad AS (
        |  SELECT madr.grp, adev AS mad
        |  FROM madr JOIN n USING (grp) WHERE rn = (n + 1) // 2
        |),
        |scored AS (
        |  SELECT dev.user_id, dev.grp, dev.value, dev.med, mad.mad,
        |    round(CASE WHEN mad.mad > 0.0
        |      THEN 0.6745 * (dev.value - dev.med) / mad.mad
        |      ELSE 0.0 END, 4) AS mscore
        |  FROM dev JOIN mad USING (grp)
        |)
        |SELECT user_id, grp, value, med, mad, mscore,
        |  CASE WHEN abs(mscore) > 3.5 THEN 1 ELSE 0 END AS is_anomaly
        |FROM scored""".stripMargin,

    // both medians replayed as the identical rank selection (the
    // value at row (n+1)//2 in (value, id) order — no interpolation);
    // the 0.6745·dev/mad score is one deterministic double expression
    "q_anomaly" ->
      """WITH base AS (
        |  SELECT event_id, event_type, value FROM events
        |  WHERE value IS NOT NULL
        |),
        |n AS (SELECT event_type, count(*) AS n FROM base GROUP BY 1),
        |medr AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value, event_id) AS rn
        |  FROM base
        |),
        |med AS (
        |  SELECT medr.event_type, value AS med
        |  FROM medr JOIN n USING (event_type) WHERE rn = (n + 1) // 2
        |),
        |dev AS (
        |  SELECT b.event_id, b.event_type, b.value, med.med,
        |    abs(b.value - med.med) AS adev
        |  FROM base b JOIN med USING (event_type)
        |),
        |madr AS (
        |  SELECT event_type, adev,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY adev, event_id) AS rn
        |  FROM dev
        |),
        |mad AS (
        |  SELECT madr.event_type, adev AS mad
        |  FROM madr JOIN n USING (event_type) WHERE rn = (n + 1) // 2
        |),
        |scored AS (
        |  SELECT dev.event_id, dev.event_type, dev.value, dev.med, mad.mad,
        |    round(CASE WHEN mad.mad > 0.0
        |      THEN 0.6745 * (dev.value - dev.med) / mad.mad
        |      ELSE 0.0 END, 4) AS mscore
        |  FROM dev JOIN mad USING (event_type)
        |)
        |SELECT event_id, event_type, value, med, mad, mscore,
        |  CASE WHEN abs(mscore) > 3.5 THEN 1 ELSE 0 END AS is_anomaly
        |FROM scored""".stripMargin,
  )
}
