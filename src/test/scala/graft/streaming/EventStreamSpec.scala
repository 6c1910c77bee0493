package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming semantics: incremental results equal the batch plan
  * (hourlyAgg vs its own batch run), and sessionization state opens /
  * extends / closes on watermark progress.
  */
class EventStreamSpec extends SparkSpec {
  import EventStream._
  import spark.implicits._

  private def ts(minute: Int): Timestamp = new Timestamp(60000L * minute)

  private val fixture = Seq(
    Event(1, 100, "click", 1.0, ts(1)),
    Event(2, 100, "click", 2.0, ts(5)),
    Event(3, 200, "view", 3.0, ts(61)),
    Event(4, 100, "click", 4.0, ts(65)),
    Event(5, 200, "view", 5.0, ts(200)))

  test("hourlyAgg on a stream equals the same plan run in batch") {
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Event]
    val q = hourlyAgg(source.toDF()).writeStream
      .format("memory").queryName("hourly").outputMode("append").start()
    source.addData(fixture: _*)
    q.processAllAvailable()
    // append mode emits only watermark-closed windows; push the
    // watermark past every fixture window with a late sentinel
    source.addData(Event(99, 999, "sentinel", 0.0, ts(10000)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hourly")
      .filter(col("event_type") =!= "sentinel")
      .orderBy("hour_start", "event_type")
      .select("hour_start", "event_type", "n_events", "sum_value")
      .collect()
    val batch = hourlyAgg(fixture.toDF())
      .orderBy("hour_start", "event_type")
      .select("hour_start", "event_type", "n_events", "sum_value")
      .collect()
    assert(streamed === batch)
    assert(batch.length === 4) // (h0 click), (h1 click), (h1 view), (h3 view)
  }

  test("sessionize: gap splits sessions; watermark closes and emits them") {
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Event]
    val q = sessionize(source.toDS(), gapMinutes = 30).writeStream
      .format("memory").queryName("sessions").outputMode("append").start()
    // user 100: events at minutes 1,5,65 -> sessions [1,5] and [65,65]
    // user 200: events at 61,200 -> sessions [61,61] and [200,200]
    source.addData(fixture: _*)
    q.processAllAvailable()
    source.addData(Event(98, 999, "late", 0.0, ts(5000))) // advance watermark
    q.processAllAvailable()
    source.addData(Event(99, 999, "later", 0.0, ts(20000))) // close the sentinel user too
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessions").as[Session].collect()
      .filter(_.user_id != 999).sortBy(s => (s.user_id, s.start.getTime))
    assert(sessions.length === 4)
    val u100 = sessions.filter(_.user_id == 100)
    assert(u100.map(_.n_events).toSeq === Seq(2, 1))
    assert(u100.head.start === ts(1) && u100.head.end === ts(5))
    assert(u100.head.total_value === 3.0)
    val u200 = sessions.filter(_.user_id == 200)
    assert(u200.map(_.n_events).toSeq === Seq(1, 1))
  }

  test("sessionize: watermark-allowed out-of-order event extends the session backwards, decimal-exact totals") {
    // round-18 review findings, pinned: (1) an out-of-order event
    // (above the watermark — Spark 4 DOES filter late rows for
    // flatMapGroupsWithState, so the frontier is the reachable window)
    // that merges into the open session LOWERS its start
    // (session_window semantics; the old max-only start froze at the
    // first-seen event); (2) totals accumulate in exact DECIMAL(18,4)
    // units like sessionWindows, so a >4-decimal value rounds half-up
    // instead of leaking raw double digits into an order-dependent sum.
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Event]
    val q = sessionize(source.toDS(), gapMinutes = 30).writeStream
      .format("memory").queryName("sessions_ooo").outputMode("append").start()
    source.addData(
      Event(1, 7, "a", 1.0, ts(140)),
      Event(2, 27, "a", 1.0, ts(1)),
      Event(3, 27, "a", 2.0, ts(2)),
      Event(4, 999, "sentinel", 0.0, ts(140))) // watermark -> 110
    q.processAllAvailable()
    // 115 >= watermark(110), 25 min before the open session's start:
    // merges and EXTENDS it backwards; 0.00005 rounds to 0.0001 in the
    // decimal units (old raw-double total would read 1.00005)
    source.addData(Event(5, 7, "a", 0.00005, ts(115)))
    q.processAllAvailable()
    source.addData(Event(6, 999, "later", 0.0, ts(5000))) // close everything
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessions_ooo").as[Session].collect()
      .filter(_.user_id != 999).sortBy(s => (s.user_id, s.start.getTime))
    val u7 = sessions.filter(_.user_id == 7)
    assert(u7.map(s => (s.start, s.end, s.n_events, s.total_value)).toSeq ===
      Seq((ts(115), ts(140), 2, 1.0001)),
      s"out-of-order session extent/total drifted: ${u7.toSeq}")
    val u27 = sessions.filter(_.user_id == 27)
    assert(u27.map(s => (s.n_events, s.total_value)).toSeq === Seq((2, 3.0)))
  }

  test("streaming dedup drops in-window duplicate event ids") {
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Event]
    val q = dedupEvents(source.toDF(), "30 minutes").writeStream
      .format("memory").queryName("deduped").outputMode("append").start()
    source.addData(
      Event(1, 100, "click", 1.0, ts(1)),
      Event(1, 100, "click", 1.0, ts(2)),   // duplicate id within window
      Event(2, 100, "view", 2.0, ts(3)))
    q.processAllAvailable()
    source.addData(Event(1, 100, "click", 9.0, ts(10))) // late duplicate, still in window
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("deduped").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 2L))
  }

  test("throttle: one event per (user, type, bucket); buckets and types independent") {
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Event]
    val q = throttle(source.toDF(), bucketSeconds = 600).writeStream
      .format("memory").queryName("throttled").outputMode("append").start()
    source.addData(
      Event(1, 100, "click", 1.0, ts(1)),
      Event(2, 100, "click", 2.0, ts(5)),   // same bucket -> dropped
      Event(3, 100, "view", 3.0, ts(5)),    // same bucket, other type -> kept
      Event(4, 100, "click", 4.0, ts(11)),  // next 10-min bucket -> kept
      Event(5, 200, "click", 5.0, ts(1)))   // other user -> kept
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("throttled").select("event_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L, 5L))
  }

  test("throttle: in-order stream over REAL catalog rows equals the q87 batch rule") {
    implicit val sq = spark.sqlContext
    // sf0.001 events are too sparse for bucket collisions (one event
    // per user-type-bucket), so plant a +1 s retry twin of every row —
    // the retry burst the throttle exists to collapse — and replay the
    // union in (ts, event_id) order.
    val base = graft.Tables(spark, "/root/testdata/sf0.001").events
      .orderBy("ts", "event_id").limit(2000).as[Event].collect()
    val rows = (base ++ base.map(r => r.copy(event_id = r.event_id + 100000,
        ts = new Timestamp(r.ts.getTime + 1000))))
      .sortBy(r => (r.ts.getTime, r.event_id))
    val src = MemoryStream[Event]
    val q = throttle(src.toDF()).writeStream
      .format("memory").queryName("cat_throttled").outputMode("append").start()
    src.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cat_throttled")
      .select("event_id", "user_id", "event_type", "bucket")
      .as[(Long, Long, String, Long)].collect().toSet
    // q87's batch rule on the same rows: keep-first under (ts, event_id)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"), col("__b"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val batch = rows.toSeq.toDF()
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        floor(unix_timestamp(col("ts")) / 600).as("__b"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("__b").cast("long").as("bucket"))
      .as[(Long, Long, String, Long)].collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty && batch.size < rows.length) // throttling actually dropped rows
  }

  test("ohlc on a stream equals the same plan run in batch") {
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Event]
    val q = ohlc(source.toDF()).writeStream
      .format("memory").queryName("ohlc_small").outputMode("append").start()
    source.addData(fixture: _*)
    q.processAllAvailable()
    source.addData(Event(99, 999, "sentinel", 0.0, ts(10000)))
    q.processAllAvailable()
    q.stop()
    val cols = Seq("event_type", "day", "open", "close", "high", "low",
      "sum_value", "n_events")
    val streamed = spark.table("ohlc_small")
      .filter(col("event_type") =!= "sentinel")
      .orderBy("event_type", "day").select(cols.head, cols.tail: _*).collect()
    val batch = ohlc(fixture.toDF())
      .orderBy("event_type", "day").select(cols.head, cols.tail: _*).collect()
    assert(streamed === batch)
    assert(batch.length === 2) // day-0 click and view cells
  }

  test("ohlc: OUT-OF-ORDER stream over real catalog rows equals the q102 batch rule") {
    implicit val sq = spark.sqlContext
    // min_by/max_by over the (ts, event_id) total order are commutative
    // across micro-batches, so a shuffled replay in three chunks must
    // still reproduce q102's rank-window open/close exactly.
    val base = graft.Tables(spark, "/root/testdata/sf0.001").events
      .orderBy("ts", "event_id").limit(3000).as[Event].collect()
    val shuffled = base.sortBy(r => (r.event_id * 2654435761L) % 100003)
    val src = MemoryStream[Event]
    val q = ohlc(src.toDF()).writeStream
      .format("memory").queryName("ohlc_cat").outputMode("append").start()
    shuffled.grouped(1000).foreach { chunk =>
      src.addData(chunk.toSeq: _*); q.processAllAvailable()
    }
    src.addData(Event(999999, 999, "sentinel", 0.0,
      new Timestamp(base.map(_.ts.getTime).max + 30L * 86400000L)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ohlc_cat")
      .filter(col("event_type") =!= "sentinel")
      .select("event_type", "day", "open", "close", "high", "low",
        "sum_value", "n_events")
      .collect().map(_.toSeq).toSet
    // q102's batch rule on the same rows (rank-window open/close)
    import org.apache.spark.sql.expressions.Window
    val dayCol = to_date(col("ts")).as("__day")
    val wAsc = Window.partitionBy(col("event_type"), col("__day"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wDesc = Window.partitionBy(col("event_type"), col("__day"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val D = org.apache.spark.sql.types.DecimalType(18, 4)
    val batch = base.toSeq.toDF()
      .select(col("event_type"), dayCol, col("value"), col("ts"), col("event_id"))
      .withColumn("__ra", row_number().over(wAsc))
      .withColumn("__rd", row_number().over(wDesc))
      .groupBy(col("event_type"), col("__day"))
      .agg(
        max(when(col("__ra") === 1, col("value"))).as("open"),
        max(when(col("__rd") === 1, col("value"))).as("close"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        sum(col("value").cast(D)).cast("double").as("sum_value"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"),
        date_format(col("__day"), "yyyy-MM-dd").as("day"),
        col("open"), col("close"), col("high"), col("low"),
        col("sum_value"), col("n_events"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(batch.size > 10) // several (type, day) cells actually exercised
  }

  test("sessionWindows ≡ sessionize off the gap boundary; documented divergence ON it") {
    implicit val sq = spark.sqlContext
    // off-boundary fixture: gaps strictly under / well over 30 min
    // start at ts(1): an epoch-0 event ties the INITIAL watermark and
    // is filtered as late before any operator sees it
    val rows = Seq(
      Event(1, 100, "click", 1.0, ts(1)),
      Event(2, 100, "click", 2.0, ts(21)),   // 20 min — same session
      Event(3, 100, "click", 4.0, ts(61)),   // 40 min — new session
      Event(4, 200, "view", 8.0, ts(5)))
    def runDecl(data: Seq[Event]): Set[(Long, Long, Long, Int, Double)] = {
      val src = MemoryStream[Event]
      val q = sessionWindows(src.toDF(), gapMinutes = 30).writeStream
        .format("memory").queryName("sw").outputMode("append").start()
      src.addData(data: _*)
      q.processAllAvailable()
      src.addData(Event(99, 999, "sentinel", 0.0, ts(10000)))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("sw").filter(col("user_id") =!= 999)
        .as[(Long, Timestamp, Timestamp, Int, Double)].collect()
        .map(r => (r._1, r._2.getTime, r._3.getTime, r._4, r._5)).toSet
      spark.sql("DROP TABLE IF EXISTS sw")
      out
    }
    def runCustom(data: Seq[Event]): Set[(Long, Long, Long, Int, Double)] = {
      val src = MemoryStream[Event]
      val q = sessionize(src.toDS(), gapMinutes = 30).writeStream
        .format("memory").queryName("szc").outputMode("append").start()
      src.addData(data: _*)
      q.processAllAvailable()
      src.addData(Event(99, 999, "sentinel", 0.0, ts(10000)))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("szc").filter(col("user_id") =!= 999)
        .as[Session].collect()
        .map(s => (s.user_id, s.start.getTime, s.end.getTime, s.n_events,
          s.total_value)).toSet
      spark.sql("DROP TABLE IF EXISTS szc")
      out
    }
    assert(runDecl(rows) === runCustom(rows))
    // exactly-30-min gap: BOTH keep one session — session_window
    // merges touching extents, matching sessionize's >gap split rule
    // (measured; the half-open-window reading would predict 2 here)
    val boundary = Seq(Event(1, 300, "click", 1.0, ts(1)),
      Event(2, 300, "click", 2.0, ts(31)))
    assert(runCustom(boundary) === runDecl(boundary))
    assert(runCustom(boundary).size === 1)
  }

  test("enrich: stream-static join decorates events, unmatched keys keep nulls") {
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Event]
    val dim = Seq((100L, "gold"), (300L, "silver")).toDF("user_id", "tier")
    val q = EventStream.enrich(source.toDF(), dim).writeStream
      .format("memory").queryName("enriched").outputMode("append").start()
    source.addData(fixture: _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("enriched")
      .select("event_id", "tier").as[(Long, Option[String])].collect().toMap
    assert(out(1L) === Some("gold") && out(4L) === Some("gold"))
    assert(out(3L) === None, "user 200 has no dim row -> null tier")
    assert(out.size === fixture.size, "left join must keep every event")
  }

  test("trendingTopK: per-window leaderboard emitted once when the window closes") {
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Event]
    // window 0: 3 clicks, 2 views, 1 error -> top-2 = click, view
    val w0 = Seq(
      Event(1, 1, "click", 0, ts(1)), Event(2, 1, "click", 0, ts(2)),
      Event(3, 2, "click", 0, ts(3)), Event(4, 2, "view", 0, ts(4)),
      Event(5, 3, "view", 0, ts(5)), Event(6, 3, "error", 0, ts(6)))
    val q = EventStream.trendingTopK(source.toDS(), k = 2, windowMinutes = 60)
      .writeStream.format("memory").queryName("trend").outputMode("append").start()
    source.addData(w0: _*)
    q.processAllAvailable()
    // watermark hasn't passed the window end yet -> nothing emitted
    assert(spark.table("trend").count() === 0)
    source.addData(Event(99, 9, "late", 0, ts(10000))) // push watermark
    q.processAllAvailable()
    q.stop()
    val out = spark.table("trend")
      .as[Trending].collect().filter(_.window_start.getTime == 0L)
      .sortBy(_.rank)
    assert(out.map(t => (t.event_type, t.n_events, t.rank)).toSeq ===
      Seq(("click", 3L, 1), ("view", 2L, 2)))
  }

  test("userSketches: streamed sketch table batch-merges to the true distinct count") {
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Event]
    val q = EventStream.userSketches(source.toDF(), windowMinutes = 60)
      .writeStream.format("memory").queryName("sketches")
      .outputMode("append").start()
    // 300 events over 2 hours, users cycle mod 97 per type
    val evs = (1 to 300).map(i => Event(i, i % 97,
      if (i % 2 == 0) "click" else "view", 0.0, ts(i % 120)))
    source.addData(evs: _*)
    q.processAllAvailable()
    source.addData(Event(9999, 999, "sentinel", 0.0, ts(10000)))
    q.processAllAvailable()
    q.stop()
    val sketches = spark.table("sketches")
      .filter(col("event_type") =!= "sentinel")
    // one sketch row per (closed window, type): 2 windows x 2 types
    assert(sketches.count() === 4)
    // the whole-range answer comes from merging STORED sketches — the
    // stream itself is never rescanned
    val merged = sketches.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch"))).as("m"))
      .as[(String, Long)].collect().toMap
    val truth = evs.groupBy(_.event_type)
      .map { case (t, es) => t -> es.map(_.user_id).distinct.size }
    assert(merged.keySet === truth.keySet)
    truth.foreach { case (t, exact) =>
      assert(math.abs(merged(t) - exact).toDouble / exact <= 0.02,
        s"$t: merged ${merged(t)} vs exact $exact")
    }
  }

  test("batch twin: hourlyAgg grouping matches q15's on the events table") {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val agg = hourlyAgg(t.events)
    val q15 = graft.queries.RelationalQueries.queries("q15_time_bucket")(
      spark, "/root/testdata/sf0.001")
    // same (window, type) cardinality and identical exact-decimal sums
    assert(agg.count() === q15.count())
    val a = agg.agg(sum("sum_value")).head().getDouble(0)
    val b = q15.agg(sum("sum_value")).head().getDouble(0)
    // per-group sums are identical decimals; only this cross-group
    // double total is order-sensitive — compare with tolerance
    assert(math.abs(a - b) < 1e-6 * math.abs(b))
  }

  test("valueHistograms: streamed bin rows batch-merge to the EXACT batch percentiles") {
    implicit val sq = spark.sqlContext
    val (lo, hi, bins) = (0.0, 100.0, 64)
    val source = MemoryStream[Event]
    val q = EventStream.valueHistograms(source.toDF(), lo, hi, bins,
        windowMinutes = 60)
      .writeStream.format("memory").queryName("vhist")
      .outputMode("append").start()
    // 400 events over 2 hours, deterministic skewed values in [0, 100)
    val evs = (1 to 400).map(i => Event(i, i % 50,
      if (i % 2 == 0) "click" else "view",
      (i * i % 997) % 100 * 1.0, ts(i % 120)))
    source.addData(evs: _*)
    q.processAllAvailable()
    source.addData(Event(9999, 999, "sentinel", 0.0, ts(10000)))
    q.processAllAvailable()
    q.stop()
    val stored = spark.table("vhist").filter(col("event_type") =!= "sentinel")
    assert(stored.count() > 0)
    // percentiles from the STORED stream rows — the stream itself is
    // never rescanned — must be BIT-IDENTICAL to a batch histogram
    // over the same events: integer counts under the same fixed grid
    // merge exactly, the property KLL/GK sketches cannot offer
    val fromStream = graft.operators.QuantileSketch.percentilesFromBins(
        stored, Seq("event_type"), Seq("p50" -> 0.5, "p90" -> 0.9), lo, hi, bins)
      .as[(String, Double, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val batchDf = evs.filterNot(_.event_type == "sentinel")
      .toDF().select(col("event_type"), col("value"))
    val fromBatch = graft.operators.QuantileSketch.percentiles(
        graft.operators.QuantileSketch.histogram(batchDf, "value",
          Seq("event_type"), lit(0), "all", lo, hi, bins),
        Seq("event_type"), Seq("p50" -> 0.5, "p90" -> 0.9), lo, hi, bins)
      .as[(String, Double, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(fromStream === fromBatch)
    assert(fromBatch.keySet === Set("click", "view"))
  }

  test("every streaming op runs over the post-catalog events schema (batch mode)") {
    // Round-8 lesson: the corpus' physical encoding can drift under the
    // repo. CatalogSpec pins the types; THIS pins that each streaming
    // op still analyzes + executes against the REAL catalog schema
    // (watermarks are no-ops in batch), so a drift that survives the
    // type check — a renamed column, a narrowed nullable — still dies
    // here with the op's name on it, not in a driver run.
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val ev = t.events
    val n = ev.count()
    assert(hourlyAgg(ev).count() > 0, "hourlyAgg over catalog schema")
    assert(EventStream.userSketches(ev).count() > 0, "userSketches over catalog schema")
    assert(EventStream.valueHistograms(ev, 0.0, 500.0, 64).count() > 0,
      "valueHistograms over catalog schema")
    // dropDuplicatesWithinWatermark is streaming-only: pin its schema
    // contract by replaying catalog rows through a MemoryStream
    locally {
      implicit val sq = spark.sqlContext
      val sample = ev.orderBy("event_id").limit(100).as[Event].collect()
      val src = MemoryStream[Event]
      val q = EventStream.dedupEvents(src.toDF()).writeStream
        .format("memory").queryName("cat_dedup").outputMode("append").start()
      src.addData(sample: _*)
      q.processAllAvailable()
      q.stop()
      assert(spark.table("cat_dedup").count() === sample.length,
        "dedupEvents over catalog schema (event_id unique in corpus)")
    }
    assert(EventStream.attribute(ev, "click", "purchase", 30).count() > 0,
      "attribute over catalog schema")
    val dim = Seq((1L, "gold")).toDF("user_id", "tier")
    assert(EventStream.enrich(ev, dim).count() === n, "enrich over catalog schema")
    // typed ops: the Event encoder must still resolve against the
    // catalog frame (extra columns like props are dropped by upcast)
    assert(ev.as[Event].filter(_.ts != null).count() === n,
      "Event encoder resolves the catalog schema")
  }

  test("sessionize and hourlyAgg: stream over REAL catalog rows equals batch") {
    // The fixture tests pin semantics on hand rows; this replays actual
    // corpus rows through MemoryStream so the stream ≡ batch contract
    // is exercised on the data distribution the engine actually serves
    // (sub-second timestamps, many users, both watermark orders).
    implicit val sq = spark.sqlContext
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val rows = t.events.orderBy("ts", "event_id").limit(2000)
      .as[Event].collect()

    // hourlyAgg: streamed closed windows == batch plan on the same rows
    val src1 = MemoryStream[Event]
    val q1 = hourlyAgg(src1.toDF()).writeStream
      .format("memory").queryName("cat_hourly").outputMode("append").start()
    src1.addData(rows: _*)
    q1.processAllAvailable()
    src1.addData(Event(-1, -1, "sentinel", 0.0,
      new Timestamp(rows.map(_.ts.getTime).max + 100L * 3600 * 1000)))
    q1.processAllAvailable()
    q1.stop()
    val streamedHourly = spark.table("cat_hourly")
      .filter(col("event_type") =!= "sentinel")
      .select("hour_start", "event_type", "n_events", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val batchHourly = hourlyAgg(rows.toSeq.toDF())
      .select("hour_start", "event_type", "n_events", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(streamedHourly === batchHourly)
    assert(batchHourly.nonEmpty)

    // sessionize: streamed closed sessions == ms-exact gaps-and-islands
    // batch twin (same integer-ms gap rule the streaming state machine
    // applies; q69's floored-seconds variant is its own oracle row)
    val src2 = MemoryStream[Event]
    val q2 = sessionize(src2.toDS(), gapMinutes = 30).writeStream
      .format("memory").queryName("cat_sessions").outputMode("append").start()
    src2.addData(rows: _*)
    q2.processAllAvailable()
    src2.addData(Event(-1, -1, "sentinel", 0.0,
      new Timestamp(rows.map(_.ts.getTime).max + 100L * 3600 * 1000)))
    q2.processAllAvailable()
    q2.stop()
    val streamedSessions = spark.table("cat_sessions").as[Session].collect()
      .filter(_.user_id >= 0)
      .map(s => (s.user_id, s.start.getTime, s.end.getTime, s.n_events,
        BigDecimal(s.total_value).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gapMs = unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w)
    val batchSessions = rows.toSeq.toDF()
      .withColumn("__new", when(gapMs.isNull || gapMs > 30L * 60000, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__sid"))
      .agg(min(unix_millis(col("ts"))).as("start_ms"),
        max(unix_millis(col("ts"))).as("end_ms"),
        count(lit(1)).cast("int").as("n_events"),
        sum(col("value")).as("total_value"))
      .as[(Long, Long, Long, Long, Int, Double)].collect()
      .map(r => (r._1, r._3, r._4, r._5,
        BigDecimal(r._6).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    assert(streamedSessions === batchSessions)
    assert(batchSessions.nonEmpty)
  }

  test("retention: streamed activity table batch-folds to the exact q81 matrix") {
    // retention() emits one deduped (user, day) row with the cohort
    // attached; grouping the emitted table must reproduce the
    // oracle-checked q81 batch query on the same corpus.
    implicit val sq = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Tables(spark, dir).events
      .orderBy("ts", "event_id").as[Event].collect()
    val src = MemoryStream[Event]
    val q = EventStream.retention(src.toDS()).writeStream
      .format("memory").queryName("cat_retention").outputMode("append").start()
    src.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cat_retention")
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .as[(String, Long, Long)].collect().toSet
    val batch = graft.SparkEntry.queries("q81_retention")(spark, dir)
      .as[(String, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("retention: incremental arrival dedups days and drops late pre-cohort rows") {
    implicit val sq = spark.sqlContext
    val day = 86400000L
    def ev(id: Long, uid: Long, d: Int) =
      Event(id, uid, "click", 1.0, new Timestamp(d * day + 3600000L))
    val src = MemoryStream[Event]
    val q = EventStream.retention(src.toDS()).writeStream
      .format("memory").queryName("ret_inc").outputMode("append").start()
    src.addData(ev(1, 7, 10), ev(2, 7, 10)) // same day twice -> one row
    q.processAllAvailable()
    src.addData(ev(3, 7, 12)) // later batch, new day -> offset 2
    q.processAllAvailable()
    src.addData(ev(4, 7, 12), ev(5, 7, 9)) // dup day + late pre-cohort
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ret_inc")
      .as[Activity].collect().map(a => (a.user_id, a.day_offset)).sorted.toSeq
    assert(got === Seq((7L, 0L), (7L, 2L)),
      s"expected deduped offsets 0 and 2 only, got $got")
  }

  test("attribute: stream-stream interval join matches hand trace and the batch twin") {
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Event]
    val q = EventStream.attribute(source.toDF(), "click", "buy",
        withinMinutes = 30)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    val evs = Seq(
      Event(1, 7, "click", 0.0, ts(10)),
      Event(2, 7, "buy",   1.0, ts(25)),  // 15 min after click 1 -> match
      Event(3, 7, "buy",   1.0, ts(45)),  // 35 min after click 1 (no) but 5 after click 7 (match)
      Event(4, 8, "click", 0.0, ts(20)),
      Event(5, 9, "buy",   1.0, ts(21)),  // user 9 never clicked -> no match
      Event(6, 8, "buy",   1.0, ts(20)),  // same minute as click 4 -> match (lag 0)
      Event(7, 7, "click", 0.0, ts(40)),
      Event(8, 7, "buy",   1.0, ts(50))   // matches click 7 (10 min), not click 1
    )
    source.addData(evs: _*)
    q.processAllAvailable()
    // advance both watermarks far past every event so all matches emit
    source.addData(Event(999, 999, "click", 0.0, ts(10000)),
      Event(1000, 999, "buy", 0.0, ts(10000)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attrib").filter(col("user_id") =!= 999)
      .select(col("cause_id"), col("effect_id"), col("lag_seconds"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 900L), (4L, 6L, 0L), (7L, 3L, 300L),
      (7L, 8L, 600L)))
    // batch twin: the same plan over the same rows as a static frame
    // (watermarks are no-ops in batch) returns the same matches
    val batch = EventStream.attribute(evs.toDF(), "click", "buy", 30)
      .filter(col("user_id") =!= 999)
      .select(col("cause_id"), col("effect_id"), col("lag_seconds"))
      .as[(Long, Long, Long)].collect().toSet
    assert(batch === got)
  }

  test("transitions: streamed pairs over corpus rows across batches equal the batch window plan") {
    implicit val sq = spark.sqlContext
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val rows = t.events.orderBy("ts", "event_id").limit(1500).as[Event].collect()
    val src = MemoryStream[Event]
    val q = EventStream.transitions(src.toDS()).writeStream
      .format("memory").queryName("trans").outputMode("append").start()
    // three chunks with state bridging the boundaries (per-user order
    // is preserved: chunks are consecutive slices of the global order)
    rows.grouped(500).foreach { chunk =>
      src.addData(chunk.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("trans")
      .select("user_id", "from_type", "to_type", "ts")
      .as[(Long, String, String, Timestamp)].collect()
      .map(x => (x._1, x._2, x._3, x._4.getTime)).sorted.toSeq
    // batch twin: q115's exact window plan on the same rows
    val wU = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val batchPairs = rows.toSeq.toDF()
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("from_type"))
      .withColumn("to_type", org.apache.spark.sql.functions.lead(col("from_type"), 1).over(wU))
      .withColumn("to_ts", org.apache.spark.sql.functions.lead(col("ts"), 1).over(wU))
      .filter(col("to_type").isNotNull)
      .select(col("user_id"), col("from_type"), col("to_type"), col("to_ts"))
      .as[(Long, String, String, Timestamp)].collect()
      .map(x => (x._1, x._2, x._3, x._4.getTime)).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batchPairs)
    // the Markov table re-agg over stored pairs matches the q115 shape
    // computed directly from the batch pairs
    val streamTable = EventStream.markovTable(spark.table("trans"))
      .as[(String, String, Long, Double)].collect().toSet
    val batchTable = EventStream.markovTable(
        batchPairs.toDF("user_id", "from_type", "to_type", "ts"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamTable === batchTable)
  }

  test("funnel: latest streamed stage per user across batches equals batch q129") {
    implicit val sq = spark.sqlContext
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val rows = t.events.orderBy("ts", "event_id").limit(1500).as[Event].collect()
    val src = MemoryStream[Event]
    val q = EventStream.funnel(src.toDS()).writeStream
      .format("memory").queryName("funnelupd").outputMode("append").start()
    rows.grouped(500).foreach { chunk =>
      src.addData(chunk.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    // a user's updates are monotone in stage — the max-stage row (ties
    // impossible: a row is only emitted when the state ADVANCES, and
    // t_* fields never change once set) is the user's final state
    val streamed = spark.table("funnelupd").as[FunnelUpdate].collect()
      .groupBy(_.user_id).map { case (u, ups) => ups.maxBy(_.stage) }
      .map(u => (u.user_id, u.t_signup, u.t_click.getOrElse(-1L),
        u.t_purchase.getOrElse(-1L), u.stage))
      .toSeq.sorted
    val batch = graft.queries.RelationalQueries.batchFunnel(rows.toSeq.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))
      .toSeq.sorted
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("rollingFeatures: streamed trailing stats across epoch-granular batches equal batch q131") {
    implicit val sq = spark.sqlContext
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val rows = t.events.orderBy("ts", "event_id").limit(1500).as[Event].collect()
    // replay contract: rows sharing an epoch second stay in one batch —
    // split at epoch boundaries nearest to thirds
    val secs = rows.map(e => e.ts.getTime / 1000L)
    def cutAfter(i0: Int): Int = {
      var i = i0
      while (i < rows.length - 1 && secs(i + 1) == secs(i)) i += 1
      i + 1
    }
    val c1 = cutAfter(500); val c2 = cutAfter(1000)
    val chunks = Seq(rows.slice(0, c1), rows.slice(c1, c2), rows.slice(c2, rows.length))
    val src = MemoryStream[Event]
    val q = EventStream.rollingFeatures(src.toDS()).writeStream
      .format("memory").queryName("rollupd").outputMode("append").start()
    chunks.foreach { chunk =>
      src.addData(chunk.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("rollupd").as[RollingUpdate].collect()
      .map(u => (u.event_id, u.event_type, u.epoch, u.n_1h, u.mean_1h))
      .toSeq.sorted
    // batch twin: the exact q131 plan (DistributedRank.rollingRange)
    val D = org.apache.spark.sql.types.DecimalType(18, 6)
    val batch = graft.operators.DistributedRank.rollingRange(
        rows.toSeq.toDF().select(col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("epoch"), col("value").cast(D).as("__dv")),
        Seq("event_type"), "epoch", 3600L, Seq("__dv"))
      .select(col("event_id"), col("event_type"), col("epoch"),
        col("__roll_n").as("n_1h"),
        round(col("__roll___dv").cast("double") / col("__roll_n"), 9).as("mean_1h"))
      .as[(Long, String, Long, Long, Double)].collect().toSeq.sorted
    assert(streamed.length === rows.length)
    assert(streamed === batch)
  }

  test("driftTimeline: streamed day-over-day TVD equals batch q153 on closed days") {
    implicit val sq = spark.sqlContext
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val rows = t.events.orderBy("ts", "event_id").as[Event].collect()
    // replay contract (day-granular): rows sharing a DAY stay in one
    // batch run order; split near thirds at day boundaries
    val days = rows.map(e => Math.floorDiv(Math.floorDiv(e.ts.getTime, 1000L), 86400L))
    def cutAfter(i0: Int): Int = {
      var i = i0
      while (i < rows.length - 1 && days(i + 1) == days(i)) i += 1
      i + 1
    }
    val c1 = cutAfter(rows.length / 3); val c2 = cutAfter(2 * rows.length / 3)
    val chunks = Seq(rows.slice(0, c1), rows.slice(c1, c2), rows.slice(c2, rows.length))
    val src = MemoryStream[Event]
    val q = EventStream.driftTimeline(src.toDS()).writeStream
      .format("memory").queryName("driftpts").outputMode("append").start()
    chunks.foreach { chunk =>
      src.addData(chunk.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("driftpts").as[DriftPoint].collect()
      .map(p => (p.event_type, p.day, p.n_prev, p.n_cur, p.tvd)).toSeq.sorted
    // batch twin: the exact q153 plan, restricted to CLOSED days (the
    // final open day per type has no streamed point yet)
    val lastDay = rows.groupBy(_.event_type).view
      .mapValues(es => es.map(e =>
        Math.floorDiv(Math.floorDiv(e.ts.getTime, 1000L), 86400L)).max).toMap
    val batch = graft.operators.FeatureDrift.tvdTimeline(
        rows.toSeq.toDF().select(col("event_type"),
          unix_timestamp(col("ts")).as("epoch"), col("value")),
        Seq("event_type"), "epoch", "value", binWidth = 50.0)
      .as[(String, Long, Long, Long, Double)].collect()
      .filter { case (typ, day, _, _, _) => day < lastDay(typ) }
      .toSeq.sorted
    assert(streamed.nonEmpty && streamed === batch)
  }
}
