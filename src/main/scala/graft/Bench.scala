package graft

/** Per-round benchmark main (driver contract): runs every SparkEntry
  * query on SPARK_GRAFT_SF_DIR. Detail lines (name map, raw run
  * triples, per-task memory peaks) print first; the FINAL stdout line
  * is one compact JSON summary (total + per-query medians) sized to
  * survive the driver's ~2.2 KB stdout-tail retention.
  *
  * Materialization: `write.format("noop")` — consumes every row of
  * every column of the final plan, so projections/scalar pipelines are
  * actually executed (a bare `.count()` lets Catalyst prune them away).
  * Failures are NOT swallowed: a broken query fails the bench loudly.
  */
object Bench {
  /** Trailing-zero-trimmed HALF_UP rendering at `scale` decimals —
    * the ONE number formatter for both the compact line (1 decimal:
    * ~0.05 s quantization, below box noise) and the peak-MB detail
    * line (2 decimals).
    */
  def trim(v: Double, scale: Int): String = {
    val s = BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString
    val t = s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
    if (t.isEmpty) "0" else t
  }

  /** 1-decimal rendering for the compact line (full 3-decimal raw
    * triples remain in the bench_runs detail line).
    */
  def j1(v: Double): String = trim(v, 1)

  /** Bare query number: "q073_foo" → "73" (maps back via bench_names). */
  def num(k: String): String = k.drop(1).takeWhile(_.isDigit).dropWhile(_ == '0')

  /** Integer DECISECONDS (HALF_UP) for the compact line's per-query
    * values: "1.23 s" → 12, "10.06 s" → 101. A decisecond (~0.1 s) is
    * below box noise, and dropping the decimal point buys ~1.5 B/query
    * on the size-capped final line.
    */
  def ds(v: Double): Long =
    BigDecimal(v * 10).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** The driver-contract FINAL stdout line, as a pure function so
    * BenchLineSpec can render it for the CURRENT surface and fail the
    * build before the driver's 2,000-byte stdout-tail retention clips
    * it (round 16: the line hit 2,006 B and BENCH_r16.json came back
    * `parsed: null`). Contract (round-11 fix, tightened round 14/17,
    * re-squeezed round 18 per the round-17 verdict's prescription):
    * `"value"` = total seconds (1-decimal, trailing-zero-trimmed) and
    * `"queries_ds"` = per-query medians keyed by BARE query number in
    * integer DECISECONDS (the self-describing `_ds` suffix IS the
    * unit). No metric/unit/sf wrapper fields (the round-16 overflow
    * was exactly those 45 bytes; the driver's artifact wrapper records
    * sf itself). The decisecond switch bought ~1.5 B/query — at the
    * 197-query round-17 surface the pessimistic render dropped 1,890 →
    * ~1,700 B, re-opening ~25 queries of growth under the 1,900 B
    * guard. Format changes here must be coordinated in PLANS.md round
    * notes so the driver/judge parse the new key, never slipped in
    * silently.
    */
  def compactLine(results: Seq[(String, Double)]): String = {
    val qs = results.map { case (k, v) => "\"" + num(k) + "\":" + ds(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    s"""{"value":${j1(total)},"queries_ds":$qs}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the shared factory — one config block for tests/Verify/Bench, so
    // Bench measures exactly the engine configuration Verify verifies
    val spark = GraftSession.local(cpus.toInt, "graft-bench",
      warehousePrefix = "graft-warehouse-bench")
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up: run EVERY query once at sf0.001 (uncounted)
    // so no measured run absorbs classloading, parquet footer reads, or
    // one-off whole-stage-codegen compilation (VERDICT r1: q06 at 5.8s
    // was pure warm-up; r2: q14 at 7.3s was one-off codegen of the wide
    // string projection). Measured numbers are steady-state per-query
    // cost — what a long-running cluster job actually pays.
    // Warm-up data: the smallest sf sibling of sfDir if present (cheap),
    // else sfDir itself — no hardcoded absolute path.
    val warmDir = sys.env.get("SPARK_GRAFT_WARMUP_DIR").getOrElse {
      val parent = new java.io.File(sfDir).getParentFile
      Option(parent).map(p => new java.io.File(p, "sf0.001"))
        .filter(_.isDirectory).map(_.getPath).getOrElse(sfDir)
    }
    SparkEntry.queries.values.foreach { fn =>
      fn(spark, warmDir).write.format("noop").mode("overwrite").save()
    }
    // q32's input parquet (the multimodal fixture), q42's bucketed
    // tables, q54's z-ordered copy and q57's time-clustered copy +
    // manifest are generated on first touch; every other query's input
    // already sits on disk. Materialize them for the MEASURED sf
    // during warm-up so the measured runs read from disk like their
    // peers instead of paying a one-time layout write.
    Seq("q32_multimodal", "q42_bucketed_join", "q48_ivfpq_probe",
        "q54_zorder_scan", "q57_manifest_scan",
        "q64_daily_quantile_sketch", "q89_partition_prune",
        "q97_pca_project", "q119_phash_image_neardup",
        "q121_training_set", "q143_ivf_drift", "q146_bm25").foreach { q =>
      SparkEntry.queries.get(q).foreach { fn =>
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    // Median of 3 measured runs per query, the three runs INTERLEAVED:
    // three round-robin passes over the full sorted query list, median
    // taken per query ACROSS passes. Back-to-back median-of-3 cannot
    // reject a sustained co-tenant load burst — all three runs land
    // inside it (VERDICT r7: q03 recorded 25.5 s, steady-state 2.30 s).
    // With passes minutes apart, a burst inflates different queries in
    // each pass and the median discards it. Raw triples are emitted in
    // the JSON so the artifact itself exposes any residual noise.
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    val peak = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) peak.getAndAccumulate(m.peakExecutionMemory, Math.max(_, _))
      }
    })
    val raw = Array.fill(named.size)(Vector.empty[Double])
    val peaks = Array.fill(named.size)(0L)
    for (_ <- 1 to 3; ((name, fn), i) <- named.zipWithIndex) {
      org.apache.spark.graft.BusFlush.flush(spark.sparkContext)
      peak.set(0L)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      raw(i) :+= (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.BusFlush.flush(spark.sparkContext)
      peaks(i) = math.max(peaks(i), peak.get)
    }
    val results = named.zipWithIndex.map { case ((name, _), i) =>
      name -> raw(i).sorted.apply(1)
    }
    // Detail payloads (raw triples, per-task memory peaks, short→full
    // name map) print as separate EARLIER lines; the FINAL stdout line
    // is the compact summary rendered by `compactLine` above (see its
    // scaladoc for the size contract; BenchLineSpec pins it ≤ 1,900 B
    // for the current surface).
    def j3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    def j2(v: Double): String = trim(v, 2)
    val namesJson = named.map { case (k, _) =>
      "\"" + num(k) + "\":\"" + k + "\""
    }.mkString("{", ",", "}")
    val runsJson = named.zipWithIndex.map { case ((k, _), i) =>
      "\"" + k + "\":" + raw(i).map(j3).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // peak_mb = largest single-task execution-memory peak observed for
    // the query (bytes → MiB): the per-task memory headroom signal —
    // what has to fit in one executor task slot at the target SF.
    val peakJson = named.zipWithIndex.map { case ((k, _), i) =>
      "\"" + k + "\":" + j2(peaks(i) / 1048576.0)
    }.mkString("{", ",", "}")
    println(s"""{"bench_names":$namesJson}""")
    println(s"""{"bench_runs":$runsJson}""")
    println(s"""{"bench_peak_mb":$peakJson}""")
    println(compactLine(results))
    spark.stop()
  }
}
