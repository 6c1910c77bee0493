package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver's bench artifact against the round-16 failure
  * mode: the driver retains only the last 2,000 bytes of Bench stdout,
  * and at 188 queries the compact final line grew to 2,006 bytes — the
  * opening `{"metr` was clipped and BENCH_r16.json came back
  * `parsed: null`. This spec renders the line for the CURRENT surface
  * with pessimistic per-query medians and fails the build above
  * 1,900 bytes, so the next queries can't silently re-break the
  * artifact: when it trips, squeeze the encoding (shorter keys, drop
  * the decimal for values >= 10) BEFORE landing the query.
  */
class BenchLineSpec extends AnyFunSuite {

  test("compact bench line for the current surface stays under 1,900 bytes") {
    // 8.8 renders as 3 chars — pessimistic for the sf0.1 medians (the
    // round-16 distribution: all but two queries under 9 s; a couple of
    // 4-char outliers are well inside the 100-byte margin below 2,000).
    val results = graft.SparkEntry.queries.keys.toSeq.sorted.map(_ -> 8.8)
    val line = graft.Bench.compactLine(results)
    val size = line.getBytes("UTF-8").length
    assert(size <= 1900,
      s"compact bench line would be $size bytes for ${results.size} queries " +
        "(driver retains a 2,000-byte stdout tail) — squeeze the encoding " +
        "in Bench.compactLine before adding more queries")
  }

  test("compact line format: value/queries only, 1-decimal values") {
    val line = graft.Bench.compactLine(Seq("q07_x" -> 1.23, "q104_y" -> 10.06))
    assert(line == """{"value":11.3,"queries":{"7":1.2,"104":10.1}}""")
    // the round-16 overflow was exactly these re-added wrapper fields
    assert(!line.contains("\"metric\"") && !line.contains("\"unit\"") &&
      !line.contains("\"sf\""))
  }
}
