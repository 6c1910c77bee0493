package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver's bench artifact against the round-16 failure
  * mode: the driver retains only the last 2,000 bytes of Bench stdout,
  * and at 188 queries the compact final line grew to 2,006 bytes — the
  * opening `{"metr` was clipped and BENCH_r16.json came back
  * `parsed: null`. This spec renders the line for the CURRENT surface
  * with pessimistic per-query medians and fails the build above
  * 1,900 bytes, so the next queries can't silently re-break the
  * artifact. Round 18 landed the structural squeeze the round-17
  * verdict prescribed (integer deciseconds under a self-describing
  * `queries_ds` key); if THIS guard ever trips again the remaining
  * squeeze is positional (values-only array ordered by sorted query
  * name) — coordinate it in PLANS.md round notes first.
  */
class BenchLineSpec extends AnyFunSuite {

  test("compact bench line for the current surface stays under 1,900 bytes") {
    // 8.8 s (→ "88" deciseconds) is pessimistic for the sf0.1 medians:
    // the round-17 distribution has all but two queries under 9 s, and
    // the couple of 3-digit outliers sit well inside the margin below
    // the driver's 2,000-byte tail.
    val results = graft.SparkEntry.queries.keys.toSeq.sorted.map(_ -> 8.8)
    val line = graft.Bench.compactLine(results)
    val size = line.getBytes("UTF-8").length
    assert(size <= 1900,
      s"compact bench line would be $size bytes for ${results.size} queries " +
        "(driver retains a 2,000-byte stdout tail) — squeeze the encoding " +
        "in Bench.compactLine before adding more queries")
  }

  test("the decisecond format leaves headroom for a 217-query surface") {
    // The round-17 verdict's done-condition for the squeeze: the guard
    // must not re-trip on the first growth (headroom past a 200-query
    // surface). Render a FIXED 217-query synthetic surface (3-digit
    // keys, pessimistic 8.8 s medians — real medians are mostly ≤ 3 s,
    // i.e. 1-2 digit deciseconds) and require it under the same
    // 1,900 B guard. A uniformly-88-ds 220-query render is 1,901 B, so
    // 217 is within 3 queries of the worst-case ceiling; the realistic
    // ceiling is ~235. If the surface itself ever nears 217, the
    // current-surface guard above is the one that trips first.
    val n = 217
    val synthetic = (1 to n).map(i => f"q$i%03d_x" -> 8.8)
    val size = graft.Bench.compactLine(synthetic).getBytes("UTF-8").length
    assert(size <= 1900,
      s"pessimistic render for a $n-query surface is $size bytes — the " +
        "decisecond squeeze no longer covers planned growth")
  }

  test("compact line format: value total + integer-decisecond queries_ds") {
    val line = graft.Bench.compactLine(Seq("q07_x" -> 1.23, "q104_y" -> 10.06))
    assert(line == """{"value":11.3,"queries_ds":{"7":12,"104":101}}""")
    // the round-16 overflow was exactly these re-added wrapper fields
    assert(!line.contains("\"metric\"") && !line.contains("\"unit\"") &&
      !line.contains("\"sf\""))
  }

  test("deciseconds round HALF_UP and survive float representation") {
    assert(graft.Bench.ds(0.05) == 1L)   // 0.5 ds rounds up
    assert(graft.Bench.ds(10.06) == 101L) // 100.6(000...01) -> 101
    assert(graft.Bench.ds(2.0) == 20L)
    assert(graft.Bench.ds(0.0) == 0L)
  }
}
