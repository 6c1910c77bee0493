package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The round-12/13/14 process-debt class, made impossible to ship:
  * PLANS.md's header claimed a stale query count three rounds running
  * (the table lagged or the header lagged the table). The header is
  * now emitted by `tools.PlanAudit --write-header` from the LIVE
  * `SparkEntry.queries`, and this spec fails the suite whenever the
  * two disagree — a late-landing query turns the build red until the
  * header is regenerated.
  */
class PlansHeaderSpec extends AnyFunSuite {

  private def plansText: String = {
    val src = scala.io.Source.fromFile("PLANS.md")(scala.io.Codec.UTF8)
    try src.mkString finally src.close()
  }

  test("PLANS.md carries the AUTOGEN header block") {
    assert(plansText.contains(PlanAudit.HeaderBegin) &&
      plansText.contains(PlanAudit.HeaderEnd),
      "PLANS.md lost its AUTOGEN header — regenerate: " +
        "Test/runMain graft.tools.PlanAudit --write-header PLANS.md <benchJson>")
  }

  test("PLANS.md header surface count equals SparkEntry.queries.size") {
    val n = graft.SparkEntry.queries.size
    assert(plansText.contains(PlanAudit.surfaceLine(n)),
      s"PLANS.md header is stale (live surface: $n queries) — regenerate: " +
        "Test/runMain graft.tools.PlanAudit --write-header PLANS.md <benchJson>")
  }

  test("a round-close bench line must cover the whole surface") {
    // round-15 process debt: the close bench ran BEFORE the last query
    // landed (header said 163 of a 164 surface). Mid-round headers may
    // omit the bench line (regenerated without a bench JSON); when the
    // line IS present, its query count must equal the live surface —
    // so the close discipline is: last query lands -> bench -> header.
    val n = graft.SparkEntry.queries.size
    val benchRe = raw"Round-close bench: [0-9.]+ s / (\d+) queries".r
    benchRe.findFirstMatchIn(plansText).foreach { m =>
      assert(m.group(1).toInt == n,
        s"round-close bench covered ${m.group(1)} of $n queries — run the " +
          "close bench AFTER the final query lands, then regenerate the header")
    }
  }
}
