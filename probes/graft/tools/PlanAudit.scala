package graft.tools

/** Plan audit: print the parquet ReadSchema and exchange count for every
  * SparkEntry query — the "would this survive 100×" checklist (column
  * pruning reached the scan? how many shuffles?). Diagnostic main, not
  * part of the driver contract.
  *
  * `--write-header <plansPath> [benchJsonPath]` additionally rewrites
  * the AUTOGEN header block of PLANS.md: the query count is read from
  * `SparkEntry.queries` AT GENERATION TIME and the round-close bench
  * total parsed from the bench JSON (when given) — so a late-landing
  * query can never leave a stale surface/bench claim (rounds 12-14
  * each shipped one; PlansHeaderSpec now fails the suite if the header
  * and the live query map disagree).
  */
object PlanAudit {

  val HeaderBegin = "<!-- AUTOGEN:HEADER (tools.PlanAudit --write-header; hand edits here are overwritten) -->"
  val HeaderEnd = "<!-- /AUTOGEN:HEADER -->"
  // the line PlansHeaderSpec parses — keep the two formats in sync
  def surfaceLine(n: Int): String = s"- **Surface: $n queries** — one audit row per query in the table below."

  def renderHeader(nQueries: Int, benchJson: Option[String],
                   benchFile: Option[String]): String = {
    val bench = benchJson match {
      case Some(js0) =>
        // the driver artifact embeds the compact line as an ESCAPED
        // string field — normalize \" to " so both that wrapper and a
        // raw bench stdout line parse identically
        val js = js0.replace("\\\"", "\"")
        // the authoritative record is the LAST compact summary line
        // (earlier fragments in the tail would double-count); its
        // queries object uses bare-number keys. The line leads with
        // "value" since round 17 (the "metric" wrapper was dropped
        // for the 2 KB stdout-tail budget).
        val tail = { val i = js.lastIndexOf("{\"value\""); if (i >= 0) js.substring(i) else js }
        val total = "\"value\"\\s*:\\s*([0-9.]+)".r.findFirstMatchIn(tail).map(_.group(1))
        // the compact line carries no sf field by contract; the file
        // name records the run (e.g. bench_r17_close) — default sf0.1,
        // the driver's bench scale
        val sf = "\"sf\"\\s*:\\s*\"?(?:sf)?([0-9.]+)\"?".r.findFirstMatchIn(js)
          // honest default: the compact line carries no sf field by
          // contract, so a non-sf0.1 artifact would be mislabeled —
          // the label says "assumed" for exactly that reason
          .map(m => "sf" + m.group(1))
          .orElse(Some("sf0.1 (assumed; line carries no sf field)"))
        // round 18 renamed the per-query map "queries" -> "queries_ds"
        // (integer deciseconds; the suffix is the unit). Accept both so
        // pre-r18 artifacts still render a truthful header.
        val nq = "\"queries(?:_ds)?\"\\s*:\\s*\\{".r.findFirstMatchIn(tail).map { m =>
          val close = tail.indexOf("}", m.end)
          tail.substring(m.end, if (close < 0) tail.length else close).count(_ == ':')
        }.getOrElse(0)
        s"- **Round-close bench: ${total.getOrElse("?")} s / $nq queries at " +
          s"${sf.getOrElse("?")}** (parsed from ${benchFile.getOrElse("bench json")})."
      case None =>
        "- Round-close bench: not provided at this regeneration (pass the bench JSON path)."
    }
    s"""$HeaderBegin
# PLANS — physical-plan audit ($nQueries-query surface)

${surfaceLine(nQueries)}
$bench
- Audit config: sf0.01, local[4]; counts are executedPlan-string Exchanges
  (BroadcastExchange split out; AQE prints Final+Initial per nested cached
  level, so iterative queries carry a footnote in their rows).
$HeaderEnd"""
  }

  /** Replace (or prepend) the AUTOGEN header block in `plansPath`. */
  def writeHeader(plansPath: String, benchJsonPath: Option[String]): Unit = {
    val nQueries = graft.SparkEntry.queries.size
    val benchJs = benchJsonPath.map { p =>
      val src = scala.io.Source.fromFile(p)(scala.io.Codec.UTF8)
      try src.mkString finally src.close()
    }
    val header = renderHeader(nQueries, benchJs, benchJsonPath)
    val f = new java.io.File(plansPath)
    val old = if (f.exists()) {
      val src = scala.io.Source.fromFile(f)(scala.io.Codec.UTF8)
      try src.mkString finally src.close()
    } else ""
    val next =
      if (old.contains(HeaderBegin) && old.contains(HeaderEnd)) {
        val pre = old.substring(0, old.indexOf(HeaderBegin))
        val post = old.substring(old.indexOf(HeaderEnd) + HeaderEnd.length)
        pre + header + post
      } else header + "\n\n" + old
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.print(next) finally w.close()
    println(s"HEADER written: $nQueries queries -> $plansPath")
  }

  def main(args: Array[String]): Unit = {
    val wh = args.indexOf("--write-header")
    if (wh >= 0) {
      val plansPath = args(wh + 1)
      val benchJson = args.lift(wh + 2)
      writeHeader(plansPath, benchJson)
      return
    }
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(4, "plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val lines = plan.split("\n")
      val reads = lines.filter(_.contains("ReadSchema"))
        .map(_.replaceAll(".*ReadSchema: ", "").take(90)).distinct
      // a BroadcastExchange moves a small side to every executor — NOT
      // a shuffle; count the two separately so the audit grades the
      // right thing (shuffles repartition the big side)
      val broadcasts = lines.count(_.contains("BroadcastExchange"))
      val shuffles = lines.count(_.contains("Exchange")) - broadcasts
      println(s"AUDIT $name shuffles=$shuffles broadcasts=$broadcasts " +
        s"reads=${reads.mkString(" ; ")}")
    }
    spark.stop()
  }
}
