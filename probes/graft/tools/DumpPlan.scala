package graft.tools

/** Dump `.explain("formatted")` for named queries to files — the
  * round-18 optimization evidence trail (plans/r18/<q>_{before,after}.txt).
  *
  * runMain graft.tools.DumpPlan <sfDir> <outDir> <suffix> <q1> [q2 ...]
  *   suffix: "before" | "after" — appended to the query name.
  * Pass "ALL" as q1 to dump every SparkEntry query.
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val outDir = args(1); val suffix = args(2)
    val names =
      if (args(3) == "ALL") graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(3).toSeq
    val spark = graft.GraftSession.local(4, "dumpplan")
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      // queryExecution.explainString mirrors df.explain("formatted")
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      println(s"DUMPPLAN wrote $p (${txt.length} chars)")
    }
    spark.stop()
  }
}
