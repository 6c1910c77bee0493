package graft.tools

/** Inventory of every logical Window node across SparkEntry queries:
  * query name, partition-key attribute names, and whether the window's
  * child subtree contains an Aggregate (a cardinality reducer).
  * Diagnostic input for PlanShapeSpec's low-cardinality-window net.
  */
object ProbeWindows {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(4, "probe-windows")
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.optimizedPlan
        plan.foreach {
          case w: LWindow =>
            val keys = w.partitionSpec.flatMap(_.references.map(_.name)).distinct
            val hasAgg = w.child.collectFirst { case a: Aggregate => a }.nonEmpty
            val aggKeys = w.child.collectFirst { case a: Aggregate =>
              a.groupingExpressions.flatMap(_.references.map(_.name)).distinct }
            println(s"WIN $name keys=${keys.mkString(",")} childAgg=$hasAgg " +
              s"aggKeys=${aggKeys.map(_.mkString(",")).getOrElse("-")}")
          case _ =>
        }
      } catch { case e: Throwable => println(s"ERR $name ${e.getMessage.take(100)}") }
    }
    spark.stop()
  }
}
