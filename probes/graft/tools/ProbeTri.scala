package graft.tools

import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q123 triangle pipeline at soak scale
  * — diagnostic main, not part of the driver contract.
  */
object ProbeTri {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val spark = graft.GraftSession.local(32, "probe-tri")
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, dir)
    val edges = t.lineitem.select(
      expr("cast(conv(substring(md5(cast(l_orderkey as string)), 1, 6), 16, 10) as bigint) % 30000").as("src"),
      expr("cast(conv(substring(md5(cast(l_partkey as string)), 1, 6), 16, 10) as bigint) % 30000").as("dst"))
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ce = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    println("PROBE ce rows " + ce.count())
    val deg = ce.select(col("a").as("node")).unionAll(ce.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val oriented = ce
      .join(deg.select(col("node").as("a"), col("deg").as("__da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("__db")), Seq("b"))
      .select(
        when(col("__da") < col("__db") || (col("__da") === col("__db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"),
        when(col("__da") < col("__db") || (col("__da") === col("__db") && col("a") < col("b")),
          struct(col("__da").as("du"), col("__db").as("dv")))
          .otherwise(struct(col("__db").as("du"), col("__da").as("dv"))).as("d"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("d.du").as("du"), col("d.dv").as("dv"))
      .localCheckpoint()
    time("orient")(oriented.count())
    println("PROBE maxoutdeg " + oriented.groupBy("u").count().agg(max("count")).first())
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.u") === col("e2.u") &&
        (col("e1.dv") < col("e2.dv") ||
          (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .select(col("e1.u").as("t_u"), col("e1.v").as("t_v"), col("e2.v").as("t_w"))
    time("wedges")(println("PROBE wedge rows " + wedges.count()))
    val tris = wedges.join(oriented.select(col("u").as("t_v"), col("v").as("t_w")),
      Seq("t_v", "t_w"), "left_semi")
    time("close")(println("PROBE tri rows " + tris.count()))
    spark.stop()
  }
}
