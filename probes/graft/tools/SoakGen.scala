package graft.tools

import org.apache.spark.sql.functions._

/** Generator for the 10× soak corpus (the previously ad-hoc recipe
  * behind PLANS.md's soak tables, now reproducible): 10 copies of the
  * sf0.1 `documents` and `events` tables.
  *
  *  - documents: copy c shifts doc_id by c·10⁵ and inserts a
  *    copy-AND-position-specific token every 3 words (copies are NOT
  *    near-dups of each other — without this every doc becomes a
  *    10-clique in any near-dup query and the pair graph stops
  *    resembling a real corpus; it also grows tokens/doc ~1.33× for
  *    9 of 10 copies, so shingle volume is ~13×). The POSITION part
  *    matters for multiset-vote sketches (SimHash): a single repeated
  *    filler token would dominate every copy's vote vector and
  *    correlate signatures ACROSS unrelated docs — measured as a
  *    225M-pair explosion in q78 before the fix; distinct fillers
  *    keep unrelated docs far apart in Hamming space.
  *  - events: copy c shifts event_id by c·10⁹ and user_id by c·10⁶ —
  *    horizontal user growth over the same time range, the shape a
  *    10× traffic step actually has.
  *
  * Usage: runMain graft.tools.SoakGen [srcSfDir] [outDir]
  */
object SoakGen {

  /** Soak-corpus construction constants — FreshIdContractSpec derives
    * the soak doc_id ceiling from THESE (maxBase + (Copies−1)·DocIdStep),
    * so growing the soak can never silently re-breach the fresh-id
    * band the way the round-17 ADVICE found (the +900000 copy band
    * sat inside the old [900000, 990000] offsets).
    */
  val Copies = 10
  val DocIdStep = 100000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("/tmp/sf1soak")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "soak-gen")
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, src)

    val docs = t.documents
    val copies = (0 until Copies).map { c =>
      if (c == 0) docs
      else docs.select(
        (col("doc_id") + c * DocIdStep).as("doc_id"),
        // splice "copyN" after every 3rd token
        array_join(flatten(transform(
          graft.llm.TextOps.tokens(col("text")),
          (tok, i) => when(pmod(i, lit(3)) === 2,
              array(tok, concat(lit(s"c${c}w"), i.cast("string"))))
            .otherwise(array(tok)))), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    copies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val ev = t.events
    (0 until 10).map { c =>
      if (c == 0) ev
      else ev.select(
        (col("event_id") + c * 1000000000L).as("event_id"), col("ts"),
        (col("user_id") + c * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // embeddings: copy c shifts vec_id by c·10⁶ and rotates each
    // vector's coordinates by c positions (same norm/statistics
    // family, but copies are NOT near-identical vectors — a plain
    // duplicate would make every ANN/semantic query's neighbor
    // structure degenerate 10-cliques, like the document filler
    // lesson above)
    val em = t.embeddings
    (0 until 10).map { c =>
      if (c == 0) em
      else em.select(
        (col("vec_id") + c * 1000000L).as("vec_id"),
        concat(slice(col("embedding"), c + 1, graft.Tables.EmbeddingDim - c),
          slice(col("embedding"), 1, c)).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // lineitem: copy c shifts all three keys, so the derived
    // supplier↔part graph (q104) grows to 10 DISJOINT copies — 10×
    // nodes and 10× edges, the "more domains" horizontal shape (a
    // same-key copy would only densify toward the complete bipartite
    // graph and saturate the distinct edge set).
    val li = t.lineitem
    (0 until 10).map { c =>
      if (c == 0) li
      else li.select(
        (col("l_orderkey") + c * 100000000L).as("l_orderkey"),
        (col("l_partkey") + c * 1000000L).as("l_partkey"),
        (col("l_suppkey") + c * 100000L).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // supplier: copied verbatim (dim tables don't grow 10× with the
    // fact; q108's seed set stays the copy-0 suppliers, so PPR mass
    // localizes in the original component — the seeded semantics)
    t.supplier.write.mode("overwrite").parquet(s"$out/supplier.parquet")

    // orders: copy c shifts o_orderkey by the SAME c·10⁸ lineitem
    // uses for l_orderkey, so lineitem→orders referential integrity
    // holds on the soak corpus (q130's audit must stay clean except
    // its planted orphans); o_custkey is NOT shifted — 10× orders
    // over the same customer dim, the shape traffic growth has.
    val od = t.orders
    (0 until 10).map { c =>
      if (c == 0) od
      else od.withColumn("o_orderkey", col("o_orderkey") + c * 100000000L)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // customer/part: verbatim dims. Note lineitem copies 1-9 shift
    // l_partkey OFF the part dim, so q130's lineitem→part probe sees
    // an orphan-heavy fact at 10× — the audit's worst case (every
    // orphan row survives the anti join), a deliberately harder soak
    // than the clean path; orders↔customer and lineitem↔orders stay
    // referentially intact by the matching key shifts.
    t.customer.write.mode("overwrite").parquet(s"$out/customer.parquet")
    t.part.write.mode("overwrite").parquet(s"$out/part.parquet")

    println(s"SOAKGEN wrote 10x documents+events+embeddings+lineitem+orders " +
      s"(+supplier/customer/part dims) from $src to $out")
    spark.stop()
  }
}
