package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Regression gate for the one contract the engine does NOT control:
  * the driver-generated corpus. Round 8 lost 14/75 queries, the whole
  * bench, and 10 tests to a silent physical-encoding change in ONE
  * column (events.ts TIMESTAMP(NANOS) → timestamp[us]); this spec makes
  * the next corpus mutation a one-line named failure here instead.
  *
  * Asserts the POST-catalog schema — what every query consumes — for
  * every table at every SF present on disk. Types that Tables adapts
  * (events.ts) are pinned to the adapted type; everything else is
  * pinned to what the corpus has always shipped (TESTDATA.md).
  */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, "catalog-spec")

  private val sfDirs: Seq[String] = {
    val root = new java.io.File("/root/testdata")
    Option(root.listFiles).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .map(_.getAbsolutePath).sorted
  }

  // post-catalog contract: table -> (column -> type). Timestamp-bearing
  // corpus columns outside `events` arrive as NTZ (timestamp[us],
  // isAdjustedToUTC=false) and the session is pinned UTC, so queries
  // and the DuckDB oracle agree on their formatting; events.ts is
  // the one Tables adapts to TimestampType for the streaming surface
  // (watermarks need an instant, not a wall-clock).
  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  private def tableOf(t: Tables, name: String) = name match {
    case "events" => t.events
    case other    => t.table(other)
  }

  test("at least one SF directory is present") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* directories found")
  }

  for (dir <- sfDirs; (name, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"${new java.io.File(dir).getName}/$name post-catalog schema") {
      val df = tableOf(Tables(spark, dir), name)
      val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
      assert(actual.keySet == cols.keySet,
        s"$name columns drifted: corpus has ${actual.keySet.toSeq.sorted}, " +
          s"catalog contract expects ${cols.keySet.toSeq.sorted} — " +
          "the driver corpus changed shape; update Tables + this contract together")
      for ((c, dt) <- cols)
        assert(actual(c) == dt,
          s"$name.$c is ${actual(c)}, contract says $dt — physical encoding " +
            "drifted (round-8 class defect); adapt in Tables, not in queries")
    }
  }

  test("corpus minimum-cardinality contract at every SF") {
    // The ANN oracle queries pin their quantizer/codebook constructions
    // to the low id range (q21/q76: vec_id < 10/16 probes+centroids;
    // q47/q77: the vec_id < 64 lossless corpus) — if a regenerated
    // corpus ever ships without those ids, fail HERE with a named
    // assert, not as 6 dead ANN queries.
    import org.apache.spark.sql.functions.col
    for (dir <- sfDirs) {
      val t = Tables(spark, dir)
      val nLow = t.embeddings.filter(col("vec_id") < 64).count()
      assert(nLow == 64L,
        s"$dir: embeddings must contain exactly the ids 0..63 in vec_id < 64 " +
          s"(got $nLow rows) — the pinned ANN constructions (q47/q76/q77) " +
          "assume this id range")
      assert(t.documents.limit(1).count() == 1L, s"$dir: documents is empty")
      assert(t.events.limit(1).count() == 1L, s"$dir: events is empty")
    }
  }

  test("embeddings.embedding width matches Tables.EmbeddingDim at every SF") {
    import org.apache.spark.sql.functions.{size => asize, col, countDistinct}
    for (dir <- sfDirs) {
      val widths = Tables(spark, dir).embeddings
        .select(asize(col("embedding")).as("w"))
        .agg(countDistinct(col("w")).as("n"), org.apache.spark.sql.functions.max(col("w")).as("w"))
        .head()
      assert(widths.getLong(0) == 1L && widths.getInt(1) == Tables.EmbeddingDim,
        s"$dir: embedding width contract broken (distinct=${widths.getLong(0)}, " +
          s"max=${widths.getInt(1)}, expected uniform ${Tables.EmbeddingDim})")
    }
  }
}
