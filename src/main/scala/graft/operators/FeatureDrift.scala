package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group feature-drift audit by TOTAL VARIATION DISTANCE over
  * fixed-width value bins — the ingest-gate twin of q143's embedding
  * drift and q101's χ² source drift, chosen over PSI/KL because TVD is
  * a pure RATIONAL of exact counts (PSI's ln is the cross-engine
  * hazard BM25's idf fixture works around; TVD needs no fixture):
  *
  *   TVD(P, Q) = ½ Σ_b |p_b − q_b|
  *             = Σ_b |n_b·M − m_b·N| / (2·N·M)
  *
  * with n/m the per-bin counts and N/M the group totals — exact
  * integer arithmetic up to ONE final double division (round-9).
  *
  * Scale shape: two map-side-combined (group, bin) aggregates, one
  * (group, bin)-keyed full outer join (absent bins count 0 on the
  * other side), one group-keyed fold. Bin-count per group is bounded
  * by the value range / binWidth — metadata-sized; nothing corpus-
  * scale crosses the driver. The per-bin integer cross products stay
  * in BIGINT while N·M < 2⁶³ and sum in DECIMAL(30,0) (HugeInt on the
  * oracle side); the denominator is formed in doubles (exact while
  * N·M < 2⁵³ — the tested regime; a 100 TB deployment lifts both to
  * DECIMAL(38,0)).
  */
object FeatureDrift {

  /** Day-over-day drift timeline: TVD between each (group, day) value
    * distribution and the SAME group's previous day — the monitoring
    * series an ops dashboard plots (vs [[tvd]]'s one-shot batch-vs-
    * train audit). One (group, day, bin) histogram self-joins against
    * its day+1 shift (histograms are metadata-sized: groups × days ×
    * bins); boundary days without a previous day are dropped. Same
    * exact-integer arithmetic as [[tvd]]. `epochCol` must be integral
    * seconds; output (groupCols…, day, n_prev, n_cur, tvd).
    */
  def tvdTimeline(df: DataFrame, groupCols: Seq[String], epochCol: String,
                  valueCol: String, binWidth: Double): DataFrame = {
    require(groupCols.nonEmpty && binWidth > 0)
    val g = groupCols.map(col)
    // FLOOR division (not `div`'s truncate-toward-zero): pre-1970
    // epochs must land in the same day bucket as the streaming twin
    // (Math.floorDiv) and the DuckDB oracle (`//`, floor) — exact at
    // full long range via subtract-pmod, unlike floor(a/86400.0)
    // which loses exactness past 2^53 (round-15 advice fix).
    val hist = df
      .groupBy((g :+ expr(s"($epochCol - pmod($epochCol, 86400L)) div 86400L")
        .as("day") :+
        floor(col(valueCol) / lit(binWidth)).cast("long").as("__bin")): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // feeds both sides of the day-shift self-join
    val prev = hist.select((g :+ (col("day") + 1).as("day") :+
      col("__bin") :+ col("__c").as("__p")): _*)
    // NULL-SAFE join keys (<=>), not a USING join: a null group key or
    // null bin never equi-matches, so its rows would split into
    // (__c, 0) and (0, __p) pairs and the numerator telescopes to
    // 2·N·M — TVD = 1.0 exactly, a guaranteed false alarm for the null
    // bucket (round-18 review; DistributedRank.prefix documents the
    // same trap)
    val keys = groupCols :+ "day" :+ "__bin"
    val h = hist.as("h"); val p = prev.as("p")
    val joined = h.join(p,
        keys.map(k => col(s"h.$k") <=> col(s"p.$k")).reduce(_ && _),
        "full_outer")
      .select((keys.map(k => coalesce(col(s"h.$k"), col(s"p.$k")).as(k)) :+
        coalesce(col("h.__c"), lit(0L)).as("__c") :+
        coalesce(col("p.__p"), lit(0L)).as("__p")): _*)
    val totals = joined.groupBy((g :+ col("day")): _*)
      .agg(sum(col("__c")).as("n_cur"), sum(col("__p")).as("n_prev"))
    val tkeys = groupCols :+ "day"
    val j2 = joined.as("j"); val t2 = totals.as("t")
    j2.join(t2, tkeys.map(k => col(s"j.$k") <=> col(s"t.$k")).reduce(_ && _))
      .select((tkeys.map(k => col(s"j.$k").as(k)) :+ col("j.__bin") :+
        col("j.__c").as("__c") :+ col("j.__p").as("__p") :+
        col("t.n_cur").as("n_cur") :+ col("t.n_prev").as("n_prev")): _*)
      .filter(col("n_cur") > 0 && col("n_prev") > 0) // boundary days out
      .groupBy((g :+ col("day")): _*)
      .agg(first(col("n_prev")).as("n_prev"), first(col("n_cur")).as("n_cur"),
        sum(abs(col("__c") * col("n_prev") - col("__p") * col("n_cur"))
          .cast(DecimalType(30, 0))).as("__num"))
      .select((g :+ col("day") :+ col("n_prev") :+ col("n_cur") :+
        round(col("__num").cast("double") /
          (col("n_prev").cast("double") * col("n_cur").cast("double") * lit(2.0)),
          9).as("tvd")): _*)
  }

  /** (groupCols…, n_train, n_new, tvd) — one row per group present in
    * EITHER side (a group absent from one side has TVD 1 by
    * definition; the join keeps it with zero counts).
    */
  def tvd(train: DataFrame, batch: DataFrame, groupCols: Seq[String],
          valueCol: String, binWidth: Double): DataFrame = {
    require(groupCols.nonEmpty && binWidth > 0)
    val g = groupCols.map(col)
    def binned(df: DataFrame, cnt: String): DataFrame =
      df.groupBy((g :+ floor(col(valueCol) / lit(binWidth)).cast("long")
          .as("__bin")): _*)
        .agg(count(lit(1)).as(cnt))
    val t = binned(train, "__nt")
    val b = binned(batch, "__nb")
    // the joined bin table feeds BOTH the totals re-agg and the final
    // fold — checkpoint it (metadata-sized: groups × bins) so the two
    // consumers don't each re-scan the corpus through the agg subtrees.
    // NULL-SAFE keys (<=>), not a USING join — see tvdTimeline: a null
    // group/bin would otherwise telescope to a false TVD = 1.0.
    val keys = groupCols :+ "__bin"
    val joined = t.join(b,
        keys.map(k => t(k) <=> b(k)).reduce(_ && _), "full_outer")
      .select((keys.map(k => coalesce(t(k), b(k)).as(k)) :+
        coalesce(col("__nt"), lit(0L)).as("__nt") :+
        coalesce(col("__nb"), lit(0L)).as("__nb")): _*)
      .localCheckpoint()
    val totals = joined.groupBy(g: _*)
      .agg(sum(col("__nt")).as("n_train"), sum(col("__nb")).as("n_new"))
    val j2 = joined.as("j"); val t2 = totals.as("t")
    j2.join(t2,
        groupCols.map(k => col(s"j.$k") <=> col(s"t.$k")).reduce(_ && _))
      .select((groupCols.map(k => col(s"j.$k").as(k)) :+
        col("j.__bin") :+ col("j.__nt").as("__nt") :+
        col("j.__nb").as("__nb") :+ col("t.n_train").as("n_train") :+
        col("t.n_new").as("n_new")): _*)
      .groupBy(g: _*)
      .agg(first(col("n_train")).as("n_train"), first(col("n_new")).as("n_new"),
        sum(abs(col("__nb") * col("n_train") - col("__nt") * col("n_new"))
          .cast(DecimalType(30, 0))).as("__num"))
      .select((g :+ col("n_train") :+ col("n_new") :+
        // a group empty on one side has moved ALL its mass: TVD = 1
        // (also the ANSI div-by-zero guard — the playbook rule)
        when(col("n_train") === 0 || col("n_new") === 0, lit(1.0))
          .otherwise(round(col("__num").cast("double") /
            (col("n_train").cast("double") * col("n_new").cast("double") * lit(2.0)),
            9)).as("tvd")): _*)
  }
}
