package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance self-join by PIGEONHOLE SEGMENT BLOCKING (the
  * PassJoin idea): find all pairs with levenshtein ≤ k over a
  * fixed-length string column without the cartesian pair space.
  *
  * Completeness is a theorem, not tuning (the q78/q85 discipline
  * applied to edit distance): split one side's string into k+1
  * contiguous segments — at most k of them are touched by ≤ k edits,
  * so at least one survives UNCHANGED in the other string; for
  * equal-length strings its position shifts by at most k. Candidates
  * are therefore an EQUI-join on (segment index, segment text)
  * between each string's k+1 own segments and each string's
  * (k+1)·(2k+1) window substrings — O(k²) skinny rows per string,
  * never |R|² — then an exact `levenshtein` verify on the candidates.
  *
  * HOT-SEGMENT ESCALATION (the rarest-first analog of q85, round-11
  * verdict item): a segment key shared by many strings — e.g. a
  * common prefix — makes its equi-join group QUADRATIC. Keys whose
  * global own-side frequency exceeds `hotThreshold` are re-blocked by
  * a SECOND pigeonhole over the COMPLEMENT: for the witness alignment
  * that leaves segment i unchanged (own copy at [st, st+ln), window
  * copy at shift d), the remaining alignment splits around the
  * segment, so lev(C_a, C_b(d)) ≤ k where C_x is the string with the
  * matched region excised (both length len − ln). The complement is a
  * fixed-length string again → apply the SAME k+1-segment/±k-window
  * blocking to it, and hot-key candidates become an equi-join on
  * (i, seg, sub-index, sub-seg) — linear rows per string (the window
  * side enumerates its 2k+1 shifts times the sub-windows), quadratic
  * only in per-(key, sub-key) occupancy. Cold keys join exactly as
  * before; a hot key whose complement is too short to split
  * (len − ln ≤ k) stays on the cold path. Completeness: a qualifying
  * pair's witness key is either cold (caught by the primary join) or
  * hot, in which case the complement pigeonhole guarantees an
  * unchanged sub-segment within shift ±k of the TRUE witness shift d
  * — one of the enumerated window rows (EditDistanceJoinSpec pins
  * spec ≡ brute force on a shared-prefix corpus with the hot path
  * forced, and pins the candidate-count drop).
  *
  * Scale: one extra map-side-combined (i, seg) count feeds a
  * broadcast hot-key table (hot keys are few by definition); the
  * verify runs only on candidates. Both `levenshtein` and all
  * blocking keys are engine-recomputable, so the result set is
  * exactly SQL-checkable. The hot-key table is deliberately kept
  * persisted for the RESULT'S lifetime (not unpersisted before
  * return): the returned plan references it from both the cold
  * anti-join and every hot frame, an early unpersist would re-run
  * the global frequency count on each consumption, and the cache is
  * threshold-bounded metadata (≤ |R|/hotThreshold skinny rows) that
  * Spark evicts LRU if memory is ever tight. Only the no-hot-keys
  * early return unpersists, because there the cache provably has no
  * consumer.
  *
  * Contract: every string in `strCol` has exactly `len` characters
  * (pad/truncate upstream — the fixed length is what bounds the
  * position window); `k ≥ 1`; output is one row per unordered pair
  * `(id_a < id_b)` with the exact distance.
  */
object EditDistanceJoin {

  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               k: Int, len: Int, hotThreshold: Long = 4096L): DataFrame =
    candidates(df, idCol, strCol, k, len, hotThreshold)
      .distinct() // a pair can match on several segments / shifts
      .withColumn("distance", levenshtein(col("s_a"), col("s_b")))
      .filter(col("distance") <= k)
      .select(col("id_a"), col("id_b"), col("distance"))

  /** Candidate pair rows (id_a, id_b, s_a, s_b), pre-distinct — the
    * spec's skew instrument.
    */
  private[graft] def candidates(df: DataFrame, idCol: String, strCol: String,
                                k: Int, len: Int, hotThreshold: Long): DataFrame = {
    require(k >= 1, "EditDistanceJoin.selfJoin: k must be >= 1")
    require(len > k, s"EditDistanceJoin.selfJoin: len=$len must exceed k=$k")
    require(hotThreshold >= 1, "EditDistanceJoin.selfJoin: hotThreshold must be >= 1")
    // enforce the fixed-length contract loudly, inside the scan — with
    // an explicit isNull arm (the IntervalJoin device): length(null)
    // =!= len is NULL, which falls to `otherwise` and would silently
    // drop the row through null segment keys instead of failing
    // (round-18 review)
    val checked = df.select(col(idCol).as("__id"),
      when(col(strCol).isNull, raise_error(
        lit(s"EditDistanceJoin: null string (fixed-length $len contract)")))
        .when(length(col(strCol)) =!= len, raise_error(concat(
          lit(s"EditDistanceJoin: string not of length $len: "), col(strCol))))
        .otherwise(col(strCol)).as("__s"))
      // one scan serves every segment/window branch (r18): the union-
      // of-selects form below used to re-read the input once per
      // segment (k+1 own + ~(k+1)(2k+1) window branches ≈ 16 scans at
      // k=2), and the hot-key probe re-read it again
      .localCheckpoint()
    val bounds = (0 to k + 1).map(i => i * len / (k + 1))
    val segs = (0 to k).map(i => (i, bounds(i), bounds(i + 1) - bounds(i)))
    // each string's own k+1 segments — one explode over the literal
    // segment array instead of a k+1-way union of scans (same rows)
    val own = checked.select(col("__id").as("id_a"), col("__s").as("s_a"),
        explode(array(segs.map { case (i, st, ln) =>
          struct(lit(i).as("__i"), substring(col("__s"), st + 1, ln).as("__seg"))
        }: _*)).as("__e"))
      .select(col("id_a"), col("s_a"),
        col("__e.__i").as("__i"), col("__e.__seg").as("__seg"))
    // each string's window substrings: segment i may land shifted ±k
    val winSpecs = segs.flatMap { case (i, st, ln) =>
      (-k to k).map(d => (i, st, ln, d))
        .filter { case (_, s0, l, d) => s0 + d >= 0 && s0 + d + l <= len }
    }
    val windows = checked.select(col("__id").as("id_b"), col("__s").as("s_b"),
        explode(array(winSpecs.map { case (i, st, ln, d) =>
          struct(lit(i).as("__i"),
            substring(col("__s"), st + d + 1, ln).as("__seg"))
        }: _*)).as("__e"))
      .select(col("id_b"), col("s_b"),
        col("__e.__i").as("__i"), col("__e.__seg").as("__seg"))
    val pairCols = Seq(col("id_a"), col("id_b"), col("s_a"), col("s_b"))
    val primary = own.join(windows, Seq("__i", "__seg"))
      .filter(col("id_a") < col("id_b"))
      .select(pairCols: _*)
    if (hotThreshold == Long.MaxValue) return primary

    // hot-key split: own-side global frequency per (i, seg) — tiny,
    // broadcast. Segments whose complement cannot host k+1 sub-
    // segments stay cold regardless of frequency. The existence probe
    // is ONE map-side-combined agg (skinny (i, seg) rows); when no key
    // is hot — the common case — the plan is exactly the primary join,
    // none of the refinement frames are ever built (they cost plan
    // size and per-run planning time even when empty at runtime).
    val refinable = segs.filter { case (_, _, ln) => len - ln > k }.map(_._1).toSet
    val hotKeys = own.groupBy(col("__i"), col("__seg"))
      .agg(count(lit(1)).as("__f"))
      .filter(col("__f") > hotThreshold && col("__i").isInCollection(
        if (refinable.isEmpty) Seq(-1) else refinable.toSeq))
      .select(col("__i"), col("__seg"))
      .persist()
    if (hotKeys.limit(1).count() == 0L) { hotKeys.unpersist(); return primary }
    val cold = own.join(broadcast(hotKeys), Seq("__i", "__seg"), "left_anti")
      .join(windows, Seq("__i", "__seg"))
      .filter(col("id_a") < col("id_b"))
      .select(pairCols: _*)

    // complement excision: the string minus [from, from+ln)
    def excise(s: Column, from: Int, ln: Int): Column =
      concat(substring(s, 1, from), substring(s, from + ln + 1, len - from - ln))

    // hot path per segment i: secondary pigeonhole over the complement
    val hot = segs.filter(s => refinable.contains(s._1)).map { case (i, st, ln) =>
      val len2 = len - ln
      val sb = (0 to k + 1).map(j => j * len2 / (k + 1))
      val subs = (0 to k).map(j => (j, sb(j), sb(j + 1) - sb(j)))
      val ownHot = checked
        .select(col("__id").as("id_a"), col("__s").as("s_a"),
          lit(i).as("__i"), substring(col("__s"), st + 1, ln).as("__seg"))
        .join(broadcast(hotKeys), Seq("__i", "__seg"), "left_semi")
      val ownSub = subs.map { case (j, sst, sln) =>
        ownHot.withColumn("__j", lit(j))
          .withColumn("__sub", substring(excise(col("s_a"), st, ln), sst + 1, sln))
      }.reduce(_ union _)
      val dShifts = (-k to k).filter(d => st + d >= 0 && st + d + ln <= len)
      val winHot = dShifts.map { d =>
        checked.select(col("__id").as("id_b"), col("__s").as("s_b"),
          lit(i).as("__i"), substring(col("__s"), st + d + 1, ln).as("__seg"),
          lit(d).as("__d"))
      }.reduce(_ union _)
        .join(broadcast(hotKeys), Seq("__i", "__seg"), "left_semi")
      // window sub rows over the d-dependent complement: the matched
      // region starts at st + d, so C_b(d) = b[0, st+d) ++ b[st+d+ln, len)
      val winSubFrames = subs.flatMap { case (j, sst, sln) =>
        (-k to k).map(e => (j, sst + e, sln))
          .filter { case (_, p, l) => p >= 0 && p + l <= len2 }
      }
      val winSide = winSubFrames.map { case (j, p, sln) =>
        winHot.select(col("id_b"), col("s_b"), col("__i"), col("__seg"),
          lit(j).as("__j"),
          expr(s"substring(concat(substring(s_b, 1, $st + __d), " +
            s"substring(s_b, ${st + ln + 1} + __d, ${len - st - ln} - __d)), " +
            s"${p + 1}, $sln)").as("__sub"))
      }.reduce(_ union _)
      ownSub.select(col("id_a"), col("s_a"), col("__i"), col("__seg"),
          col("__j"), col("__sub"))
        .join(winSide, Seq("__i", "__seg", "__j", "__sub"))
        .filter(col("id_a") < col("id_b"))
        .select(pairCols: _*)
    }
    (Seq(cold) ++ hot).reduce(_ unionByName _)
  }
}
