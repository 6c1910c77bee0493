package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Scale: the candidate join is keyed on segment text (hot segments —
  * e.g. a common prefix — are data skew, AQE's case; a rarest-first
  * order like q85's would be the next escalation). The verify runs
  * only on candidates. Both `levenshtein` and the blocking are
  * engine-recomputable, so the result set is exactly SQL-checkable.
  *
  * Contract: every string in `strCol` has exactly `len` characters
  * (pad/truncate upstream — the fixed length is what bounds the
  * position window); `k ≥ 1`; output is one row per unordered pair
  * `(id_a < id_b)` with the exact distance.
  */
object EditDistanceJoin {

  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               k: Int, len: Int): DataFrame = {
    require(k >= 1, "EditDistanceJoin.selfJoin: k must be >= 1")
    require(len > k, s"EditDistanceJoin.selfJoin: len=$len must exceed k=$k")
    // enforce the fixed-length contract loudly, inside the scan
    val checked = df.select(col(idCol).as("__id"),
      when(length(col(strCol)) =!= len, raise_error(concat(
        lit(s"EditDistanceJoin: string not of length $len: "), col(strCol))))
        .otherwise(col(strCol)).as("__s"))
    val bounds = (0 to k + 1).map(i => i * len / (k + 1))
    val segs = (0 to k).map(i => (i, bounds(i), bounds(i + 1) - bounds(i)))
    // each string's own k+1 segments
    val own = segs.map { case (i, st, ln) =>
      checked.select(col("__id").as("id_a"), col("__s").as("s_a"),
        lit(i).as("__i"), substring(col("__s"), st + 1, ln).as("__seg"))
    }.reduce(_ union _)
    // each string's window substrings: segment i may land shifted ±k
    val windows = segs.flatMap { case (i, st, ln) =>
      (-k to k).map(d => (i, st + d, ln))
        .filter { case (_, p, l) => p >= 0 && p + l <= len }
    }.map { case (i, p, ln) =>
      checked.select(col("__id").as("id_b"), col("__s").as("s_b"),
        lit(i).as("__i"), substring(col("__s"), p + 1, ln).as("__seg"))
    }.reduce(_ union _)
    own.join(windows, Seq("__i", "__seg"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"))
      .distinct() // a pair can match on several segments
      .withColumn("distance", levenshtein(col("s_a"), col("s_b")))
      .filter(col("distance") <= k)
      .select(col("id_a"), col("id_b"), col("distance"))
  }
}
