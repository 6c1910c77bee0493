package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain

/** Inner equi-join with a map-side Bloom pre-filter on the big side.
  *
  * The result is EXACT — identical to `big.join(small, keys)` — because
  * a Bloom filter has no false negatives and its false positives are
  * removed by the real join that follows. What changes is the physical
  * shape: rows of `big` that cannot match are dropped INSIDE the
  * codegen'd scan stage, before the shuffle, so at 100 TB the exchange
  * carries ~selectivity × |big| rows instead of all of them.
  *
  * Relation to Spark's built-in runtime filters
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`): the optimizer
  * injects the same idea only when its creation-side thresholds and
  * selective-predicate heuristics fire, and never across pre-computed
  * or cached build sides. This operator is the deterministic, manual
  * form for when the planner can't see the selectivity (arbitrary
  * subquery builds, out-of-band key sets).
  *
  * The filter is built over `xxhash64(keys)` — type-agnostic over any
  * key tuple — and ships to executors inside the probe expression
  * (one copy per executor, like a broadcast variable). Memory is
  * O(expectedItems · log(1/fpp)) bits, independent of row width: keys
  * too numerous to broadcast as an exact set often still fit as bloom
  * bits (~1.2 MB per million keys at 1% fpp).
  */
object BloomJoin {

  /** @param expectedItems capacity hint for the filter; pass the
    *   (approximate) distinct key count of `small` if known, or leave
    *   0 to spend one count job on it. Undersizing only raises the
    *   false-positive rate — correctness is unaffected.
    */
  def inner(big: DataFrame, small: DataFrame, keys: Seq[String],
            expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    require(keys.nonEmpty, "bloom join needs at least one key column")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    def keyHash = xxhash64(keys.map(col): _*)
    val n = if (expectedItems > 0) expectedItems else small.count()
    // An empty build side would make stat.bloomFilter return a null
    // buffer (its aggregate has nothing to merge); the inner join is
    // empty regardless, so skip the filter. The capacity hint doesn't
    // prove non-emptiness, so that path pays one cheap limit-1 job.
    val emptyBuild = if (expectedItems > 0) small.isEmpty else n == 0
    if (emptyBuild) return big.join(small, keys)
    val bf = small.select(keyHash.as("__kh"))
      .stat.bloomFilter("__kh", n, fpp)
    big.filter(BloomMightContain(keyHash, bf)).join(small, keys)
  }
}
