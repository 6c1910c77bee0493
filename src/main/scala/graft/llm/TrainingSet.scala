package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-set assembly — the ONE CALL a pipeline user
  * actually wants, composing the audited stage operators in their
  * canonical order:
  *
  *   1. near-dup clean      (`CorpusDedup.clean`: exact → LSH bands →
  *                           connected components — q40's pipeline)
  *   2. decontaminate       (13-gram overlap vs a held-out benchmark,
  *                           q41's rule — overlapping docs DROP)
  *   3. quality gate        (`TextOps.qualityScore` ≥ minQuality, q22)
  *   4. leakage-safe split  (exact-dup-group integer rank cuts per
  *                           language — q105's 80/10/10 rule)
  *   5. token-budget admit  (train split only: per-language cumulative
  *                           token cut in md5 order — q98's rule;
  *                           boundary doc admitted)
  *   6. privacy release     (optional: `KAnonymity.enforce` over the
  *                           admitted set's metadata columns — numeric
  *                           widths then categorical star rungs; the
  *                           release gate a shared training-set export
  *                           passes through before leaving the
  *                           pipeline)
  *
  * Every stage is deterministic on any partitioning (hash orders,
  * exact integer cuts, exact counts), so the assembled set is
  * rerun-stable across cluster sizes — TrainingSetSpec pins output
  * equality under different input partitionings, plus each stage's
  * postcondition on the real corpus.
  *
  * Scale: the composition inherits its stages' audited shapes — no
  * stage added here introduces a shuffle beyond what the stage
  * operators already carry; the budget window moves (id, lang, hash,
  * token-count) rows only, never text.
  */
object TrainingSet {

  /** Stage-6 release spec: `KAnonymity.enforce` parameters applied to
    * the admitted set's metadata columns (`quasiCols` must include only
    * output columns of [[build]]; `valueCol` is typically n_tokens).
    */
  case class Release(quasiCols: Seq[String], valueCol: String,
                     widths: Seq[Long], k: Long,
                     starLadder: Seq[String] = Nil)

  /** Returns `(idCol, langCol, split, n_tokens, admitted)` — one row
    * per surviving document. `admitted` is true for every val/test row
    * and for train rows inside their language's token budget.
    * With `release` set, the output is instead the k-anonymous RELEASE
    * of the admitted rows' metadata: `(idCol, quasi columns possibly
    * starred, valueCol, bucket_lo, bucket_width)` — sub-k cells
    * generalize down the ladder and the irreducible tail is suppressed
    * (dropped), so the exported table is safe to share by
    * construction.
    *
    * `precleanedIds`: optional kept-id table replacing stage 1's
    * MinHash-LSH run — for callers that amortize the clean across
    * repeated builds of the SAME corpus (the q97 PCA-fixture pattern;
    * clean is deterministic, so a persisted id set from an earlier run
    * of this process is always valid). MUST be exactly
    * `CorpusDedup.clean(docs, …same params…).select(idCol)`; semantics
    * are caller-guaranteed, and q121's oracle still recomputes the
    * stage from raw text, so a stale cache fails the driver check
    * loudly rather than silently.
    */
  def build(docs: DataFrame, heldout: DataFrame,
            idCol: String, textCol: String, langCol: String,
            minQuality: Double,
            budgets: Map[String, Long], defaultBudget: Long,
            threshold: Double = 0.8,
            shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
            decontaminateN: Int = 13,
            precleanedIds: Option[DataFrame] = None,
            release: Option[Release] = None): DataFrame = {
    require(defaultBudget > 0 && budgets.values.forall(_ > 0),
      "TrainingSet.build: token budgets must be positive")
    // 1. near-dup clean (or the caller's amortized id set)
    val cleaned = precleanedIds match {
      case Some(ids) => docs.join(ids.select(col(idCol)), Seq(idCol), "left_semi")
      case None => CorpusDedup.clean(docs, idCol, textCol, threshold,
        shingleN, numHashes, bands)
    }
    // 2. decontaminate: any shared benchmark n-gram drops the doc
    val contaminated = CorpusDedup
      .decontaminate(cleaned, heldout, idCol, textCol, n = decontaminateN)
      .select(col(idCol))
    val decont = cleaned.join(contaminated, Seq(idCol), "left_anti")
    // 3. quality gate
    val gated = decont.filter(TextOps.qualityScore(col(textCol)) >= minQuality)
    // 4. leakage-safe split (group = exact content; post-clean these are
    // singletons, but the rule stays group-keyed so a caller skipping
    // stage 1 still cannot leak identical docs across the boundary)
    // both rank passes below run on DistributedRank.prefix — a
    // language-keyed window would funnel each language's corpus
    // through one sort task at scale (round-12 q128 flag; same fix)
    // One skinny metadata projection feeds BOTH rank passes, computed
    // once (localCheckpoint): group hash and token count are the text
    // column's only downstream uses, so projecting text away here (a)
    // stops the stage-1..3 subtree (clean semi-join, gram
    // decontaminate, quality gate) being evaluated twice — once under
    // the split-assignment aggregate and once under the join back —
    // and (b) keeps document text out of the stage-4/5 range shuffles
    // and their checkpoints (guide §2.3: project before the exchange;
    // this is what the scale note above always promised).
    val grouped = gated.select(col(idCol), col(langCol),
        md5(col(textCol)).as("__grp"),
        TextOps.tokenCount(col(textCol)).as("__tok"))
      .localCheckpoint()
    val assigned = graft.operators.DistributedRank.prefix(
        grouped.groupBy(col("__grp")).agg(min(col(langCol)).as("__rl")),
        Seq("__rl"), Seq("__grp"))
      .select(col("__grp"),
        when(col("__rank") * 10 <= col("__n") * 8, "train")
          .when(col("__rank") * 10 <= col("__n") * 9, "val")
          .otherwise("test").as("split"))
    val split = grouped.join(assigned, Seq("__grp"))
    // 5. per-language token budget on the train split: admit while the
    // tokens admitted BEFORE this doc stay under budget (q98 straddle
    // semantics — the boundary doc is admitted); non-train rows ride
    // along with a zero summand, exactly the old conditional sum
    val budgetCol: Column = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (l, b)) => when(col(langCol) === l, lit(b)).otherwise(acc)
    }
    val assembled = graft.operators.DistributedRank.prefix(
        split.withColumn("__tok_tr",
          when(col("split") === "train", col("__tok").cast("long")).otherwise(0L)),
        Seq(langCol), Seq("__grp", idCol), Seq("__tok_tr"))
      .withColumn("admitted",
        col("split") =!= "train" ||
          (col("__cum___tok_tr") - col("__tok_tr")) < budgetCol)
      .select(col(idCol), col(langCol), col("split"),
        col("__tok").cast("long").as("n_tokens"), col("admitted"))
    // 6. optional privacy release: the admitted set's metadata passes
    // the k-anonymity gate before leaving the pipeline — numeric
    // bucket widths, then categorical star rungs; the irreducible
    // sub-k tail is suppressed (q132's ladder as a composed stage)
    release match {
      case None => assembled
      case Some(r) =>
        graft.operators.KAnonymity.enforce(
          assembled.filter(col("admitted")).drop("admitted"),
          r.quasiCols, r.valueCol, r.widths, r.k, starLadder = r.starLadder)
    }
  }
}
