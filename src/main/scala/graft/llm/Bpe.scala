package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic BPE tokenizer over a PINNED merge table — model-token
  * counts for the budget/packing/mixing family (q98/q46/q67 count
  * whitespace tokens; training budgets are billed in model tokens, and
  * on real corpora the two diverge by integer factors).
  *
  * The encoding is exact textbook BPE made cross-engine recomputable
  * with nothing but string `replace`:
  *
  *   - a word becomes the delimited symbol string `|c||h||a||r|…` —
  *     every symbol carries its OWN `|…|` wrapper, so a merge is the
  *     literal replacement `|a||b|` → `|ab|` and matches can never
  *     span a symbol boundary or share a separator with the next
  *     occurrence (the classic shared-space pitfall of ` a b ` →
  *     ` ab ` encodings);
  *   - words join with `#` (never merged across — the BPE word
  *     boundary), texts containing a delimiter fail loudly;
  *   - merges apply in rank order, each pass = one `replace` call
  *     (SQL-standard left-to-right non-overlapping scan, identical in
  *     Spark and DuckDB). Because the table is CONSISTENT (each
  *     operand is a base char or the output of an earlier merge), a
  *     merge can only ever create pairs of HIGHER rank, so one
  *     ascending pass per rank is exactly the greedy
  *     lowest-rank-first algorithm — BpeSpec pins equality against an
  *     independent one-merge-at-a-time greedy reference;
  *   - token count = half the delimiter count — one more `replace`.
  *
  * Everything is builtin string expressions (regexp_replace + chained
  * replace) — whole-stage codegen, no UDF; the merge table is the
  * single source of truth for BOTH the Spark chain and the DuckDB
  * oracle fragment (`sqlTokenCount`), so the oracle recomputes the
  * greedy merges from raw text, not from a Spark export. At 100 TB
  * the count is a per-row projection inside the scan — no shuffle, no
  * state; the merge table ships inside the expression tree (a real
  * vocab's ~50k merges would move to a codegen'd expression over a
  * broadcast table, same contract).
  */
object Bpe {

  /** Rank-ordered merges (left symbol, right symbol) — output is the
    * concatenation. CONSISTENT by construction: operands are single
    * chars or outputs of strictly earlier ranks (verified at load).
    */
  val Merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "e" -> "r", "i" -> "n", "a" -> "n",
    "o" -> "r", "s" -> "t", "a" -> "r", "l" -> "e", "o" -> "w",
    "a" -> "t", "e" -> "y", "u" -> "e", "a" -> "l", "in" -> "e",
    "t" -> "a", "ta" -> "b", "tab" -> "le", "c" -> "an", "s" -> "can",
    "or" -> "t", "s" -> "ort", "r" -> "e", "a" -> "m")

  // consistency check: every operand is a char or an earlier output —
  // the property that makes rank-ascending passes ≡ greedy BPE
  locally {
    val outputs = scala.collection.mutable.Set.empty[String]
    Merges.foreach { case (a, b) =>
      Seq(a, b).foreach(s => require(s.length == 1 || outputs.contains(s),
        s"Bpe.Merges inconsistent: operand '$s' is neither a char nor an earlier output"))
      outputs += a + b
    }
  }

  /** The delimited symbol string after all merges. Reserved delimiter
    * chars in the input fail loudly (the corpus contract; a production
    * vocab would escape instead).
    */
  def symbols(text: Column): Column = {
    val guarded = when(text.rlike("[|#]"),
      raise_error(concat(lit("Bpe: text contains reserved delimiter | or #: "), text)))
      .otherwise(text)
    val init = regexp_replace(concat_ws("#", TextOps.tokens(guarded)), "([^#])", "|$1|")
    Merges.foldLeft(init) { case (s, (a, b)) =>
      call_function("replace", s, lit(s"|$a||$b|"), lit(s"|$a$b|"))
    }
  }

  /** Model-token count of `text` under the pinned vocab: half the
    * delimiter count of the merged symbol string.
    */
  def tokenCount(text: Column): Column = {
    val s = symbols(text)
    ((length(s) - length(call_function("replace", s, lit("|"), lit("")))) / lit(2))
      .cast("long")
  }

  /** DuckDB fragment: the identical merge chain over a token-array SQL
    * expression (the oracles' shared `sqlToks`), yielding the merged
    * symbol string.
    */
  def sqlSymbols(toksSql: String): String =
    Merges.foldLeft(
      s"regexp_replace(array_to_string($toksSql, '#'), '([^#])', '|\\1|', 'g')") {
      case (s, (a, b)) => s"replace($s, '|$a||$b|', '|$a$b|')"
    }

  /** DuckDB fragment: the model-token count (BIGINT). */
  def sqlTokenCount(toksSql: String): String = {
    val s = sqlSymbols(toksSql)
    s"CAST((length($s) - length(replace($s, '|', ''))) / 2 AS BIGINT)"
  }
}
