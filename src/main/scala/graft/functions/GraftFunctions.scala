package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar functions — SURVEY.md §2.6 (F1, F3, F4).
  *
  * All Column variants are built from `org.apache.spark.sql.functions`
  * primitives (`zip_with`/`aggregate`/`when`) so they stay inside
  * whole-stage codegen — no UDFs in the hot path.
  */
object GraftFunctions {

  /** F1 — `2PR/(P+R)` with the reference's zero-division guard
    * (fl_client.py:132-137 returns the string "undefined"; here: None).
    */
  def f1Score(precision: Double, recall: Double): Option[Double] =
    if (precision + recall == 0.0) None
    else Some(2 * precision * recall / (precision + recall))

  /** F1 as a Column (null when P+R = 0). */
  def f1ScoreCol(p: Column, r: Column): Column =
    when(p + r =!= 0.0, lit(2.0) * p * r / (p + r))

  /** Dot product of two ARRAY<FLOAT>/ARRAY<DOUBLE> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** F3 — sigmoid link score from embedding inner product
    * (models/supervised.py:94-96, `edge_embedding_method="ip"`,
    * `output_act="sigmoid"`).
    */
  def sigmoidDot(a: Column, b: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-dot(a, b)))

  /** L2 norm of an array column. */
  def l2Norm(v: Column): Column = sqrt(aggregate(
    transform(v, x => x * x), lit(0.0d), (acc, x) => acc + x))

  /** F4 — L2 normalization of an embedding column
    * (models/unsupervised.py:64, `normalize="l2"`). Zero vectors pass
    * through unchanged (no 0/0).
    */
  def l2Normalize(v: Column): Column = {
    val n = l2Norm(v)
    when(n === 0.0, v).otherwise(transform(v, x => x / n))
  }

  /** Plain-Scala twins for the task-side (non-SQL) math paths. */
  def dotLocal(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    s
  }
  def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))
  def l2NormalizeLocal(v: Array[Float]): Array[Float] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(x => (x / n).toFloat)
  }
}
