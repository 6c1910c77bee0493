package graft.fed

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

import graft.sources.LayerTensor

/** A1 as a SQL-visible typed `Aggregator` (SURVEY §2.9 / §4.3's
  * "custom Aggregator if SQL-exposed" slot): FedAvg over a
  * `Dataset[(Long, Seq[LayerTensor])]` of per-client
  * `(numExamples, weights)` updates —
  * `ds.select(FedAvgAggregator.toColumn)` runs the weighted mean
  * INSIDE Spark's aggregation machinery: partial buffers combine
  * map-side and tree-wise across executors, so a million-client
  * federation aggregates without any driver fold.
  *
  * Same algebra as `FedAvg.weighted` (Double accumulation, single
  * finalize division); `merge` is commutative/associative by
  * construction, which is what makes the distributed combine legal.
  */
object FedAvgAggregator
    extends Aggregator[(Long, Seq[LayerTensor]),
                       (Long, Seq[(Int, Seq[Int])], Array[Array[Double]]),
                       Seq[LayerTensor]] {

  /** (totalN, (layer, shape) template, per-layer Double accumulators);
    * empty template marks the un-initialized zero buffer.
    */
  type Buf = (Long, Seq[(Int, Seq[Int])], Array[Array[Double]])

  def zero: Buf = (0L, Seq.empty, Array.empty)

  private def newAcc(w: Seq[LayerTensor]): Array[Array[Double]] =
    w.map(t => new Array[Double](t.values.length)).toArray

  private def axpy(acc: Array[Array[Double]], a: Double,
                   w: Seq[LayerTensor]): Unit = {
    var l = 0
    while (l < acc.length) {
      val values = w(l).values
      val av = acc(l)
      var i = 0
      while (i < av.length) { av(i) += a * values(i); i += 1 }
      l += 1
    }
  }

  def reduce(b: Buf, in: (Long, Seq[LayerTensor])): Buf = {
    val (n, w) = in
    // an empty weight list would leave the buffer in its "zero"
    // empty-template state while tn accumulated — merge would then
    // discard that buffer's example count entirely
    require(w.nonEmpty, "client update with an empty weight list")
    val (tn, tmpl, acc0) = b
    val (shapes, acc) =
      if (tmpl.isEmpty) (w.map(t => (t.layer, t.shape)), newAcc(w))
      else (tmpl, acc0)
    require(shapes.length == w.length, "client weight arity mismatch")
    var l = 0
    while (l < w.length) {
      require(shapes(l) == ((w(l).layer, w(l).shape)),
        s"client layer/shape mismatch at layer $l: " +
          s"got (${w(l).layer},${w(l).shape}), expected ${shapes(l)}")
      require(w(l).values.length == acc(l).length,
        s"client weight length mismatch at layer $l: " +
          s"got ${w(l).values.length} values, expected ${acc(l).length}")
      l += 1
    }
    axpy(acc, n.toDouble, w)
    (tn + n, shapes, acc)
  }

  def merge(a: Buf, b: Buf): Buf = {
    if (a._2.isEmpty) b
    else if (b._2.isEmpty) a
    else {
      val (an, shapes, aa) = a
      val (bn, bShapes, ba) = b
      // reduce only validates clients against the template FIRST SEEN
      // in their own partition — two partitions that saw different
      // architectures must collide HERE, not silently truncate or
      // crash mid-sum
      require(shapes == bShapes,
        s"partition template mismatch in FedAvg merge: $shapes vs $bShapes")
      var l = 0
      while (l < aa.length) {
        val x = aa(l); val y = ba(l)
        var i = 0
        while (i < x.length) { x(i) += y(i); i += 1 }
        l += 1
      }
      (an + bn, shapes, aa)
    }
  }

  def finish(b: Buf): Seq[LayerTensor] = {
    val (tn, shapes, acc) = b
    require(tn > 0, "FedAvg with zero total examples")
    shapes.zip(acc).map { case ((layer, shape), av) =>
      LayerTensor(layer, shape, av.map(v => (v / tn).toFloat))
    }
  }

  def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  def outputEncoder: Encoder[Seq[LayerTensor]] = Encoders.kryo[Seq[LayerTensor]]

  /** The typed column: `updates.select(FedAvgAggregator.column)`. */
  def column: TypedColumn[(Long, Seq[LayerTensor]), Seq[LayerTensor]] =
    toColumn.name("fedavg")
}
