package graft.llm

import org.apache.spark.sql.catalyst.util.ArrayData

/** A LEARNED quality-model weight table in executor-ready form: one
  * nano-unit long per hashed feature bucket (absent buckets are 0).
  * Ships as ONE torrent broadcast (the [[BpeVocab]] device) into
  * [[graft.functions.HashedMarginNano]], which folds a document's
  * margin inside the scan projection — the weight lookup is an O(1)
  * array index, so learned-model inference keeps [[QualityModel]]'s
  * zero-shuffle scale shape.
  *
  * [[marginNano]] is the ONE margin implementation both the eval and
  * codegen paths of the expression call: per token, md5 → first 4
  * digest bytes as an unsigned int (≡ the first 8 md5 hex chars as an
  * integer — the engine-reproducible bucket device) mod the table
  * width, then the weight. Null tokens contribute 0 (the join-form
  * scorer drops them the same way).
  */
final class QualityWeights(val nano: Array[Long]) extends Serializable {
  require(nano.nonEmpty, "empty weight table")

  def marginNano(toks: ArrayData): Long = {
    val md = QualityWeights.digest.get()
    var s = 0L
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      if (!toks.isNullAt(i)) {
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        val head = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
          ((d(2) & 0xff) << 8) | (d(3) & 0xff)
        s += nano((java.lang.Integer.toUnsignedLong(head) %
          nano.length).toInt)
      }
      i += 1
    }
    s
  }
}

object QualityWeights {
  // MessageDigest is stateful and not thread-safe; one per task thread
  // (the SimHashMd5/WinnowMd5 device) — getInstance per ROW paid a JCA
  // provider lookup + allocation on the hot inference scan.
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
