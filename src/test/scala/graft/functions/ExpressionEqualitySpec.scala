package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

/** Expressions carrying Array payloads (BloomMightContain's serialized
  * filter, RankBucket's boundary array) must compare by CONTENT:
  * Catalyst's semanticEquals-based reuse (ReuseExchange, common-
  * subexpression elimination) runs on expression equality, and the
  * synthesized case-class equals compares arrays by reference —
  * making semantically identical expressions never equal.
  */
class ExpressionEqualitySpec extends AnyFunSuite {

  test("RankBucket: equal child + equal boundary contents => equal") {
    val a = RankBucket(Literal(1.0), Array(1.0, 2.0, 3.0))
    val b = RankBucket(Literal(1.0), Array(1.0, 2.0, 3.0))
    assert(a === b)
    assert(a.hashCode === b.hashCode)
    assert(a.semanticEquals(b))
    assert(a !== RankBucket(Literal(1.0), Array(1.0, 2.0, 4.0)))
    assert(a !== RankBucket(Literal(2.0), Array(1.0, 2.0, 3.0)))
  }

  test("BloomMightContain: equal child + equal filter bytes => equal") {
    val bf = BloomFilter.create(100, 0.03)
    bf.putLong(42L)
    // serialize twice: two distinct byte arrays with identical contents
    val a = BloomMightContain(Literal(7L), BloomMightContain.serialize(bf))
    val b = BloomMightContain(Literal(7L), BloomMightContain.serialize(bf))
    assert(a === b)
    assert(a.hashCode === b.hashCode)
    assert(a.semanticEquals(b))
    val bf2 = BloomFilter.create(100, 0.03)
    bf2.putLong(43L)
    assert(a !== BloomMightContain(Literal(7L), BloomMightContain.serialize(bf2)))
  }
}
