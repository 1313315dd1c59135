package graft

import graft.functions.HashUtil
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => CheckTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM properties of the codegen hash helpers (no Spark session). */
class HashUtilSpec extends AnyFunSuite {

  private def toks(ws: Seq[String]): ArrayData =
    ArrayData.toArrayData(ws.map(UTF8String.fromString).toArray)

  private def shingleSet(ws: Seq[String], n: Int): Set[Long] = {
    val a = HashUtil.shingleHashes(toks(ws), n)
    (0 until a.numElements()).map(a.getLong).toSet
  }

  private def check(p: org.scalacheck.Prop): Unit = {
    val r = CheckTest.check(CheckTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val word = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(6))
  private val doc = Gen.nonEmptyListOf(word)

  test("shingleHashes is deterministic and distinct") {
    check(forAll(doc) { ws =>
      val a = HashUtil.shingleHashes(toks(ws), 3)
      val b = HashUtil.shingleHashes(toks(ws), 3)
      val values = (0 until a.numElements()).map(a.getLong)
      values.toSet.size == values.size &&
        values == (0 until b.numElements()).map(b.getLong)
    })
  }

  test("identical docs share all shingles; a one-token edit keeps most") {
    check(forAll(doc.suchThat(_.size >= 8)) { ws =>
      val edited = ws.init :+ "zz"
      val (a, b) = (shingleSet(ws, 3), shingleSet(edited, 3))
      val j = a.intersect(b).size.toDouble / a.union(b).size
      // editing the last token can remove at most n=3 shingles and add ≤3
      j >= (a.size - 3).toDouble / (a.size + 3)
    })
  }

  test("minhashSig: signature of a superset is lane-wise <=") {
    check(forAll(doc.suchThat(_.size >= 4), doc) { (base, extra) =>
      val a = HashUtil.shingleHashes(toks(base), 2)
      val b = HashUtil.shingleHashes(toks(base ++ extra), 2)
      val sa = HashUtil.minhashSig(a, 16)
      val sb = HashUtil.minhashSig(b, 16)
      val aSet = (0 until a.numElements()).map(a.getLong).toSet
      val bSet = (0 until b.numElements()).map(b.getLong).toSet
      !aSet.subsetOf(bSet) ||
        (0 until 16).forall(i => sb.getLong(i) <= sa.getLong(i))
    })
  }

  test("identical shingle sets give identical signatures (set semantics)") {
    check(forAll(doc.suchThat(_.size >= 4)) { ws =>
      // same multiset in different construction order: shingle set equal
      val s1 = HashUtil.minhashSig(HashUtil.shingleHashes(toks(ws), 3), 16)
      val s2 = HashUtil.minhashSig(HashUtil.shingleHashes(toks(ws), 3), 16)
      (0 until 16).forall(i => s1.getLong(i) == s2.getLong(i))
    })
  }

  test("mix is a bijection-ish avalanche: no collisions over a dense range") {
    val outs = (0L until 100000L).map(HashUtil.mix)
    assert(outs.distinct.size == outs.size)
  }
}
