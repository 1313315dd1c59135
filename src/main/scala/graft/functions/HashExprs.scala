package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Hot-loop helpers shared by eval and generated code (static forwarders
  * make them directly callable from janino-compiled codegen). */
object HashUtil {
  /** murmur3 fmix64 finalizer — cheap avalanche for per-seed variants. */
  def mix(z0: Long): Long = {
    var z = (z0 ^ (z0 >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  /** Distinct 64-bit hashes of word n-gram shingles, first-occurrence
    * order. Token hashes via xxhash64(seed 42); a shingle hash combines
    * its n token hashes with a polynomial fold + finalizer. Arrays
    * shorter than n collapse to one whole-text shingle. */
  def shingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = tokens.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      i += 1
    }
    val cnt = if (m < n) 1 else m - n + 1
    val seen = new java.util.HashSet[java.lang.Long](cnt * 2)
    val out = new Array[Long](cnt)
    var k = 0
    i = 0
    while (i < cnt) {
      var h = 1125899906842597L
      var j = 0
      val lim = math.min(n, m)
      while (j < lim) { h = h * 31L + th(i + j); j += 1 }
      val sh = mix(h)
      if (seen.add(sh)) { out(k) = sh; k += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (k == cnt) out else java.util.Arrays.copyOf(out, k))
  }

  /** ALL full sliding-window hashes IN POSITION ORDER (the
    * non-distinct, position-preserving sibling of [[shingleHashes]]):
    * out(i) = hash of tokens i..i+n-1, exactly m-n+1 entries, EMPTY
    * for a sub-window document (the duplicated-span scrub drops short
    * docs — note this differs from shingleHashes' one whole-prefix
    * gram, which serves the Jaccard-set contract). Same token-xxhash →
    * base-31 polynomial → mix pipeline, so the two agree on full
    * windows. */
  def shingleHashesAll(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val cnt = math.max(m - n + 1, 0)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = tokens.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      i += 1
    }
    val out = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      var h = 1125899906842597L
      var j = 0
      while (j < n) { h = h * 31L + th(i + j); j += 1 }
      out(i) = mix(h)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** k-lane MinHash signature over a shingle-hash array: lane j keeps
    * min over shingles of mix(h ^ seed_j). One pass, k mins. */
  def minhashSig(hashes: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val m = hashes.numElements()
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = mix(h ^ (0x9e3779b97f4a7c15L * (j + 1)))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** 64-bit SimHash over token hashes: bit i is set when more hashes
    * have bit i set than clear (strict majority). One pass over the
    * array updating 64 counters — bit-identical to the 64-lambda
    * higher-order form in Dedup.simhashOfHashes (spec-proven). */
  def simhashSig(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) { counts(j) += ((h >>> j) & 1L).toInt; j += 1 }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) * 2 > n) sig |= (1L << j); j += 1 }
    sig
  }
}

/** Codegen'd shingle hashing (SURVEY.md §4: custom Expression justified
  * by BENCH — the higher-order-function form was the dedup hotspot at
  * ~0.5 ms/row interpreted; this runs the same logic as one compiled
  * call). Input: array<string> tokens; output: array<long> distinct
  * shingle hashes. */
case class ShingleHashes(child: Expression, shingleN: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def prettyName: String = "graft_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(tokens: Any): Any =
    HashUtil.shingleHashes(tokens.asInstanceOf[ArrayData], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashUtil.shingleHashes($c, $shingleN);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Codegen'd position-preserving window hashes ([[HashUtil
  * .shingleHashesAll]]): array<string> tokens → array<long> of every
  * full n-token sliding-window hash, index = window start. The
  * duplicated-span scrub's gram table rides these 8-byte keys instead
  * of materialized gram STRINGS (round 12: the interpreted chunk
  * construction + string shuffle was 46 s warm2 at sf1). */
case class ShingleHashesAll(child: Expression, shingleN: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def prettyName: String = "graft_shingle_hashes_all"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(tokens: Any): Any =
    HashUtil.shingleHashesAll(tokens.asInstanceOf[ArrayData], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashUtil.shingleHashesAll($c, $shingleN);")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashesAll =
    copy(child = newChild)
}

/** Codegen'd MinHash signature. Input: array<long> shingle hashes;
  * output: array<long> of `numHashes` lane minima. */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${t.sql}")
  }

  override def prettyName: String = "graft_minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(hashes: Any): Any =
    HashUtil.minhashSig(hashes.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashUtil.minhashSig($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Codegen'd SimHash signature (promoted from the 64-lambda interpreted
  * `aggregate` fold for the same reason as ShingleHashes/MinHashSig: one
  * compiled pass beats 64 interpreted array traversals per row). Input:
  * array<long> token hashes; output: long signature. */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${t.sql}")
  }

  override def prettyName: String = "graft_simhash_sig"
  override def dataType: DataType = LongType

  override def nullSafeEval(hashes: Any): Any =
    HashUtil.simhashSig(hashes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashUtil.simhashSig($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}
