package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shingling / MinHash Catalyst expressions for the near-duplicate surface.
  *
  * Round 1 materialized word n-gram shingles as STRING arrays
  * (`concat_ws` over slices) and intersected string arrays per candidate
  * pair — both allocation-heavy. Here a document's shingle set is a SORTED
  * DISTINCT array<long> of 64-bit shingle hashes, produced in one pass:
  * set sizes and intersection counts (all Jaccard needs) are identical to
  * the string-set versions modulo 64-bit collisions (~|A|·|B|/2⁶⁴ per pair
  * — immaterial), verify becomes a linear merge over longs, and MinHash
  * permutations become mix-functions over the precomputed hashes instead of
  * per-permutation string re-hashing.
  */
object ShingleHash {
  /** FNV-1a 64 over UTF-8 bytes. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** splitmix64 — used to derive per-permutation mixing keys. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** murmur3 finalizer — cheap full-avalanche mix for minhash permutations. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL
    x = (x ^ (x >>> 33)) * 0xC4CEB9FE1A85EC53L
    x ^ (x >>> 33)
  }
}

/** Word n-gram shingle hashes of a token array: sorted distinct
  * array<long>. A document with fewer than `n` tokens has zero shingles
  * (matches the oracle's `greatest(len - (n-1), 0)` guard). */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val nSh = m - (n - 1)
    if (nSh <= 0) return new GenericArrayData(Array.emptyLongArray)
    // hash each token once
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      th(i) =
        if (toks.isNullAt(i)) ShingleHash.fnv1a64(Array.emptyByteArray)
        else ShingleHash.fnv1a64(toks.getUTF8String(i).getBytes)
      i += 1
    }
    // combine n consecutive token hashes; order-sensitive polynomial mix
    val out = new Array[Long](nSh)
    i = 0
    while (i < nSh) {
      var h = 0x811c9dc5811c9dc5L
      var j = 0
      while (j < n) {
        h = ShingleHash.fmix64(h ^ th(i + j)) + 0x9E3779B97F4A7C15L * (j + 1)
        j += 1
      }
      out(i) = h
      i += 1
    }
    // sorted distinct in place
    java.util.Arrays.sort(out)
    var w = 1
    i = 1
    while (i < nSh) {
      if (out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == nSh) out else java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** MinHash signature of a shingle-hash set: element p = min over shingles s
  * of fmix64(s ^ z_p), z_p = splitmix64(seed + p). One pass over the set
  * for all `numPerms` permutations. Empty set → all Long.MaxValue (never
  * collides with a real doc's signature in practice). */
case class MinHashSig(child: Expression, numPerms: Int, seed: Long = 42L)
    extends UnaryExpression with CodegenFallback {

  require(numPerms >= 1, "numPerms >= 1")

  @transient private lazy val zs: Array[Long] =
    Array.tabulate(numPerms)(p => ShingleHash.splitmix64(seed + p))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<long>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val m = sh.numElements()
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val s = sh.getLong(i)
      var p = 0
      while (p < numPerms) {
        val v = ShingleHash.fmix64(s ^ zs(p))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** |A ∩ B| for two SORTED distinct long arrays — linear merge, no
  * allocation. The verify step of every near-dup operator. */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"intersect_count_sorted requires (array<long>, array<long>), got (${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_count_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    java.lang.Integer.valueOf(IntersectCountSorted.merge(x, y))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.catalyst.IntersectCountSorted.merge($x, $y);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCountSorted =
    copy(left = l, right = r)
}

object IntersectCountSorted {
  /** Called from both interpreted eval and generated code. */
  def merge(x: ArrayData, y: ArrayData): Int = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val a = x.getLong(i)
      val b = y.getLong(j)
      if (a == b) { c += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    c
  }
}

object ShingleExprs {
  def shingleHashes(tokens: Column, n: Int): Column =
    Cols.column(ShingleHashes(Cols.expression(tokens), n))
  def minhashSig(shingleHashes: Column, numPerms: Int, seed: Long = 42L): Column =
    Cols.column(MinHashSig(Cols.expression(shingleHashes), numPerms, seed))
  def intersectCountSorted(a: Column, b: Column): Column =
    Cols.column(IntersectCountSorted(Cols.expression(a), Cols.expression(b)))
}
