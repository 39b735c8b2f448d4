package graft.catalyst

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array — custom Catalyst expression for the
  * near-duplicate-detection surface (LLM-pipeline dedup; SimHash per
  * Charikar 2002, "Similarity estimation techniques from rounding
  * algorithms").
  *
  * Definition (deliberately portable so an independent engine can replicate
  * it for verification): for each token, `h = first 8 bytes of md5(token)
  * as a big-endian unsigned 64-bit integer`; bit `b` of the result is set
  * iff `sum over tokens of (2*((h >> b) & 1) - 1) > 0`. Duplicate tokens
  * count with multiplicity. Null tokens are skipped; a null array yields
  * null.
  *
  * A single tight-loop pass per row (one md5 per token) — O(tokens) with no
  * per-bit column explosion, which is why this is an `Expression` rather
  * than a `transform`/`aggregate` composition.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  // One digest per thread, not per row: the JCA provider lookup is
  // measurable on a corpus-wide scan, and in local mode one Expression
  // instance can be evaluated by many tasks concurrently — ThreadLocal
  // gives reuse without sharing the (non-thread-safe) MessageDigest.
  @transient private lazy val digestPerThread: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val md = digestPerThread.get()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) r |= (1L << b); b += 1 }
    java.lang.Long.valueOf(r)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-API entry point: `simhash64(tokensArray)`. */
  def apply(tokens: Column): Column = Cols.column(SimHash64(Cols.expression(tokens)))
}
