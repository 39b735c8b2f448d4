package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Cross-engine deterministic numeric/hash helpers.
  *
  * The correctness gate compares our results against a DuckDB oracle by
  * value hash, so every exported column must be bit-identical across two
  * independent engines. Rules encoded here:
  *
  *   - Never export a floating-point aggregate computed by order-dependent
  *     summation. Money-like doubles (2 decimals) are converted to exact
  *     integer cents BEFORE aggregation; integer sums are order-free.
  *   - Ratios/averages are computed as one IEEE double division of two
  *     deterministic values (exact sums / counts) — deterministic.
  *   - Hashes exported across engines derive from md5 (identical bytes in
  *     any engine), never murmur3/xxhash (engine-specific seeds are fine
  *     internally, e.g. for LSH bucketing, but must not surface).
  */
object Portable {

  /** Exact integer cents of a 2-decimal money double: round(x*100)::long.
    * DuckDB equivalent: CAST(round(x*100) AS BIGINT). */
  def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** Deterministic 60-bit non-negative hash from md5 hex (15 nibbles).
    * DuckDB equivalent: ('0x'||substring(md5(x),1,15))::BIGINT. */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Double division of two exact (integer-valued) columns — a single IEEE
    * op, deterministic in any engine. */
  def ratio(num: Column, den: Column): Column =
    num.cast("double") / den.cast("double")
}
