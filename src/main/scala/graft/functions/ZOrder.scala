package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 2-D Morton (Z-order) curve value for multi-dimensional clustering.
  *
  * The lakehouse layout trick (Delta `OPTIMIZE ZORDER BY`, Iceberg
  * sort orders): sorting by a single column gives parquet files tight
  * min/max ranges on THAT column and full-width ranges on every
  * other, so predicates on the second column skip nothing. Sorting by
  * the interleaved-bit Morton value instead tiles the 2-D space —
  * every file covers a ~√n-th of EACH dimension — so min/max file
  * skipping works for range predicates on either column, at the cost
  * of neither being perfectly sorted.
  *
  * Pure column arithmetic: affine-normalize each dimension to
  * `bits`-bit integer space over broadcast (lo, hi) bounds, then
  * interleave bits a→even / b→odd with one `aggregate` HOF over the
  * bit positions. Runs once per row at WRITE time only.
  */
object ZOrder {

  /** `v` normalized to an integer in [0, 2^bits): degenerate ranges
    * (hi <= lo, the single-value column) map everything to 0, nulls
    * to 0 (they sort first, same as a plain sort's default). */
  private[graft] def normalized(v: Column, lo: Column, hi: Column,
                                bits: Int): Column = {
    val span = hi.cast("double") - lo.cast("double")
    val maxI = (1L << bits) - 1
    when(v.isNull || span <= 0, lit(0L))
      .otherwise(least(lit(maxI), greatest(lit(0L),
        floor((v.cast("double") - lo.cast("double")) / span * maxI)
          .cast("long"))))
  }

  /** Morton value of two already-normalized `bits`-bit longs: a
    * static 2·bits-term bitwise fold (Column API, whole-stage
    * codegen'd — no lambda dispatch, no SQL round-trip). */
  private[graft] def interleave(na: Column, nb: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(na, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(nb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Z-value of `(a, b)` over the given inclusive bounds. */
  def zValue(a: Column, aLo: Column, aHi: Column,
             b: Column, bLo: Column, bHi: Column, bits: Int = 16): Column =
    interleave(normalized(a, aLo, aHi, bits), normalized(b, bLo, bHi, bits),
      bits)
}
