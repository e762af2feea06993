package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve encoding — the multi-dimensional clustering
  * key for data layout (net-new vs the reference; SURVEY §2.11). Sort
  * or range-partition by the interleaved key before writing and
  * parquet row-group min/max stats become selective for filters on
  * EITHER dimension — the file-skipping technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, expressed as a plain column so
  * it composes with `sortWithinPartitions` + any sink.
  *
  * Pure integer bit math (shifts, masks, OR) — bitwise portable
  * across engines, codegen'd end-to-end.
  */
object ZOrder {

  /** Interleaves the low `bits` bits of two non-negative ints:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Inputs must
    * already be bucketed to [0, 2^bits) — pass `pmod(k,
    * lit(1L << bits))` (the literal must be a LONG: `1 << 31`
    * overflows Int).
    */
  def zOrder2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must fit two lanes in a long")
    (0 until bits).map { i =>
      val xbit = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val ybit = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xbit.bitwiseOR(ybit)
    }.reduce(_ bitwiseOR _)
  }
}
