package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve helpers for multi-dimensional data layout.
  *
  * Why this exists: at 100 TB, min/max zone-map pruning on a sorted layout
  * only skips along the ONE sort column. Interleaving the bits of two join/
  * filter dimensions into a single z-value and range-partitioning + sorting
  * by it gives every file a tight min/max rectangle in BOTH dimensions, so
  * scans filtered on either column (or both) skip most files. This is the
  * same trick Delta/Iceberg `OPTIMIZE ZORDER BY` applies; here it is plain
  * column arithmetic, fully inside whole-stage codegen.
  *
  * The bit-spread uses the classic mask chain (shift-or-mask, 4 steps for
  * 16-bit inputs) — expressed with Catalyst's `shiftleft`/`bitwiseAND`/
  * `bitwiseOR`, so the identical integer expression is writable in ANSI SQL
  * for the oracle (see [[sqlSpread16]]).
  */
object ZOrder {

  /** (shift, mask) chain that spreads the low 16 bits of v so that input
    * bit i lands at output bit 2i. Masks are the standard Morton constants. */
  private val Steps = Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL),
    (2, 0x33333333L), (1, 0x55555555L))

  /** Spread the low 16 bits of an integral column to even bit positions. */
  def spread16(v: Column): Column =
    Steps.foldLeft(v.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (c, (sh, m)) => c.bitwiseOR(shiftleft(c, sh)).bitwiseAND(lit(m))
    }

  /** 32-bit z-value of two 16-bit coordinates: x on even bits, y on odd. */
  def zvalue16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The same spread as nested ANSI SQL over expression string `e`. The
    * input is CAST to BIGINT first: DuckDB keeps `&`/`<<` in the
    * operand's own width, and a 32-bit INTEGER input overflows at the
    * final `<< 1` once the spread reaches 0x55555555. */
  def sqlSpread16(e: String): String =
    Steps.foldLeft(s"(CAST($e AS BIGINT) & 65535)") { case (s, (sh, m)) =>
      s"(($s | ($s << $sh)) & $m)"
    }

  /** SQL mirror of [[zvalue16]]. */
  def sqlZvalue16(x: String, y: String): String =
    s"(${sqlSpread16(x)} | (${sqlSpread16(y)} << 1))"
}
