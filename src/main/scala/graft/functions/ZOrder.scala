package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) interleaving for multi-dimensional data clustering.
  *
  * At 100 TB the dominant read cost is files that can't be skipped: sorting
  * a table by one key gives perfect min/max pruning on that key and none on
  * any other. Writing files ordered by the Morton code of two keys gives
  * every file a tight min/max range in BOTH dimensions, so scans filtered
  * on either key prune most files — the standard lakehouse layout trick
  * (`OPTIMIZE ... ZORDER BY` in public Delta/Iceberg docs).
  *
  * Built entirely from Spark's own bitwise expressions (the classic
  * binary-magic-numbers spread from the public "Bit Twiddling Hacks"
  * collection), so the whole key stays inside whole-stage codegen with no
  * UDF and no custom Expression — at scale it feeds
  * `repartitionByRange(zorderKey(a, b))` before the writer.
  */
object ZOrder {

  private val SpreadSteps = Seq(
    (16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** Spread the low 31 bits of a non-negative integral column so bit i
    * lands at bit 2i (even positions); O(log w) shift-and-mask steps. */
  def spread31(c: Column): Column =
    SpreadSteps.foldLeft(c.cast(LongType).bitwiseAND(lit(0x7FFFFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 62-bit Morton code of two non-negative keys (low 31 bits each):
    * a's bit i at position 2i, b's bit i at position 2i+1. Monotone in the
    * interleaved bit order — range-partitioning by this key co-locates
    * rows that are close in BOTH dimensions. */
  def zorderKey(a: Column, b: Column): Column =
    spread31(a).bitwiseOR(shiftleft(spread31(b), 1))
}
