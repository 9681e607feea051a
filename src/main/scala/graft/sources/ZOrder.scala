package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for two-dimensional data clustering —
  * the lakehouse layout technique for making file-level min/max stats
  * selective on TWO columns at once. q65's compaction lays files out by
  * one sort key; range-partitioning by the Morton code of (a, b) keeps
  * each output file tight in BOTH dimensions, so a scan filtered on
  * either column (or both) can skip most files on footer stats alone.
  *
  * The code is a pure arithmetic expression (shift/and/or over
  * non-negative longs), so it stays inside whole-stage codegen and is
  * bit-for-bit reproducible in any engine — the DuckDB oracle replays
  * the same formula. Callers normalize each dimension into [0, 2^bits)
  * first; bits=16 gives a 32-bit code, plenty for file-level layout
  * (code collisions inside one file are harmless).
  */
object ZOrder {
  /** Interleave the low `bits` bits of non-negative `a` (even positions)
    * and `b` (odd positions) into a single Morton code. */
  def zval(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i) +
        shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i + 1)
    }

  /** The same formula as SQL text, for embedding in a DuckDB oracle. */
  def zvalSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(($a // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"(($b // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")
}
