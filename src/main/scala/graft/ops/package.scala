package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.DecimalType

package object ops {
  /** Exact cross-engine sum of a decimal-grid double expression: cast onto
    * the decimal grid (scale must cover the data: 2 for money columns, 4/6
    * for products of them, 0 for integral), sum exactly (order-free), and
    * surface as double. THE primitive the DuckDB hash-equality of every
    * money aggregate rests on — one definition, so a precision change can't
    * silently drift between modules.
    */
  private[graft] def dsum(e: Column, scale: Int = 2): Column =
    sum(e.cast(DecimalType(30, scale))).cast("double")
}
