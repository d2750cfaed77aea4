/* Bridge into Spark's private[sql] Column↔Expression converters.
 * Lives in org.apache.spark.sql purely for access; contains no logic.
 * This is the standard technique for third-party Catalyst expression
 * libraries targeting classic Spark 4.x, where Column is backed by
 * ColumnNode and the converters live in private[sql] ExpressionUtils.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** If `c` is an explicit sort-order column (`.asc`/`.desc`/the nulls
    * variants), its (isAscending, isNullsFirst). None for a bare column
    * (Spark's orderBy default: ascending nulls-first). Reads the
    * ColumnNode directly — the classic converter wraps the node opaquely,
    * so the catalyst SortOrder is not visible pre-analysis. */
  def sortOrderOf(c: Column): Option[(Boolean, Boolean)] = c.node match {
    case so: internal.SortOrder =>
      Some((so.sortDirection == internal.SortOrder.Ascending,
        so.nullOrdering == internal.SortOrder.NullsFirst))
    case _ => None
  }
}
