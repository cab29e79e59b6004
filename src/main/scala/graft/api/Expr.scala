package graft.api

import org.apache.spark.sql.Column

/** A composable filter predicate tied to its source table.
  *
  * The reference builds WHERE-clause *strings* and concatenates them with
  * AND/OR (reference: pandasdb/expression.py:6-59). Here the payload is a real
  * Catalyst predicate [[Column]] — no string building, no injection — but the
  * same API shape is kept: `&&` / `||` composition plus a guard that rejects
  * mixing predicates from different tables (reference: expression.py:30-35).
  */
final case class Expr(cond: Column, table: String) {

  private def requireSameTable(other: Expr, op: String): Unit =
    if (other.table != table)
      throw new ExpressionError(
        s"cannot combine expressions from tables '$table' and '${other.table}' with $op")

  def &&(other: Expr): Expr = {
    requireSameTable(other, "AND")
    Expr(cond && other.cond, table)
  }

  def ||(other: Expr): Expr = {
    requireSameTable(other, "OR")
    Expr(cond || other.cond, table)
  }

  def unary_! : Expr = Expr(!cond, table)
}
