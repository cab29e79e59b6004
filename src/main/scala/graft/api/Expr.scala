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
      // wording matches the reference's asserted regex (tests/
      // test_expression.py:23-29); its other asserted message — combining
      // with a non-Expression — is unrepresentable here (type-checked)
      throw new ExpressionError(
        "Cannot concatenate two expressions from different tables " +
          s"('$table' $op '${other.table}')")

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
