package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for wrapping custom Catalyst Expressions into public `Column`s.
  * `ExpressionUtils` is `private[sql]`, so the accessor lives in a subpackage
  * of org.apache.spark.sql — the standard extension-point shim for libraries
  * that ship native expressions.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Input-type spec for string-typed expressions (AbstractDataType is
    * private[sql]; expressions outside the package reference it via inference).
    */
  val stringInput: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)

  /** Input-type specs for array<double> expressions (unary / binary). */
  val doubleArrayInput: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
  val doubleArrayInput2: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  /** Integer division (`div`) — exact at every long magnitude, unlike `/`
    * (double division, exact only below 2^53). Truncates toward zero.
    */
  def intDiv(a: Column, b: Column): Column =
    column(new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      expression(a), expression(b)))

  /** Register a function into an ALREADY-RUNNING session's registry (the
    * `withExtensions` path only applies to sessions built after the fact).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
