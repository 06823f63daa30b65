package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native (codegen'd) array dot product.
  *
  * The builtin route — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — walks
  * boxed lambda closures per element; at 2M candidate pairs × 64 dims that
  * interpretation cost dominated the embedding queries (~20 s at sf0.1).
  * This expression compiles to a primitive double loop inside whole-stage
  * codegen: the 100 TB-honest shape for vector math without leaving SQL.
  *
  * Null contract: null input array → null result (BinaryExpression default);
  * null *elements* are not expected (embeddings are dense) and read as 0.0.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers pass array<double>; no implicit coercion is attempted.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayOps {

  /** Idempotently register graft functions on the session's registry. */
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => ArrayDotProduct(exprs.head, exprs(1)), "built-in")
  }

  /** Codegen'd dot product of two array<double> columns. */
  def dotNative(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot", a, b)
  }
}
