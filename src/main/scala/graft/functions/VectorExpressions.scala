package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Native dot product of two float-array columns, accumulated in double,
  * strictly left-to-right (i = 0..n-1) — bit-identical to
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, acc+v)` and
  * to a sequential external implementation, but whole-stage-codegen'd: the
  * generated loop reads primitive floats straight out of the columnar
  * `ArrayData` with no per-element lambda dispatch or boxing.
  *
  * This is the engine's hot scalar for similarity search (SURVEY §7.2.8
  * extension surface); at 100 TB corpus scale the dot product runs once per
  * (query, candidate) pair, so constant-factor wins here dominate ANN cost.
  * If the arrays differ in length the shorter length is used (zip semantics).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_f"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def dot_f(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductF(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def norm_f(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(dot_f(a, a))
  }
}
