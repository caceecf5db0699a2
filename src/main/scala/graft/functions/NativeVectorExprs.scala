package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over `array<float|double>` columns —
  * the one vector kernel hot enough to justify tier (b) of the custom-
  * operator ladder (a codegen'd `Expression` beating composed
  * built-ins): the `aggregate(zip_with(...))` formulation materializes
  * an intermediate product array and runs two HOF lambda loops per row
  * pair, while this compiles to a single fused primitive-double loop
  * over the two `ArrayData` buffers (no allocation, no per-element
  * lambda dispatch) inside whole-stage codegen.
  *
  * Numerics are IDENTICAL to the HOF version: elements are widened to
  * double (exact for float) and accumulated left-to-right, so every
  * oracle-checked cosine/distance result is bit-unchanged.
  *
  * Array elements must be non-null (embedding vectors are); a null
  * ELEMENT reads as 0.0 rather than poisoning the sum — the arrays
  * themselves are null-propagating like any binary expression.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_dot requires two array<float> or array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left)
    val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val lGet = if (isFloat(left)) s"$a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (isFloat(right)) s"$b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $lGet) * ((double) $rGet);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NativeVectorExprs {

  private val dotIdent = FunctionIdentifier("graft_dot")

  private def dotInfo = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")

  private def dotBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2, s"graft_dot expects 2 arguments, got ${children.size}")
    DotProduct(children.head, children(1))
  }

  /** Runtime registration for sessions not built with
    * [[graft.GraftExtensions]] (tests, the driver's own builders).
    * Idempotent. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(dotIdent))
      registry.registerFunction(dotIdent, dotInfo, dotBuilder _)
  }

  private[graft] def injectables
    : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((dotIdent, dotInfo, dotBuilder))
}
