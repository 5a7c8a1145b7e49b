package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: dot product of two `array<bigint>` columns.
  *
  * The expression-composition form `aggregate(zip_with(a, b, _*_), 0, _+_)`
  * is semantically identical but runs interpreted (higher-order functions
  * are CodegenFallback) and allocates an intermediate array per row; for
  * the similarity operators the dot product sits inside an O(pairs) join,
  * so it is the single hottest scalar in the engine (SURVEY.md §2.9 [EXT]
  * cosine similarity). This version generates a tight primitive loop
  * inside whole-stage codegen: no allocation, no virtual calls.
  *
  * Arrays of unequal length dot over the common prefix; null input → null.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

object DotProductLong {
  /** SQL-visible function name (also injected by [[graft.GraftExtensions]]). */
  val FnName = "graft_dot_long"

  /** Register in the session's function registry (once per session) and
    * return a Column-level handle. Registry + `call_function` keeps us
    * independent of the Column↔Expression constructor surface, which is
    * version-sensitive in Spark 4. Registration is guarded by a lookup:
    * re-registering on every call spams `SimpleFunctionRegistry`
    * replacement warnings into every job's log (VERDICT r3 item 6). */
  def dotLong(spark: SparkSession)(a: Column, b: Column): Column = {
    val registry = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(FnName)
    if (!registry.functionExists(id))
      registry.createOrReplaceTempFunction(
        FnName, exprs => {
          require(exprs.length == 2, s"$FnName requires exactly 2 " +
            s"arguments (array<bigint>, array<bigint>), got ${exprs.length}")
          DotProductLong(exprs.head, exprs(1))
        }, "scala_udf")
    call_function(FnName, a, b)
  }
}
