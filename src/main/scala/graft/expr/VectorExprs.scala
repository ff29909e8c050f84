package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types._

/** Cosine similarity of two `array<double>` columns as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * CodegenFallback — every element goes through an interpreted lambda,
  * which made the all-pairs cosine baseline ~60× slower than a fused
  * loop. This expression computes dot, |a|² and |b|² in ONE pass with
  * the same left-to-right summation order as the sequential fold (and as
  * DuckDB's list_cosine_similarity), so results are bit-compatible with
  * the oracle at round(·, 6).
  *
  * Returns NULL if either input is NULL, lengths differ, or ANY element
  * is null — the zip_with twin's null propagation (a null element nulls
  * the product, the fold, and the cosine; silently reading the slot as
  * 0.0 would corrupt rankings, and DuckDB's list_cosine_similarity
  * REJECTS null elements rather than substituting).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<double> inputs, got ${l.catalogString}, ${r.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("cosR")
      s"""
         |java.lang.Double $r = graft.expr.CosineSim.cos($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {

  /** Called from generated code AND interpreted eval (one shared path —
    * no dual-implementation drift). Null on length mismatch or any null
    * element; the null check rides inside the single fused loop.
    */
  def cos(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

object VectorExprs {
  /** Column API: cosine similarity of two array<double> columns. */
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
}
