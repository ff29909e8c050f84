package graft.expr

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All `nTables` random-hyperplane LSH bucket ids in ONE pass over the
  * vector — value-identical to Ann.lshBucket's relational form (per
  * plane: `aggregate(zip_with(vec, w, _*_), 0.0, _+_)` then
  * `round(dot, 9) > 0`), which is CodegenFallback: nTables×nPlanes
  * interpreted lambda pipelines per row, each materializing a weight
  * array and a product array. Here the weight w(j,d) =
  * ((j·2654435761 + d·40503) mod 1000003)/1000003 − 0.5 is computed
  * inline (pure integer arithmetic — deterministic across engines, the
  * property the DuckDB oracle relies on), the dot accumulates in the
  * same d=1..dim order (bit-identical doubles), and the sign test uses
  * the same BigDecimal HALF_UP scale-9 rounding as Spark's `round`.
  *
  * Table t (0-based) uses global plane ids planeOffset + t·nPlanes + p;
  * element t of the result is that table's bucket. A null vector
  * element nulls every dot (as the relational form's null propagation
  * does), which zeroes all buckets.
  */
case class LshBuckets(child: Expression, dim: Int, nPlanes: Int,
                      nTables: Int, planeOffset: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if nPlanes >= 1 && nPlanes <= 60 && nTables >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets supports 1..60 planes and >=1 tables, got $nPlanes/$nTables")
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires array<double> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "lsh_buckets"

  override protected def nullSafeEval(input: Any): Any =
    LshBuckets.buckets(input.asInstanceOf[ArrayData], dim, nPlanes, nTables, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.LshBuckets.buckets($c, $dim, $nPlanes, $nTables, $planeOffset)")

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {

  /** Called from generated code. */
  def buckets(vec: ArrayData, dim: Int, nPlanes: Int,
              nTables: Int, planeOffset: Int): ArrayData = {
    val out = new Array[Long](nTables)
    val n = vec.numElements()
    // relational parity: zip_with null-pads on length mismatch and a null
    // element nulls the product — either way every dot goes null and all
    // bits stay unset
    var hasNull = n != dim
    var d = 0
    while (d < n && !hasNull) { hasNull = vec.isNullAt(d); d += 1 }
    if (!hasNull) {
      var t = 0
      while (t < nTables) {
        var bucket = 0L
        var p = 0
        while (p < nPlanes) {
          val j = (planeOffset + t * nPlanes + p).toLong
          var dot = 0.0
          var i = 0
          while (i < n) {
            val w = ((j * 2654435761L + (i + 1).toLong * 40503L) % 1000003L).toDouble /
              1000003.0 - 0.5
            dot += vec.getDouble(i) * w
            i += 1
          }
          // Spark round(x, 9): BigDecimal HALF_UP at scale 9
          val rounded = JBigDecimal.valueOf(dot).setScale(9, RoundingMode.HALF_UP).doubleValue()
          if (rounded > 0) bucket |= (1L << p)
          p += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    new GenericArrayData(out.map(x => x: Any))
  }

  def lshBuckets(vec: Column, dim: Int, nPlanes: Int,
                 nTables: Int, planeOffset: Int = 0): Column =
    column(LshBuckets(expression(vec), dim, nPlanes, nTables, planeOffset))
}
