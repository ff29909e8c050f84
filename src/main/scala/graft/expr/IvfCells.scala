package graft.expr

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** The `nprobe` nearest IVF centroid ids of a vector, best first, in ONE
  * fused pass — value-identical to the relational form (per centroid:
  * `round(cosine_sim(v, lit(cv)), 6)` structs through `greatest` /
  * `array_sort`), which unrolls into C separate [[CosineSim]] subtrees:
  * that shape recomputes |v| once per centroid (C× redundant work) and
  * its generated code grows linearly with C — at a few hundred centroids
  * Janino splits or falls back, and plan compile time dominates. Here
  * the centroid matrix and its pre-computed norms ride along as
  * reference objects, |v| is accumulated once, and each dot runs in the
  * same d=0..dim-1 order as [[CosineSim]], so every cosine is
  * bit-identical to the relational twin before the shared BigDecimal
  * HALF_UP scale-6 rounding (Spark `round` semantics).
  *
  * Ordering is (cos desc, cid asc) with NaN ranking LAST: a NaN cosine
  * (zero-norm vector or centroid) carries no similarity information, so
  * it must not win a probe slot. This matches the negated-array_sort
  * relational twin (`-NaN = NaN` sorts greatest ascending → last). The
  * `greatest`-based relational CELL twin would instead let a NaN-cosine
  * centroid win (Spark sorts NaN greatest) — finite-cosine corpora only
  * for that oracle. A null element or length-mismatched vector yields an
  * EMPTY cell list (the row is unassignable; `explode` then drops it,
  * `get(_, 0)` yields null).
  */
case class IvfCells(child: Expression, cids: Array[Long],
                    cents: Array[Array[Double]], nprobe: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if cids.length == cents.length && cids.nonEmpty && nprobe >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"ivf_cells needs matching non-empty cids/cents and nprobe >= 1, " +
        s"got ${cids.length}/${cents.length}/$nprobe")
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_cells requires array<double> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "ivf_cells"

  // |c_j| accumulated in the same element order as CosineSim's nb fold —
  // bit-identical to computing it inside the per-pair loop
  @transient private lazy val norms: Array[Double] = IvfCells.norms(cents)

  override protected def nullSafeEval(input: Any): Any =
    IvfCells.cells(input.asInstanceOf[ArrayData], cids, cents, norms, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("ivfCids", cids, "long[]")
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.IvfCells.cells($c, $cidsRef, $centsRef, $normsRef, $nprobe)")
  }

  // the arrays are deliberately compared by identity (default case-class
  // equality on Array is reference equality): two IvfCells built from the
  // same centroid Seq share the driver-side object, which is the reuse
  // that matters for plan dedup
  override protected def withNewChildInternal(newChild: Expression): IvfCells =
    copy(child = newChild)
}

object IvfCells {

  def norms(cents: Array[Array[Double]]): Array[Double] =
    cents.map { c =>
      var nb = 0.0
      var i = 0
      while (i < c.length) { nb += c(i) * c(i); i += 1 }
      math.sqrt(nb)
    }

  /** Called from generated code. */
  def cells(vec: ArrayData, cids: Array[Long], cents: Array[Array[Double]],
            norms: Array[Double], nprobe: Int): ArrayData = {
    val n = vec.numElements()
    val c0 = cents(0).length
    var bad = n != c0
    var d = 0
    while (d < n && !bad) { bad = vec.isNullAt(d); d += 1 }
    if (bad) return new GenericArrayData(Array.empty[Any])
    val v = new Array[Double](n)
    var na = 0.0
    d = 0
    while (d < n) {
      val x = vec.getDouble(d)
      v(d) = x
      na += x * x
      d += 1
    }
    val normV = math.sqrt(na)
    val nc = cents.length
    val cos = new Array[Double](nc)
    var j = 0
    while (j < nc) {
      val cj = cents(j)
      if (cj.length != n) {
        // ragged centroid (dimension mismatch): no similarity signal —
        // NaN ranks last, same as the relational twin's null cosine
        // never winning a probe slot (reading past cj would AIOOBE and
        // kill the task instead)
        cos(j) = Double.NaN
      } else {
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v(i) * cj(i); i += 1 }
        // Spark round(x, 6): BigDecimal HALF_UP at scale 6 (NaN/Inf pass through)
        val raw = dot / (normV * norms(j))
        cos(j) =
          if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
          else JBigDecimal.valueOf(raw).setScale(6, RoundingMode.HALF_UP).doubleValue()
      }
      j += 1
    }
    val idx = Array.range(0, nc).sortWith { (a, b) =>
      val na = java.lang.Double.isNaN(cos(a))
      val nb = java.lang.Double.isNaN(cos(b))
      if (na != nb) nb // NaN ranks last
      else {
        val c = java.lang.Double.compare(cos(a), cos(b))
        if (c != 0) c > 0 else cids(a) < cids(b)
      }
    }
    val k = math.min(nprobe, nc)
    val out = new Array[Any](k)
    var i = 0
    while (i < k) { out(i) = cids(idx(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Column API: nprobe best centroid ids of `vec`, best first. */
  def ivfCells(vec: Column, centroids: Seq[(Long, Array[Double])], nprobe: Int): Column =
    column(IvfCells(expression(vec),
      centroids.map(_._1).toArray, centroids.map(_._2).toArray, nprobe))
}
