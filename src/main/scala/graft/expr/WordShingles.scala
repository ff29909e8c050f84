package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text in ONE pass — value-identical
  * to the relational pipeline `Sim.shingled` wraps
  * (`filter(split(lower(text), "[^a-z0-9]+"), _ =!= "")` tokenization,
  * then `array_distinct(transform(sequence(...), concat_ws(" ", ...)))`)
  * but with none of its interpreted-lambda machinery: tokenization is a
  * byte scan for ASCII `[a-z0-9]+` runs of the (Unicode-aware)
  * lowercased text — exactly the complement-split's tokens, since UTF-8
  * continuation bytes can never be ASCII alphanumerics — shingles are
  * built by slicing token runs with a single space separator, and dedup
  * preserves first-occurrence order like `array_distinct`.
  *
  * Fewer than n tokens yields an empty array (the relational form's
  * short-text guard). NULL text yields NULL (null-intolerant unary).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"word_shingles requires n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WordShingles.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  @inline private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Called from generated code. */
  def shingle(input: UTF8String, n: Int): ArrayData = {
    val bytes = input.toLowerCase.getBytes
    // token runs as (start, end) offsets
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < bytes.length) {
      if (isTokenByte(bytes(i))) {
        val s = i
        while (i < bytes.length && isTokenByte(bytes(i))) i += 1
        starts.add(s); ends.add(i)
      } else i += 1
    }
    val nTok = starts.size()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var t = 0
    while (t <= nTok - n) {
      var len = n - 1 // separators
      var k = 0
      while (k < n) { len += ends.get(t + k) - starts.get(t + k); k += 1 }
      val out = new Array[Byte](len)
      var pos = 0
      k = 0
      while (k < n) {
        if (k > 0) { out(pos) = ' '; pos += 1 }
        val l = ends.get(t + k) - starts.get(t + k)
        System.arraycopy(bytes, starts.get(t + k), out, pos, l)
        pos += l
        k += 1
      }
      seen.add(UTF8String.fromBytes(out))
      t += 1
    }
    val arr = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  def wordShingles(text: Column, n: Int): Column =
    column(WordShingles(expression(text), n))
}
