package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k MinHash signature elements in ONE pass over the shingle array —
  * value-identical to `(1 to k).map(i => array_min(transform(shs, s =>
  * md5(concat(lit(s"$i:"), s)))))` (Sim.minhashSignature's original
  * relational form) but avoiding its three scale problems:
  *
  *   1. higher-order `transform` is CodegenFallback — interpreted
  *      per-element lambda with boxing, k times per row;
  *   2. built-in `md5` allocates a `MessageDigest` per CALL via
  *      commons-codec — under 32 threads the JCA provider lookup
  *      serializes (the `Sha256HexLower` lesson, applied k×|shingles|
  *      times per row here);
  *   3. k intermediate hex-string ARRAYS are materialized per row just
  *      to take their mins.
  *
  * This expression keeps a thread-local digest, loops shingles once
  * updating all k running mins (byte-wise compare on lowercase hex =
  * the exact lexicographic order `array_min` uses on strings), and
  * materializes nothing but the k result strings.
  */
case class MinHashHex(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 && k <= MinHashHex.MaxK =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"minhash_hex supports 1..${MinHashHex.MaxK} hash functions, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_hex requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def prettyName: String = "minhash_hex"

  override protected def nullSafeEval(input: Any): Any =
    MinHashHex.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MinHashHex.minhash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashHex =
    copy(child = newChild)
}

object MinHashHex {

  val MaxK = 64

  private val local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".getBytes

  /** Cached UTF-8 bytes of the per-hash-function prefix "i:" (1-based). */
  private val Prefixes: Array[Array[Byte]] =
    Array.tabulate(MaxK)(i => s"${i + 1}:".getBytes("UTF-8"))

  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    // hex digits are ASCII (< 0x80): signed byte compare == lexicographic
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    a.length < b.length
  }

  /** Called from generated code. */
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Array[Byte]](k)
    val md = local.get()
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j).getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(Prefixes(i))
          md.update(s)
          val d = md.digest()
          val hex = new Array[Byte](32)
          var b = 0
          while (b < 16) {
            hex(2 * b) = HexChars((d(b) >> 4) & 0xf)
            hex(2 * b + 1) = HexChars(d(b) & 0xf)
            b += 1
          }
          if (mins(i) == null || lessThan(hex, mins(i))) mins(i) = hex
          i += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      out(i) = if (mins(i) == null) null else UTF8String.fromBytes(mins(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def minhashHex(shingles: Column, k: Int): Column =
    column(MinHashHex(expression(shingles), k))
}
