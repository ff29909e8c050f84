package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit content digest as a native Catalyst expression with
  * whole-stage codegen — the engine's per-row identity invariant.
  *
  * Mirrors the reference's record hash exactly (reference:
  * src/sssom_pydantic/api.py:926-936 `_fnv64`: `h ^= byte; h = h * PRIME
  * mod 2^64` over UTF-8 bytes, emitted as little-endian bytes). Returns
  * the 8 little-endian bytes, so `hex(fnv64(c))` reproduces the
  * reference's uppercase-hex rendering (api.py:924 `.hex().upper()`),
  * e.g. golden vector api.py:911 `'9D59EF306286DC1A'`.
  *
  * A stateless byte fold keeps this inside whole-stage codegen — no UDF
  * boxing, null tracking preserved (SURVEY.md §4: "avoid Scala UDFs").
  */
case class Fnv64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fnv64 requires string or binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def prettyName: String = "fnv64"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = child.dataType match {
      case StringType => input.asInstanceOf[UTF8String].getBytes
      case BinaryType => input.asInstanceOf[Array[Byte]]
      case other => throw new IllegalStateException(s"fnv64: unsupported type $other")
    }
    Fnv64.hashToLittleEndianBytes(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toBytes = child.dataType match {
      case StringType => (v: String) => s"$v.getBytes()"
      case _ => (v: String) => v
    }
    nullSafeCodeGen(ctx, ev, input => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = ${toBytes(input)};
         |long $h = ${Fnv64.Offset}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h ^= ($bytes[$i] & 0xffL);
         |  $h *= ${Fnv64.Prime}L;
         |}
         |${ev.value} = graft.expr.Fnv64.longToLittleEndianBytes($h);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

object Fnv64 {
  /** FNV64 constants (api.py:928-929); 2^64 wrap is free on JVM longs. */
  val Prime: Long = 1099511628211L
  val Offset: Long = -3750763034362895579L // 14695981039346656037 as signed

  def hash(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  /** Called from generated code. */
  def longToLittleEndianBytes(h: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((h >>> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  def hashToLittleEndianBytes(bytes: Array[Byte]): Array[Byte] =
    longToLittleEndianBytes(hash(bytes))

  /** Column API: 8 little-endian digest bytes. */
  def fnv64(c: Column): Column = column(Fnv64(expression(c)))

  /** Reference-format digest: uppercase hex of the little-endian bytes. */
  def fnv64Hex(c: Column): Column =
    org.apache.spark.sql.functions.hex(fnv64(c))
}
