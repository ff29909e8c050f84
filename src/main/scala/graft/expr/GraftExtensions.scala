package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Hex, Literal}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * same codegen'd primitives as the Column API
  * (`fnv64(col)`, `fnv64_hex(col)`, `cosine_sim(a, b)`).
  *
  * Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  * or config: spark.sql.extensions=graft.expr.GraftExtensions
  */
object GraftExtensions {

  /** name → (usage, min arity, max arity, builder). One table drives both
    * registration paths, and every builder goes through an arity check so
    * a wrong-arg-count call fails with the function's usage line instead
    * of a raw IndexOutOfBoundsException.
    */
  private[expr] val functions: Seq[(String, String, Int, Int, Seq[Expression] => Expression)] = Seq(
    ("fnv64", "fnv64(expr) - FNV-1a 64-bit digest as 8 little-endian bytes",
      1, 1, args => Fnv64(args.head)),
    ("fnv64_hex", "fnv64_hex(expr) - FNV-1a 64 digest, uppercase hex",
      1, 1, args => Hex(Fnv64(args.head))),
    ("cosine_sim", "cosine_sim(a, b) - cosine similarity of two array<double>",
      2, 2, args => CosineSim(args(0), args(1))),
    ("simhash60", "simhash60(tokens) - 60-bit SimHash of an array<string>",
      1, 1, args => SimHash60(args.head)),
    ("minhash_hex",
      "minhash_hex(shingles, k) - k MinHash signature elements (lex-min md5 hex) in one pass",
      2, 2, args => MinHashHex(args(0), literalInt(args(1), "minhash_hex"))),
    ("word_shingles",
      "word_shingles(text, n) - distinct word n-gram shingles, one-pass tokenize+slice",
      2, 2, args => WordShingles(args(0), literalInt(args(1), "word_shingles"))),
    ("lsh_buckets",
      "lsh_buckets(vec, dim, nPlanes, nTables[, planeOffset]) - hyperplane LSH bucket ids, one per table",
      4, 5, args => LshBuckets(args(0),
        literalInt(args(1), "lsh_buckets"),
        literalInt(args(2), "lsh_buckets"),
        literalInt(args(3), "lsh_buckets"),
        if (args.length > 4) literalInt(args(4), "lsh_buckets") else 0)))

  private def checked(name: String, usage: String, min: Int, max: Int,
                      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length < min || args.length > max)
        throw new IllegalArgumentException(
          s"$name expects ${if (min == max) s"$min" else s"$min to $max"} arguments, " +
            s"got ${args.length}; usage: $usage")
      build(args)
    }

  /** Register the same functions on an already-running session (the
    * builder-time extension path can't attach to an existing context).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graftbridge.Bridge.registerFunction
    functions.foreach { case (name, usage, min, max, build) =>
      registerFunction(spark, name, checked(name, usage, min, max, build))
    }
  }

  /** Integral literal of any width (constant folding may deliver
    * TINYINT..BIGINT) narrowed to Int.
    */
  private[expr] def literalInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) if v.isValidInt => v.toInt
    case Literal(v: Short, _) => v.toInt
    case Literal(v: Byte, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: parameter must be an integer literal, got $other")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit =
    // same checked() wrapper as register(): ONE arity-guard
    // implementation for both registration paths
    GraftExtensions.functions.foreach { case (name, usage, min, max, build) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        info(name, usage),
        GraftExtensions.checked(name, usage, min, max, build)))
    }
}
