package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
  /** Register the same functions on an already-running session (the
    * builder-time extension path can't attach to an existing context).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graftbridge.Bridge.registerFunction
    registerFunction(spark, "fnv64", args => Fnv64(args.head))
    registerFunction(spark, "fnv64_hex", args =>
      org.apache.spark.sql.catalyst.expressions.Hex(Fnv64(args.head)))
    registerFunction(spark, "cosine_sim", args => CosineSim(args(0), args(1)))
    registerFunction(spark, "simhash60", args => SimHash60(args.head))
    registerFunction(spark, "minhash_hex", args =>
      MinHashHex(args(0), GraftExtensions.literalInt(args(1), "minhash_hex")))
    registerFunction(spark, "word_shingles", args =>
      WordShingles(args(0), GraftExtensions.literalInt(args(1), "word_shingles")))
    registerFunction(spark, "lsh_buckets", args =>
      LshBuckets(args(0),
        GraftExtensions.literalInt(args(1), "lsh_buckets"),
        GraftExtensions.literalInt(args(2), "lsh_buckets"),
        GraftExtensions.literalInt(args(3), "lsh_buckets"),
        if (args.length > 4) GraftExtensions.literalInt(args(4), "lsh_buckets") else 0))
  }

  private[expr] def literalInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: k must be an integer literal, got $other")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fnv64"),
      info("fnv64", "fnv64(expr) - FNV-1a 64-bit digest as 8 little-endian bytes"),
      (args: Seq[Expression]) => Fnv64(args.head)))
    ext.injectFunction((
      FunctionIdentifier("fnv64_hex"),
      info("fnv64_hex", "fnv64_hex(expr) - FNV-1a 64 digest, uppercase hex"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.Hex(Fnv64(args.head))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two array<double>"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(tokens) - 60-bit SimHash of an array<string>"),
      (args: Seq[Expression]) => SimHash60(args.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_hex"),
      info("minhash_hex",
        "minhash_hex(shingles, k) - k MinHash signature elements (lex-min md5 hex) in one pass"),
      (args: Seq[Expression]) =>
        MinHashHex(args(0), GraftExtensions.literalInt(args(1), "minhash_hex"))))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(text, n) - distinct word n-gram shingles, one-pass tokenize+slice"),
      (args: Seq[Expression]) =>
        WordShingles(args(0), GraftExtensions.literalInt(args(1), "word_shingles"))))
    ext.injectFunction((
      FunctionIdentifier("lsh_buckets"),
      info("lsh_buckets",
        "lsh_buckets(vec, dim, nPlanes, nTables[, planeOffset]) - hyperplane LSH bucket ids, one per table"),
      (args: Seq[Expression]) =>
        LshBuckets(args(0),
          GraftExtensions.literalInt(args(1), "lsh_buckets"),
          GraftExtensions.literalInt(args(2), "lsh_buckets"),
          GraftExtensions.literalInt(args(3), "lsh_buckets"),
          if (args.length > 4) GraftExtensions.literalInt(args(4), "lsh_buckets") else 0)))
  }
}
