package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.query.SetOps

/** The canonical-write ("format") pipeline — the reference's flagship CLI
  * operation (reference: src/sssom_pydantic/io.py:974-1009 `format` →
  * io.py:239-315 `write`): optional anti-join exclude, dedup by canonical
  * key (arg-max), canonical sort, dynamic column pruning, and
  * condensation (single-valued columns hoisted to metadata).
  */
object Formatter {

  /** exclude → dedup → sort, the write-path row pipeline (io.py:285-290).
    * `ord` breaks duplicate-key ties (arg-max, process.py:124-127).
    */
  def canonicalize(df: DataFrame, key: Column, ord: Column,
                   payload: Seq[String], sortCols: Seq[Column],
                   exclude: Option[DataFrame] = None,
                   excludeKey: Option[Column] = None): DataFrame = {
    val afterExclude = exclude match {
      case Some(ex) => SetOps.excludeByKey(df, ex, excludeKey.getOrElse(key))
      case None => df
    }
    Dedup.uniqueByKey(afterExclude, key, ord, payload)
      .orderBy(sortCols: _*)
  }

  /** Columns that contain at least one non-null, non-empty value — the
    * dynamic column-pruning pre-pass (io.py:513-545). One aggregate pass;
    * driver-side result is one boolean per column.
    */
  def presentColumns(df: DataFrame, candidates: Seq[String]): Seq[String] = {
    val aggs = candidates.map(c =>
      max(when(col(c).isNotNull && col(c).cast("string") =!= "", 1).otherwise(0)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // max over ZERO rows is null — an empty input has no present columns,
    // not an NPE
    candidates.zipWithIndex.collect {
      case (c, i) if !row.isNullAt(i) && row.getInt(i) == 1 => c }
  }

  /** Condensation (io.py:484-510): per column, if exactly one distinct
    * non-null value exists across all rows, emit (col_name, value) — the
    * reference hoists these into frontmatter metadata. Long format so the
    * result is a DataFrame (and oracle-comparable).
    */
  def condensable(df: DataFrame, candidates: Seq[String]): DataFrame = {
    // "exactly one distinct non-null value" as min = max on the ORIGINAL
    // column (true iff >= 1 non-null and all equal), NOT countDistinct:
    // one distinct aggregate per candidate triggers Catalyst's Expand —
    // the input multiplied by |candidates| before the shuffle — while
    // min/max stay plain partial aggregates in ONE pass
    val aggs = candidates.flatMap(c => Seq(
      (min(col(c)) === max(col(c))).as(s"u_$c"),
      min(col(c).cast("string")).as(s"v_$c")))
    val g = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(candidates.map(c => struct(
      lit(c).as("col_name"),
      col(s"u_$c").as("uniform"),
      col(s"v_$c").as("value"))): _*)
    g.select(explode(entries).as("e"))
      .select(col("e.col_name"), col("e.value"))
      .where(col("e.uniform"))
  }

  /** Default propagation (constants.py:81-102, api.py:681-693): fill
    * missing values from set-level metadata — a broadcast-free coalesce
    * since defaults are literals.
    */
  def propagateDefaults(df: DataFrame, defaults: Map[String, String]): DataFrame =
    defaults.foldLeft(df) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), lit(v)))
    }
}
