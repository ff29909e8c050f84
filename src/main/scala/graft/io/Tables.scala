package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal Iceberg-style table layer over partitioned Parquet.
  *
  * `/opt/spark/jars` ships no iceberg-runtime, so v1 emulates the two
  * Iceberg contracts the engine relies on (SURVEY §7.1 note):
  *   1. append with schema enforcement — the reference's header
  *      compatibility check on file append (io.py:361-391: "no new
  *      columns may be introduced");
  *   2. a monotonic snapshot manifest (see [[graft.ckpt.Checkpoint]])
  *      for resume.
  * Swapping in a real Iceberg catalog touches only this package.
  */
object Tables {

  def exists(spark: SparkSession, root: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path)
  }

  /** Write a table partitioned by the given column (the "per-partition"
    * unit for verdicts/stats/lineage — a TABLE partition, never a Spark
    * task partition).
    */
  def writePartitioned(df: DataFrame, root: String,
                       partitionCol: String = "part",
                       mode: String = "error"): Unit =
    df.write.mode(mode).partitionBy(partitionCol).parquet(root)

  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(root)

  /** Write a table hash-BUCKETED by `bucketCol` (sorted within buckets) —
    * the storage layout that amortizes the url shuffle: pay one
    * write-time repartition, then every url-keyed join / aggregate /
    * anti join over the table plans with ZERO exchanges (BucketSpec).
    * This is the single-box twin of an Iceberg `bucket(N, url)` partition
    * transform (north rule: explicit repartitioning by url-hash).
    *
    * Bucketing metadata lives in the session catalog (Spark cannot
    * express bucketed writes path-only), so the table gets a NAME;
    * `path` keeps the files outside the warehouse for test hygiene.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String = "url", buckets: Int = 8,
                    mode: String = "error"): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .option("path", path).format("parquet").saveAsTable(table)

  /** The header-compatibility contract shared by both append paths
    * (io.py:381-387): no new columns, no missing columns, no type
    * changes — strict by-name match, order-insensitive, like Iceberg's
    * write contract. Returns the incoming frame realigned to the
    * table's column order.
    */
  private def checkAndAlign(existing: org.apache.spark.sql.types.StructType,
                            df: DataFrame): DataFrame = {
    val issues = compatIssues(existing, df.schema).filter(_.status != "ok")
    require(issues.isEmpty,
      "append header incompatible: " +
        issues.map(i => s"${i.col} (${i.status})").mkString(", "))
    df.select(existing.fieldNames.map(org.apache.spark.sql.functions.col): _*)
  }

  /** One header-compat verdict row: `status` ∈ ok / new_column /
    * missing_column / type_changed (reference io.py:381-387 raises on
    * the first mismatch; the report form makes ALL of them visible).
    * Types are rendered in DuckDB vocabulary ([[duckTypeName]]) so the
    * report is directly comparable to `DESCRIBE`-based introspection —
    * the `f_append_compat` gate entry hash-checks this report against
    * DuckDB's own independent read of the same parquet footer.
    */
  final case class CompatIssue(col: String, existing_type: Option[String],
                               incoming_type: Option[String], status: String)

  /** The header-compatibility verdicts shared by [[checkAndAlign]] (which
    * requires all-ok) and [[schemaCompatReport]] (which surfaces them):
    * strict by-name match, order-insensitive.
    */
  def compatIssues(existing: org.apache.spark.sql.types.StructType,
                   incoming: org.apache.spark.sql.types.StructType): Seq[CompatIssue] = {
    val have = existing.fields.map(f => f.name -> f.dataType).toMap
    val got = incoming.fields.map(f => f.name -> f.dataType).toMap
    (have.keySet ++ got.keySet).toSeq.sorted.map { c =>
      val (e, i) = (have.get(c), got.get(c))
      val status = (e, i) match {
        case (None, _) => "new_column"
        case (_, None) => "missing_column"
        case (Some(a), Some(b)) if a != b => "type_changed"
        case _ => "ok"
      }
      CompatIssue(c, e.map(duckTypeName), i.map(duckTypeName), status)
    }
  }

  /** [[compatIssues]] as a (driver-sized — schemas ARE driver objects)
    * DataFrame: one row per column of the name union.
    */
  def schemaCompatReport(spark: SparkSession,
                         existing: org.apache.spark.sql.types.StructType,
                         incoming: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    compatIssues(existing, incoming).toDF()
  }

  /** Catalyst type → DuckDB type-name vocabulary, the ONE rendering both
    * engines' introspection must agree on (LOCKSTEP with what DuckDB's
    * `DESCRIBE` prints for a Spark-written parquet footer — Spark writes
    * TIMESTAMP as isAdjustedToUTC micros, which DuckDB reads as
    * TIMESTAMP WITH TIME ZONE).
    */
  def duckTypeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => "VARCHAR"
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case DoubleType => "DOUBLE"
      case FloatType => "FLOAT"
      case BooleanType => "BOOLEAN"
      case BinaryType => "BLOB"
      case DateType => "DATE"
      case TimestampType => "TIMESTAMP WITH TIME ZONE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case ArrayType(e, _) => duckTypeName(e) + "[]"
      case other => other.sql
    }
  }

  /** Bucketed twin of [[appendWithSchemaCheck]]: same header contract,
    * appends THROUGH the catalog so every appended file lands in its
    * url-hash bucket (a plain parquet append would break the layout —
    * Spark validates the bucket spec on catalog appends).
    */
  def appendBucketed(spark: SparkSession, df: DataFrame, table: String,
                     path: String, bucketCol: String = "url",
                     buckets: Int = 8): Unit = {
    if (spark.catalog.tableExists(table)) {
      checkAndAlign(spark.table(table).schema, df).write.mode("append")
        .bucketBy(buckets, bucketCol).sortBy(bucketCol)
        .format("parquet").saveAsTable(table)
    } else writeBucketed(df, table, path, bucketCol, buckets)
  }

  /** Append with the reference's header-compatibility contract
    * (io.py:381-387): the incoming schema must not introduce columns the
    * table doesn't already have; missing columns are an error too (strict
    * by-name match, order-insensitive, like Iceberg's write contract).
    */
  def appendWithSchemaCheck(spark: SparkSession, df: DataFrame, root: String): Unit = {
    if (exists(spark, root)) {
      checkAndAlign(spark.read.parquet(root).schema, df)
        .write.mode("append").parquet(root)
    } else {
      df.write.mode("error").parquet(root)
    }
  }
}
