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
    val have = existing.fields.map(f => f.name -> f.dataType).toMap
    val incoming = df.schema.fields
    val newCols = incoming.filter(f => !have.contains(f.name))
    require(newCols.isEmpty,
      s"append would introduce new columns: ${newCols.map(_.name).mkString(", ")}")
    val missing = have.keySet -- incoming.map(_.name).toSet
    require(missing.isEmpty,
      s"append is missing columns: ${missing.mkString(", ")}")
    val mismatched = incoming.filter(f => have(f.name) != f.dataType)
    require(mismatched.isEmpty,
      s"append would change column types: ${mismatched.map(_.name).mkString(", ")}")
    df.select(existing.fieldNames.map(org.apache.spark.sql.functions.col): _*)
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
