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

  /** Append with the reference's header-compatibility contract
    * (io.py:381-387): the incoming schema must not introduce columns the
    * table doesn't already have; missing columns are an error too (strict
    * by-name match, order-insensitive, like Iceberg's write contract).
    */
  def appendWithSchemaCheck(spark: SparkSession, df: DataFrame, root: String): Unit = {
    if (exists(spark, root)) {
      val existing = spark.read.parquet(root).schema
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
      // align column order to the table's
      val aligned = df.select(existing.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      aligned.write.mode("append").parquet(root)
    } else {
      df.write.mode("error").parquet(root)
    }
  }
}
