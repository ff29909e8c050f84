package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Declared dynamic extra columns with typed casts — the reference's
  * extension-slot mechanism (reference: src/sssom_pydantic/api.py:818-867
  * `ExtensionDefinition` with an XSD type hint per slot, values parsed by
  * the declared datatype api.py:734-754, name collisions with built-in
  * columns rejected io.py:874-880).
  */
object ExtensionSlots {

  final case class Slot(name: String, sparkType: String)

  /** Built-in columns an extension may never shadow. */
  val CoreColumns: Set[String] =
    Set("url", "warc_ts", "html", "text", "lang", "part", "doc_id")

  /** Validate declarations (collision + duplicate check) and cast each
    * declared column to its type. Missing columns are an error — slots
    * are declared because the data carries them.
    *
    * The pseudo-type `"curie"` parses the value as a CURIE through the
    * prefix map instead of a Spark cast (the reference's extension-slot
    * reference parse, api.py:751-754 / tests/test_extension_slots.py:180
    * `test_extension_slot_curie`): known-prefix values expand to the
    * full URI, unknown prefixes and non-CURIE strings pass through.
    */
  /** Non-throwing declaration report — one row per declared slot name
    * with the verdicts [[applySlots]] enforces as `require`s (reference
    * io.py:874-880 rejects shadowing built-ins; api.py:843-849 expects
    * declared slots present in the data): whether the name shadows a
    * core column, whether the table's own schema carries it, and the
    * combined verdict (`shadows_core` takes precedence). The schema
    * argument comes from the table's parquet footer, so the report is a
    * cross-engine surface: DuckDB reproduces `present_in_data` with its
    * OWN footer introspection (DESCRIBE), like the append-compat check.
    * Driver-sized by contract: slot lists are hand-written declarations.
    */
  def declarationReport(spark: SparkSession, slots: Seq[String],
                        schema: StructType,
                        core: Set[String] = CoreColumns): DataFrame = {
    import spark.implicits._
    val present = schema.fieldNames.toSet
    slots.map { n =>
      val shadows = core.contains(n)
      val inData = present.contains(n)
      val verdict =
        if (shadows) "shadows_core"
        else if (!inData) "missing_from_data"
        else "ok"
      (n, shadows, inData, verdict)
    }.toDF("slot_name", "shadows_core", "present_in_data", "verdict")
  }

  def applySlots(df: DataFrame, slots: Seq[Slot]): DataFrame = {
    val dupes = slots.groupBy(_.name).collect { case (n, ss) if ss.size > 1 => n }
    require(dupes.isEmpty, s"duplicate extension slots: ${dupes.mkString(", ")}")
    val collisions = slots.map(_.name).filter(CoreColumns.contains)
    require(collisions.isEmpty,
      s"extension slots shadow built-in columns: ${collisions.mkString(", ")}")
    val missing = slots.map(_.name).filterNot(df.columns.contains)
    require(missing.isEmpty, s"declared slots absent from data: ${missing.mkString(", ")}")
    slots.foldLeft(df)((d, s) => d.withColumn(s.name,
      if (s.sparkType == "curie") graft.canonical.Canonical.expandCurie(col(s.name))
      else col(s.name).cast(s.sparkType)))
  }
}
