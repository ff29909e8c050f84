package graft

import org.apache.spark.sql.functions._
import graft.constraints.{Coercible, Constraints}
import graft.io.Formatter
import graft.runner.Runner
import graft.schema.ExtensionSlots

class SlotsCoerceSpec extends SparkSpecBase {
  import spark.implicits._

  test("Coercible flags non-null strings whose cast nulls out") {
    val df = Seq((0, "123"), (0, "4.5x"), (0, "")).toDF("part", "v")
    val got = Runner.violations(df, Seq(Coercible("v_is_int", "v", "int")), Seq("v"))
      .select("v").collect().map(_.getString(0)).toSet
    assert(got == Set("4.5x")) // "" is not applicable (required-check territory)
  }

  test("extension slots: typed cast, collisions and dupes rejected") {
    val df = Seq((1L, "7", "2026-01-01")).toDF("doc_id", "score", "seen")
    val typed = ExtensionSlots.applySlots(df, Seq(
      ExtensionSlots.Slot("score", "int"), ExtensionSlots.Slot("seen", "date")))
    assert(typed.schema("score").dataType.typeName == "integer")
    assert(typed.schema("seen").dataType.typeName == "date")
    // curie pseudo-type: reference parse through the prefix map
    // (tests/test_extension_slots.py:180); unknown prefix passes through
    val cdf = Seq((1L, "wd:Q42"), (2L, "nope:X"), (3L, "plain")).toDF("doc_id", "ref")
    val refs = ExtensionSlots.applySlots(cdf, Seq(ExtensionSlots.Slot("ref", "curie")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(refs(1L) == "https://www.wikidata.org/wiki/Q42")
    assert(refs(2L) == "nope:X" && refs(3L) == "plain")
    intercept[IllegalArgumentException] {
      ExtensionSlots.applySlots(df, Seq(ExtensionSlots.Slot("url", "string")))
    }
    intercept[IllegalArgumentException] {
      ExtensionSlots.applySlots(df, Seq(
        ExtensionSlots.Slot("score", "int"), ExtensionSlots.Slot("score", "long")))
    }
    intercept[IllegalArgumentException] {
      ExtensionSlots.applySlots(df, Seq(ExtensionSlots.Slot("absent", "int")))
    }
  }

  test("extension slots: declarationReport verdicts mirror applySlots") {
    val df = Seq((1L, "7")).toDF("doc_id", "score")
    val rep = ExtensionSlots.declarationReport(spark,
      Seq("url", "score", "absent"), df.schema)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getString(3)))).toMap
    // shadows_core wins even when the column is absent from the data
    assert(rep("url") == ((true, false, "shadows_core")))
    assert(rep("score") == ((false, true, "ok")))
    assert(rep("absent") == ((false, false, "missing_from_data")))
    // every non-ok verdict is a require in applySlots (lockstep check)
    rep.collect { case (n, (_, _, v)) if v == "shadows_core" => n }.foreach { n =>
      intercept[IllegalArgumentException] {
        ExtensionSlots.applySlots(df, Seq(ExtensionSlots.Slot(n, "string")))
      }
    }
  }

  test("formatter: present columns, condensation, default propagation") {
    val df = Seq(
      (Some("a"), None: Option[String], "const"),
      (Some("b"), None, "const")).toDF("x", "y", "z")
    assert(Formatter.presentColumns(df, Seq("x", "y", "z")) == Seq("x", "z"))
    val cond = Formatter.condensable(df, Seq("x", "y", "z"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cond == Map("z" -> "const"))
    val prop = Formatter.propagateDefaults(df, Map("y" -> "dflt"))
      .select("y").collect().map(_.getString(0)).toSet
    assert(prop == Set("dflt"))
  }
}
