package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.query.SetOps
import graft.text.TextOps

/** ScalaCheck properties (SURVEY §5 plan): dedup idempotence, salted ≡
  * plain, venn partition completeness, fingerprint determinism.
  * Case count kept small — every case runs Spark jobs.
  */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpecBase.session
  import spark.implicits._

  private val rowGen = for {
    key <- Gen.oneOf("a", "b", "c", "d", "hot")
    id <- Gen.choose(0L, 1000L)
    score <- Gen.choose(0, 9)
  } yield (key, id, score)

  private val rowsGen = Gen.nonEmptyListOf(rowGen)

  property("dedup is idempotent and salted variant is identical") =
    Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "id", "score")
      val ord = struct(col("score"), col("id"))
      val once = Dedup.uniqueByKey(df, col("k"), ord, Seq("id", "score"))
      val a = once.collect().map(_.mkString("|")).toSet
      val again = Dedup.uniqueByKey(
        once.withColumnRenamed("key", "k"), col("k"),
        struct(col("score"), col("id")), Seq("id", "score"))
        .collect().map(_.mkString("|")).toSet
      val salted = Dedup.uniqueByKeySalted(df, col("k"), ord, Seq("id", "score"), 4)
        .collect().map(_.mkString("|")).toSet
      a == again && a == salted && a.size == rows.map(_._1).distinct.size
    }

  property("venn split covers the union exactly once") =
    Prop.forAll(Gen.listOf(Gen.choose(0, 30)), Gen.listOf(Gen.choose(0, 30))) { (l, r) =>
      val sides = SetOps.vennSplit(l.toDF("k"), r.toDF("k"), "k").collect()
        .map(x => x.getInt(0) -> x.getString(1)).toMap
      sides.keySet == (l.toSet ++ r.toSet) &&
        sides.forall { case (k, side) =>
          side match {
            case "both" => l.contains(k) && r.contains(k)
            case "left_only" => l.contains(k) && !r.contains(k)
            case "right_only" => !l.contains(k) && r.contains(k)
          }
        }
    }

  property("fingerprint is a pure function of the token sequence") =
    Prop.forAll(Gen.listOfN(6, Gen.oneOf("alpha", "beta", "gamma", "42"))) { words =>
      val text = words.mkString(" ")
      val df = Seq((1L, text), (2L, text), (3L, text.reverse)).toDF("doc_id", "text")
      val m = TextOps.fingerprints(df, "text").collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      m(1L) == m(2L)
    }

  property("invert under retain policy is an involution (process.py:409-465)") =
    Prop.forAll(Gen.nonEmptyListOf(for {
      id <- Gen.choose(0L, 1000L)
      pred <- Gen.oneOf(graft.mutate.Curate.InversionMap.keys.toSeq)
      just <- Gen.oneOf("semapv:LexicalMatching", "semapv:ManualMappingCuration")
    } yield (id, s"ex1:s$id", s"s $id", pred, null.asInstanceOf[String],
      s"wd:Q$id", s"o $id", just))) { rows =>
      val df = rows.toDF("mapping_id", "subject_id", "subject_label",
        "predicate_id", "predicate_modifier", "object_id", "object_label",
        "justification")
      def invAll(d: org.apache.spark.sql.DataFrame) =
        graft.mutate.Curate.invertByPredicate(d, lit(true), derivePolicy = false)
          .drop("derived_from")
      val once = invAll(df)
      val twice = invAll(once)
      // retain policy keeps the original justification, so nothing blocks
      // the second inversion and the double swap restores the original
      twice.collect().map(_.mkString("|")).sorted
        .sameElements(df.collect().map(_.mkString("|")).sorted) &&
        once.filter(col("subject_id") === col("object_id")).count() == 0
    }

  property("GK sketch always lands inside its exact rank window") =
    Prop.forAll(Gen.nonEmptyListOf(for {
      part <- Gen.choose(0, 2)
      v <- Gen.choose(0L, 5000L)
    } yield (part, v))) { rows =>
      graft.stats.Stats.quantilesChecked(rows.toDF("part", "len"), col("len"))
        .collect().forall(_.getBoolean(4))
    }

  property("hotKeys estimate is exact on mod-aligned duplicates and flags only sampled-hot keys") =
    Prop.forAll(Gen.choose(4, 40), Gen.choose(1L, 3L)) { (hotN, threshold) =>
      // key "hot" occupies ids 0..4*hotN-1 (so exactly hotN sampled);
      // singles occupy ids NOT divisible by 4 (never sampled)
      val rows = (0L until 4L * hotN).map(i => ("hot", i)) ++
        Seq(("a", 4L * hotN + 1), ("b", 4L * hotN + 2))
      val got = Dedup.hotKeys(rows.toDF("k", "id"), col("k"), col("id"),
          mod = 4, threshold = threshold)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      (hotN >= threshold) == got.contains("hot") &&
        got.get("hot").forall(_ == ((hotN.toLong, 4L * hotN))) &&
        !got.contains("a") && !got.contains("b")
    }
}
