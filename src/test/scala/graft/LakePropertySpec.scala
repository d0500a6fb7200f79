package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{LakeTable, LakeTableConfig}

/** Property-based upsert laws (SURVEY.md §5.4): idempotence, disjoint-key
  * commutativity, and latest-wins under random interleavings, checked
  * against an in-memory model. Small case counts — every case spins real
  * Spark jobs.
  */
class LakePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    .getOrCreate()

  private type Rec = (Long, Int, String, Int) // pk, vendorid, payload, ts

  private def table(): LakeTable = LakeTable(spark, LakeTableConfig(
    Files.createTempDirectory("lakeprop").resolve("t").toString,
    Seq("pk"), "ts", partitionCols = Seq("vendorid")))

  private def toDf(rows: Seq[Rec]): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "vendorid", "payload", "ts")
  }

  private def snap(t: LakeTable): Set[Rec] = {
    import spark.implicits._
    t.read().select($"pk", $"vendorid", $"payload", $"ts")
      .as[Rec].collect().toSet
  }

  private val recGen: Gen[Rec] = for {
    pk <- Gen.choose(1L, 6L)
    vid <- Gen.choose(1, 2)
    payload <- Gen.alphaStr.map(_.take(4))
    ts <- Gen.choose(0, 5)
  } yield (pk, vid, payload, ts)

  private val batchGen: Gen[List[Rec]] = Gen.listOfN(4, recGen)

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(4), prop)
    assert(res.passed, s"$name: $res")
  }

  test("upsert is idempotent for arbitrary batches") {
    check("idempotence", Prop.forAll(batchGen) { rows =>
      val t = table()
      t.upsert(toDf(rows))
      val once = snap(t)
      t.upsert(toDf(rows))
      snap(t) == once
    })
  }

  test("upserts of disjoint-key batches commute") {
    check("commutativity", Prop.forAll(batchGen, batchGen) { (a0, b0) =>
      val a = a0.filter(_._1 <= 3)
      val b = b0.filter(_._1 > 3)
      val t1 = table(); val t2 = table()
      if (a.nonEmpty) t1.upsert(toDf(a))
      if (b.nonEmpty) t1.upsert(toDf(b))
      if (b.nonEmpty) t2.upsert(toDf(b))
      if (a.nonEmpty) t2.upsert(toDf(a))
      // both sides can filter to empty (a rare but legal draw): neither
      // table then EXISTS, and snap on a never-written table has no
      // schema to select — the commuting claim is vacuously true there
      (a.isEmpty && b.isEmpty) || snap(t1) == snap(t2)
    })
  }

  test("maintenance law: compact/compactSmall/recluster/clean never change the snapshot") {
    val morTable = () => LakeTable(spark, LakeTableConfig(
      Files.createTempDirectory("lakeprop").resolve("t").toString,
      Seq("pk"), "ts", partitionCols = Seq("vendorid"),
      storageType = "mor", clusterCols = Seq("ts"), statsCols = Seq("ts")))
    val opGen = Gen.listOfN(3, Gen.choose(0, 3))
    check("maintenance-invariance", Prop.forAll(batchGen, batchGen, opGen) {
      (a, b, ops) =>
        val t = morTable()
        t.upsert(toDf(a))
        t.upsert(toDf(b))
        val before = snap(t)
        ops.foreach {
          case 0 => t.compact()
          case 1 => t.compactSmall()
          case 2 => t.recluster()
          case 3 => t.clean(retain = 2)
        }
        snap(t) == before
    })
  }

  test("schema evolution law: widened upsert wins and backfills nulls") {
    check("schema-evolution", Prop.forAll(batchGen, batchGen) { (a, b) =>
      import spark.implicits._
      val t = table()
      if (a.nonEmpty) t.upsert(toDf(a))
      // widened batch carries a NEW column and ts=6 (> any generated ts),
      // so its rows always win their (partition, key)
      val widened = b.map { case (pk, vid, _, _) => (pk, vid, s"w$pk", 6, s"n$pk") }
      if (widened.nonEmpty)
        t.upsert(widened.toDF("pk", "vendorid", "payload", "ts", "note"))
      val out =
        if (widened.isEmpty) // schema never widened: no note column exists
          t.read().select($"pk", $"vendorid", $"payload", $"ts")
            .as[(Long, Int, String, Int)].collect().toSet
            .map((r: (Long, Int, String, Int)) => (r._1, r._2, r._3, r._4, None: Option[String]))
        else
          t.read().select($"pk", $"vendorid", $"payload", $"ts", $"note")
            .as[(Long, Int, String, Int, Option[String])].collect().toSet
      // model: base winners (note null) overridden by widened rows (note set)
      val baseW = a.zipWithIndex
        .groupBy { case (r, _) => (r._1, r._2) }
        .values.map(_.maxBy { case (r, ri) => (r._4, ri) }._1)
        .map(r => (r._1, r._2) -> ((r._1, r._2, r._3, r._4, None: Option[String]))).toMap
      val wideW = widened
        .groupBy(r => (r._1, r._2))
        .values.map(_.last)
        .map(r => (r._1, r._2) -> ((r._1, r._2, r._3, r._4, Some(r._5): Option[String]))).toMap
      out == (baseW ++ wideW).values.toSet
    })
  }

  test("change feed law: applying changes to the old snapshot yields the new") {
    check("cdc-reconstruction", Prop.forAll(batchGen, batchGen) { (a, b) =>
      import spark.implicits._
      val t = table()
      t.upsert(toDf(a.nonEmptyOr((1L, 1, "seed", 0))))
      val c0 = t.log.latestId.get
      if (b.nonEmpty) t.upsert(toDf(b))
      t.delete(toDf(Seq((1L, 1, "x", 0))))  // always delete key (1,1)
      val cN = t.log.latestId.get
      val changes = t.changesBetween(c0, cN)
        .select($"_change_type", $"pk", $"vendorid", $"payload", $"ts")
        .as[(String, Long, Int, String, Int)].collect()
      // reconstruct: old snapshot minus deleted/updated keys, plus
      // insert/update rows — must equal the new snapshot exactly
      val old = t.readAsOf(c0).select($"pk", $"vendorid", $"payload", $"ts")
        .as[Rec].collect().toSet
      val touched = changes.map(c => (c._2, c._3)).toSet
      val rebuilt = old.filterNot(r => touched.contains((r._1, r._2))) ++
        changes.filter(_._1 != "delete").map(c => (c._2, c._3, c._4, c._5))
      rebuilt == snap(t)
    })
  }

  private implicit class NonEmptyOr(rows: List[Rec]) {
    def nonEmptyOr(r: Rec): List[Rec] = if (rows.nonEmpty) rows else List(r)
  }

  test("overwriteWhere law: region replaced, rest untouched, batch deduped") {
    check("replace-where", Prop.forAll(batchGen, batchGen) { (seed, repl0) =>
      val t = table()
      val seeded = if (seed.nonEmpty) seed else List((1L, 1, "x", 0): Rec)
      t.upsert(toDf(seeded))
      // batch rows forced into the replaced region (vendorid = 1) — the
      // predicate constraint requires it
      val repl = repl0.map(r => (r._1, 1, r._3, r._4))
      t.overwriteWhere(org.apache.spark.sql.functions.col("vendorid") === 1,
        toDf(repl))
      // model: vendorid≠1 survivors of the seed's latest-wins, plus the
      // batch collapsed per key by (ts, arrival) — an empty batch just
      // clears the region
      val survivors = seeded.zipWithIndex
        .groupBy { case (r, _) => (r._1, r._2) }
        .values.map(_.maxBy { case (r, ri) => (r._4, ri) }._1)
        .filter(_._2 != 1).toSet
      val inserted = repl.zipWithIndex
        .groupBy { case (r, _) => r._1 }
        .values.map(_.maxBy { case (r, ri) => (r._4, ri) }._1)
        .toSet
      snap(t) == survivors ++ inserted
    })
  }

  test("latest (ts, arrival) wins per (partition, key) against a model") {
    check("latest-wins", Prop.forAll(Gen.listOfN(3, batchGen)) { batches =>
      val t = table()
      batches.filter(_.nonEmpty).foreach(b => t.upsert(toDf(b)))
      // model: per (partition, key), max by (ts, batch index, row index)
      val model = batches.zipWithIndex
        .flatMap { case (b, bi) => b.zipWithIndex.map { case (r, ri) => (r, bi, ri) } }
        .groupBy { case (r, _, _) => (r._1, r._2) } // (pk, vendorid)
        .values.map(_.maxBy { case (r, bi, ri) => (r._4, bi, ri) }._1)
        .toSet
      batches.forall(_.isEmpty) || snap(t) == model
    })
  }
}
