package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{LakeTable, LakeTableConfig}

/** Schema evolution beyond add-column (VERDICT r4 item #5): type
  * widening through upserts, rename/drop as metadata-only commits with
  * column-identity (`graft.cid`) adaptation on read, dropped-data
  * non-resurrection, incompatible-change rejection, time travel across
  * schema versions, and the ALTER TABLE SQL surface.
  */
class SchemaEvoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("schemaevo").resolve("tbl").toString

  private def cfg(root: String, storage: String = "cow") =
    LakeTableConfig(root, keyCols = Seq("pk"), precombineCol = "ts",
      partitionCols = Seq("part"), storageType = storage)

  private def df(rows: (Long, Int, Int, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "part", "qty", "ts")
  }

  test("upsert widens int -> long; untouched partitions adapt on read") {
    val t = LakeTable(spark, cfg(freshRoot()))
    t.bulkInsert(df((1L, 1, 10, 0), (2L, 2, 20, 0)))
    // partition-2-only upsert with a long qty: partition 1's file keeps
    // the int32 physical type and must upcast at read time
    import spark.implicits._
    t.upsert(Seq((2L, 2, 5000000000L, 1)).toDF("pk", "part", "qty", "ts"))
    val out = t.read().select($"pk", $"qty").as[(Long, Long)].collect().toSet
    assert(t.read().schema("qty").dataType == LongType)
    assert(out == Set((1L, 10L), (2L, 5000000000L)))
  }

  test("widening is monotonic: a later narrow batch upcasts, not narrows") {
    val t = LakeTable(spark, cfg(freshRoot()))
    import spark.implicits._
    t.bulkInsert(Seq((1L, 1, 5000000000L, 0)).toDF("pk", "part", "qty", "ts"))
    t.upsert(df((2L, 1, 7, 1))) // int batch into a long table
    assert(t.read().schema("qty").dataType == LongType)
    assert(t.read().select($"pk", $"qty").as[(Long, Long)].collect().toSet ==
      Set((1L, 5000000000L), (2L, 7L)))
  }

  test("incompatible type change is rejected before any commit publishes") {
    val t = LakeTable(spark, cfg(freshRoot()))
    t.bulkInsert(df((1L, 1, 10, 0)))
    import spark.implicits._
    val bad = Seq((2L, 1, "not a number", 1)).toDF("pk", "part", "qty", "ts")
    intercept[Exception] { t.upsert(bad) }
    assert(t.log.commits.size == 1, "failed evolution must not commit")
    assert(t.read().count() == 1)
  }

  test("renameColumn: old files alias by column id; time travel keeps the old name") {
    val t = LakeTable(spark, cfg(freshRoot()))
    t.bulkInsert(df((1L, 1, 10, 0), (2L, 2, 20, 0)))
    val renameId = t.renameColumn("qty", "quantity")
    import spark.implicits._
    assert(t.read().columns.contains("quantity") && !t.read().columns.contains("qty"))
    assert(t.read().select($"pk", $"quantity").as[(Long, Int)].collect().toSet ==
      Set((1L, 10), (2L, 20)))
    // post-rename upsert writes the new physical name; both generations read
    t.upsert(spark.createDataFrame(Seq((3L, 1, 30, 1)))
      .toDF("pk", "part", "quantity", "ts"))
    assert(t.read().select($"pk", $"quantity").as[(Long, Int)].collect().toSet ==
      Set((1L, 10), (2L, 20), (3L, 30)))
    // time travel to before the rename resolves the OLD schema
    val before = t.readAsOf(renameId - 1)
    assert(before.columns.contains("qty") && !before.columns.contains("quantity"))
    assert(before.select($"pk", $"qty").as[(Long, Int)].collect().toSet ==
      Set((1L, 10), (2L, 20)))
  }

  test("rename of a pinned (key/partition/precombine) column is rejected") {
    val t = LakeTable(spark, cfg(freshRoot()))
    t.bulkInsert(df((1L, 1, 10, 0)))
    intercept[IllegalArgumentException] { t.renameColumn("pk", "id") }
    intercept[IllegalArgumentException] { t.renameColumn("part", "region") }
    intercept[IllegalArgumentException] { t.renameColumn("ts", "version") }
    intercept[IllegalArgumentException] { t.dropColumn("pk") }
  }

  test("dropColumn then re-adding the same name does NOT resurrect old data") {
    val t = LakeTable(spark, cfg(freshRoot()))
    import spark.implicits._
    t.bulkInsert(Seq((1L, 1, 10, 0, "secret-a"), (2L, 2, 20, 0, "secret-b"))
      .toDF("pk", "part", "qty", "ts", "note"))
    t.dropColumn("note")
    assert(!t.read().columns.contains("note"))
    // re-add the same NAME via an upsert that only touches partition 2:
    // partition 1's old file still holds the dropped bytes, but the new
    // column has a fresh id — old values must stay invisible
    t.upsert(Seq((2L, 2, 21, 1, "fresh"))
      .toDF("pk", "part", "qty", "ts", "note"))
    val out = t.read().select($"pk", $"note").as[(Long, Option[String])]
      .collect().toSet
    assert(out == Set((1L, None), (2L, Some("fresh"))))
  }

  test("addColumn/widenColumn metadata-only commits; no data rewrite") {
    val t = LakeTable(spark, cfg(freshRoot()))
    t.bulkInsert(df((1L, 1, 10, 0)))
    val filesBefore = t.log.liveFiles().map(_.path).toSet
    t.addColumn("score", DoubleType)
    t.widenColumn("qty", LongType)
    assert(t.log.liveFiles().map(_.path).toSet == filesBefore,
      "schema commits must not touch data files")
    import spark.implicits._
    assert(t.read().schema("qty").dataType == LongType)
    assert(t.read().select($"pk", $"qty", $"score")
      .as[(Long, Long, Option[Double])].collect().toSet == Set((1L, 10L, None)))
    intercept[IllegalArgumentException] { t.widenColumn("qty", IntegerType) }
  }

  test("MoR: narrow delta batch does not narrow the table; snapshot backfills") {
    val t = LakeTable(spark, cfg(freshRoot(), storage = "mor"))
    import spark.implicits._
    t.bulkInsert(Seq((1L, 1, 10, 0, "keep"), (2L, 2, 20, 0, "also"))
      .toDF("pk", "part", "qty", "ts", "note"))
    // delta append WITHOUT the note column — the table schema keeps it
    t.upsert(df((3L, 1, 30, 1)))
    val out = t.read().select($"pk", $"qty", $"note")
      .as[(Long, Int, Option[String])].collect().toSet
    assert(out == Set((1L, 10, Some("keep")), (2L, 20, Some("also")),
      (3L, 30, None)))
    // and after compaction everything is physically current-schema
    t.compact()
    assert(t.read().select($"pk", $"qty", $"note")
      .as[(Long, Int, Option[String])].collect().toSet == out)
  }

  test("null-backfilled columns are declared nullable; IS NOT NULL stays honest") {
    val t = LakeTable(spark, cfg(freshRoot(), storage = "mor"))
    import spark.implicits._
    // qty is non-nullable in the batch schema (Int from tuples)
    t.bulkInsert(Seq((1L, 1, 10, 0)).toDF("pk", "part", "qty", "ts"))
    // delta WITHOUT qty: its rows null-backfill — if the evolved schema
    // kept qty non-nullable, Spark would elide `qty IS NOT NULL` into
    // `true` and return the backfilled row
    t.upsert(Seq((2L, 1, 1)).toDF("pk", "part", "ts"))
    assert(t.read().schema("qty").nullable,
      "a column absent from a commit's files must read as nullable")
    assert(t.read().filter($"qty".isNotNull).select($"pk")
      .as[Long].collect().toSet == Set(1L),
      "IS NOT NULL must not be optimized away over backfilled nulls")
    assert(t.read().filter($"qty".isNull).select($"pk")
      .as[Long].collect().toSet == Set(2L))
  }

  test("stats skipping stays correct across a widening (file-type parse)") {
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts", partitionCols = Seq("part"),
      statsCols = Seq("qty")))
    t.bulkInsert(df((1L, 1, 10, 0), (2L, 2, 1000, 0)))
    import spark.implicits._
    t.upsert(Seq((3L, 3, 6000000000L, 1)).toDF("pk", "part", "qty", "ts"))
    // predicate above int range: only the widened file can match; the
    // int-era files' stats must parse in THEIR type and prune correctly
    assert(t.read(col("qty") > 5000000000L).select($"pk")
      .as[Long].collect().toSet == Set(3L))
    assert(t.read(col("qty") <= lit(10)).select($"pk")
      .as[Long].collect().toSet == Set(1L))
  }

  test("shallowClone of an evolved table preserves per-file schemas") {
    val t = LakeTable(spark, cfg(freshRoot()))
    t.bulkInsert(df((1L, 1, 10, 0), (2L, 2, 20, 0)))
    t.renameColumn("qty", "quantity")
    import spark.implicits._
    t.upsert(Seq((3L, 3, 5000000000L, 1))
      .toDF("pk", "part", "quantity", "ts"))
    val clone = t.shallowClone(freshRoot() + "_clone")
    assert(clone.read().schema("quantity").dataType == LongType)
    assert(clone.read().select($"pk", $"quantity").as[(Long, Long)]
      .collect().toSet == Set((1L, 10L), (2L, 20L), (3L, 5000000000L)))
  }

  test("unevolved table reads stay ONE parquet scan (no union, no merge job)") {
    val t = LakeTable(spark, cfg(freshRoot()))
    t.bulkInsert(df((1L, 1, 10, 0), (2L, 2, 20, 0)))
    t.upsert(df((3L, 1, 30, 1)))
    t.upsert(df((4L, 2, 40, 2)))
    val plan = t.read().queryExecution.optimizedPlan
    val unions = plan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }
    assert(unions.isEmpty,
      s"same-schema commits must share one scan:\n$plan")
    // and an evolved table reads as exactly one union of the generations
    t.renameColumn("qty", "quantity")
    import spark.implicits._
    t.upsert(Seq((5L, 1, 50, 3)).toDF("pk", "part", "quantity", "ts"))
    val evolved = t.read().queryExecution.optimizedPlan
    val scans = evolved.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r }
    assert(scans.size == 2,
      s"expected exactly 2 schema-generation scans, got ${scans.size}:\n$evolved")
  }

  test("scalacheck law: random evolution sequences equal an in-memory model") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // model: columns carry a stable IDENTITY (the index at mint time);
    // rows store values BY IDENTITY — exactly the invariant the cid
    // machinery must uphold through rename/drop/widen/re-add
    final case class MCol(id: Int, name: String, isLong: Boolean)
    val opGen = Gen.listOfN(6, Gen.choose(0, 4))
    val prop = Prop.forAll(opGen, Gen.choose(0L, 1000L)) { (ops, seed) =>
      val rnd = new scala.util.Random(seed)
      val t = LakeTable(spark, LakeTableConfig(freshRoot(),
        keyCols = Seq("pk"), precombineCol = "ts"))
      var cols = Vector(MCol(0, "c0", isLong = false))
      var nextId = 1
      var rows = Map.empty[Long, (Int, Map[Int, Long])]
      var step = 0
      def upsert(): Unit = {
        step += 1
        val pks = Seq(1L + rnd.nextInt(3), 4L + rnd.nextInt(2))
        val data = pks.map { pk =>
          pk -> cols.map(c => c.id -> (seed + pk * 10 + c.id)).toMap
        }
        val sdf = {
          import spark.implicits._
          val base = data.map { case (pk, m) =>
            (pk, step, cols.map(c => m(c.id)))
          }.toDF("pk", "ts", "vals")
          cols.zipWithIndex.foldLeft(base) { case (acc, (c, i)) =>
            acc.withColumn(c.name,
              if (c.isLong) col("vals").getItem(i)
              else col("vals").getItem(i).cast("int"))
          }.drop("vals")
        }
        if (t.exists) t.upsert(sdf) else t.bulkInsert(sdf)
        data.foreach { case (pk, m) => rows += pk -> (step, m) }
      }
      upsert() // the table always starts with one batch
      ops.foreach {
        case 0 => upsert()
        case 1 => // add
          step += 1
          val name = s"c$nextId"
          t.addColumn(name, org.apache.spark.sql.types.IntegerType)
          cols = cols :+ MCol(nextId, name, isLong = false)
          nextId += 1
        case 2 if cols.nonEmpty => // rename
          step += 1
          val i = rnd.nextInt(cols.size)
          val nn = s"r${nextId}_${cols(i).id}"
          nextId += 1
          t.renameColumn(cols(i).name, nn)
          cols = cols.updated(i, cols(i).copy(name = nn))
        case 3 if cols.size > 1 => // drop (keep at least one user column)
          step += 1
          val i = rnd.nextInt(cols.size)
          t.dropColumn(cols(i).name)
          cols = cols.patch(i, Nil, 1)
        case 4 if cols.exists(!_.isLong) => // widen
          step += 1
          val narrow = cols.zipWithIndex.filter(!_._1.isLong)
          val (c, i) = narrow(rnd.nextInt(narrow.size))
          t.widenColumn(c.name, org.apache.spark.sql.types.LongType)
          cols = cols.updated(i, c.copy(isLong = true))
        case _ => ()
      }
      val expected = rows.map { case (pk, (ts, m)) =>
        (pk, ts, cols.map(c => m.get(c.id))) }.toSet
      val got = t.read()
        .select(col("pk") +: col("ts") +:
          cols.map(c => col(c.name).cast("long")): _*)
        .collect().map { r =>
          (r.getLong(0), r.getInt(1),
            cols.indices.map(i =>
              if (r.isNullAt(2 + i)) None else Some(r.getLong(2 + i))).toVector)
        }.toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(4), prop)
    assert(res.passed, s"evolution model: $res")
  }

  // ---- nested-type evolution (struct fields carry their own ids) -----

  private def sdf(rows: (Long, Int, Int, String, Int)*): DataFrame = {
    import org.apache.spark.sql.functions.{col, struct}
    import spark.implicits._
    rows.toDF("pk", "part", "a", "b", "ts")
      .select(col("pk"), col("part"),
        struct(col("a"), col("b")).as("s"), col("ts"))
  }

  test("nested: add/rename/widen inside a struct; three generations, one read") {
    import org.apache.spark.sql.functions.col
    val t = LakeTable(spark, cfg(freshRoot()))
    t.bulkInsert(sdf((1L, 1, 10, "x", 0)))              // gen 1: s(a int, b)
    t.addColumn(Seq("s", "c"), DoubleType)
    import spark.implicits._
    t.upsert(Seq((2L, 1, 20, "y", 2.5, 1)).toDF("pk", "part", "a", "b", "c", "ts")
      .select(col("pk"), col("part"),
        org.apache.spark.sql.functions.struct(col("a"), col("b"), col("c")).as("s"),
        col("ts")))                                      // gen 2: s(a, b, c)
    t.renameColumn(Seq("s", "b"), "label")
    t.widenColumn(Seq("s", "a"), LongType)
    t.upsert(Seq((3L, 1, 5000000000L, "z", 7.5, 2))
      .toDF("pk", "part", "a", "label", "c", "ts")
      .select(col("pk"), col("part"),
        org.apache.spark.sql.functions.struct(
          col("a"), col("label"), col("c")).as("s"),
        col("ts")))                                      // gen 3: s(a long, label, c)
    val st = t.read().schema("s").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq == Seq("a", "label", "c"), st.treeString)
    assert(st("a").dataType == LongType)
    val out = t.read()
      .select(col("pk"), col("s.a").as("a"), col("s.label").as("label"),
        col("s.c").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(out == Set(
      (1L, 10L, "x", null),          // gen-1 file: aliased by id, upcast, null c
      (2L, 20L, "y", 2.5),           // gen-2 file: aliased by id
      (3L, 5000000000L, "z", 7.5)))  // gen-3 file: native
  }

  test("nested: drop then re-adding the same field name does NOT resurrect") {
    import org.apache.spark.sql.functions.col
    val t = LakeTable(spark, cfg(freshRoot()))
    t.bulkInsert(sdf((1L, 1, 10, "secret", 0)))
    t.dropColumn(Seq("s", "b"))
    assert(!t.read().schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.contains("b"))
    t.addColumn(Seq("s", "b"), StringType) // fresh id — must not alias old bytes
    val v = t.read().select(col("s.b")).collect()
    assert(v.forall(_.isNullAt(0)), "re-added nested name resurrected dropped data")
  }

  test("nested: pinned top-level columns refuse nested edits; guards hold") {
    val t = LakeTable(spark, cfg(freshRoot()))
    t.bulkInsert(sdf((1L, 1, 10, "x", 0)))
    intercept[IllegalArgumentException](t.renameColumn(Seq("pk", "x"), "y"))
    intercept[IllegalArgumentException](t.widenColumn(Seq("s", "b"), LongType))
    intercept[IllegalArgumentException](t.dropColumn(Seq("s", "nope")))
    intercept[IllegalArgumentException](t.addColumn(Seq("s", "a"), IntegerType))
    // dropping the last nested field would leave an empty struct
    val t2 = LakeTable(spark, cfg(freshRoot()))
    t2.bulkInsert(sdf((1L, 1, 10, "x", 0)))
    t2.dropColumn(Seq("s", "a"))
    intercept[IllegalArgumentException](t2.dropColumn(Seq("s", "b")))
  }

  test("nested: write-path evolution merges struct fields like the top level") {
    import org.apache.spark.sql.functions.{col, struct}
    import spark.implicits._
    val t = LakeTable(spark, cfg(freshRoot()))
    t.bulkInsert(sdf((1L, 1, 10, "x", 0)))
    // a batch whose struct carries a NEW nested field evolves the table
    // schema (fresh id), and one whose struct is NARROW keeps the field
    t.upsert(Seq((2L, 1, 20, "y", true, 1)).toDF("pk", "part", "a", "b", "extra", "ts")
      .select(col("pk"), col("part"),
        struct(col("a"), col("b"), col("extra")).as("s"), col("ts")))
    val st1 = t.read().schema("s").dataType.asInstanceOf[StructType]
    assert(st1.fieldNames.toSeq == Seq("a", "b", "extra"))
    t.upsert(Seq((3L, 1, 30, 2)).toDF("pk", "part", "a", "ts")
      .select(col("pk"), col("part"), struct(col("a")).as("s"), col("ts")))
    val st2 = t.read().schema("s").dataType.asInstanceOf[StructType]
    assert(st2.fieldNames.toSeq == Seq("a", "b", "extra"),
      "a narrow nested batch must not narrow the struct")
    val r3 = t.read().filter(col("pk") === 3L)
      .select(col("s.a"), col("s.b"), col("s.extra")).collect().head
    assert(r3.getInt(0) == 30 && r3.isNullAt(1) && r3.isNullAt(2))
  }

  test("nested: stream tail fails loud when a nested field is added after start") {
    import org.apache.spark.sql.functions.col
    val t = LakeTable(spark, cfg(freshRoot()))
    t.bulkInsert(sdf((1L, 1, 10, "x", 0)))
    val src = new graft.sources.GraftTailSource(spark.sqlContext, t, t.tailSchema)
    assert(src.batchFrame(-1L, 0L).count() == 1)
    t.addColumn(Seq("s", "c"), DoubleType)
    import spark.implicits._
    t.upsert(Seq((2L, 1, 20, "y", 2.5, 1)).toDF("pk", "part", "a", "b", "c", "ts")
      .select(col("pk"), col("part"),
        org.apache.spark.sql.functions.struct(col("a"), col("b"), col("c")).as("s"),
        col("ts")))
    val e = intercept[IllegalStateException](
      src.batchFrame(1L, t.log.latestId.get).collect())
    assert(e.getMessage.contains("restart the stream"), e.getMessage)
  }

  test("nested: ALTER TABLE SQL on struct fields through the catalog") {
    val wh = Files.createTempDirectory("evonest").toString
    spark.conf.set("spark.sql.catalog.evonest", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.evonest.warehouse", wh)
    try {
      spark.sql("CREATE TABLE evonest.db.t (pk BIGINT, part INT, " +
        "s STRUCT<a: INT, b: STRING>, ts INT) PARTITIONED BY (part) " +
        "TBLPROPERTIES (keyCols='pk', precombineCol='ts')")
      spark.sql("INSERT INTO evonest.db.t VALUES " +
        "(1, 1, named_struct('a', 10, 'b', 'x'), 0)")
      spark.sql("ALTER TABLE evonest.db.t ADD COLUMN s.c DOUBLE")
      spark.sql("ALTER TABLE evonest.db.t RENAME COLUMN s.b TO label")
      spark.sql("ALTER TABLE evonest.db.t ALTER COLUMN s.a TYPE BIGINT")
      spark.sql("INSERT INTO evonest.db.t VALUES " +
        "(2, 1, named_struct('a', CAST(5000000000 AS BIGINT), 'label', 'y', " +
        "'c', CAST(2.5 AS DOUBLE)), 1)")
      val rows = spark.sql("SELECT pk, s.a, s.label, s.c FROM evonest.db.t " +
        "ORDER BY pk").collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSeq ==
        Seq((1L, 10L, "x", null), (2L, 5000000000L, "y", 2.5)))
      // multi-change dry-run atomicity: a failing later change must not
      // apply the earlier one
      val before = spark.table("evonest.db.t").schema("s").dataType
      intercept[Exception](spark.sql(
        "ALTER TABLE evonest.db.t ADD COLUMN s.d INT, s.a STRING"))
      assert(spark.table("evonest.db.t").schema("s").dataType == before)
    } finally {
      spark.conf.unset("spark.sql.catalog.evonest")
      spark.conf.unset("spark.sql.catalog.evonest.warehouse")
    }
  }

  test("ALTER TABLE SQL: rename/drop/add/widen through the catalog") {
    val wh = Files.createTempDirectory("evocat").toString
    spark.conf.set("spark.sql.catalog.evocat", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.evocat.warehouse", wh)
    try {
      spark.sql("CREATE TABLE evocat.db.t (pk BIGINT, part INT, qty INT, ts INT) " +
        "PARTITIONED BY (part) TBLPROPERTIES (keyCols='pk', precombineCol='ts')")
      spark.sql("INSERT INTO evocat.db.t VALUES (1, 1, 10, 0), (2, 2, 20, 0)")
      spark.sql("ALTER TABLE evocat.db.t RENAME COLUMN qty TO quantity")
      spark.sql("ALTER TABLE evocat.db.t ALTER COLUMN quantity TYPE BIGINT")
      spark.sql("ALTER TABLE evocat.db.t ADD COLUMN score DOUBLE")
      val rows = spark.sql(
        "SELECT pk, quantity, score FROM evocat.db.t ORDER BY pk").collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2))).toSeq ==
        Seq((1L, 10L, true), (2L, 20L, true)))
      spark.sql("ALTER TABLE evocat.db.t DROP COLUMN score")
      assert(!spark.table("evocat.db.t").columns.contains("score"))
    } finally {
      spark.conf.unset("spark.sql.catalog.evocat")
      spark.conf.unset("spark.sql.catalog.evocat.warehouse")
    }
  }
}
