package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, LakeTableConfig, ShredSpec}

/** VARIANT / JSON shredding ([[LakeTableConfig.shredPaths]]): write-side
  * materialized shadow columns + commit-log stats, read-side predicate
  * rewrite → file skipping BEFORE any variant byte decodes.
  */
class ShredFileSkipSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_shred").toString + "/t"

  /** 40 rows, uid 0..39, variant ev = {"uid":uid,"meta":{"score":uid*1.5}}.
    * Partitioned by the coarse bucket pb = uid/10 so the fixture spreads
    * over 4 files — the PREDICATES never mention pb, so partition
    * pruning cannot fire and any file skip is the shadow stats' doing. */
  private def mk(extra: LakeTableConfig => LakeTableConfig = identity)
      : LakeTable = {
    val cfg = extra(LakeTableConfig(freshRoot(),
      keyCols = Seq("id"), precombineCol = "ts",
      partitionCols = Seq("pb"),
      shredPaths = Seq("ev:$.uid:bigint", "ev:$.meta.score:double")))
    val t = LakeTable(spark, cfg)
    val df = (0 until 40).toDF("id")
      .select(col("id").cast("long").as("id"),
        col("id").cast("long").as("uid"),
        (col("id") / 10).cast("int").as("pb"),
        parse_json(to_json(struct(
          col("id").cast("long").as("uid"),
          struct((col("id") * 1.5).as("score")).as("meta")))).as("ev"),
        lit(0).as("ts"))
    t.bulkInsert(df)
    t
  }

  private def filesRead(df: DataFrame): Int = df.inputFiles.length

  test("variant_get predicate skips files via materialized shadow stats") {
    val t = mk()
    val all = filesRead(t.read())
    assert(all >= 3, s"fixture should spread over several files, got $all")
    val pruned = t.read(variant_get(col("ev"), "$.uid", "bigint") < 5)
    assert(filesRead(pruned) < all,
      "a $.uid range predicate must skip files through the shadow stats")
    assert(pruned.select("id").as[Long].collect().toSet == (0L until 5L).toSet)
    // try_variant_get matches the same shred entry
    val pruned2 = t.read(try_variant_get(col("ev"), "$.uid", "bigint") >= 35)
    assert(filesRead(pruned2) < all)
    assert(pruned2.select("id").as[Long].collect().toSet ==
      (35L until 40L).toSet)
    // the double-typed nested path prunes too
    val pruned3 = t.read(
      variant_get(col("ev"), "$.meta.score", "double") < lit(3.0))
    assert(filesRead(pruned3) < all)
    assert(pruned3.select("id").as[Long].collect().toSet == Set(0L, 1L))
    // an UNconfigured path cannot prune but stays correct
    val other = t.read(variant_get(col("ev"), "$.meta", "string").isNotNull)
    assert(other.count() == 40)
  }

  test("JSON-string column shreds through get_json_object, bare and cast") {
    val root = freshRoot()
    val t = LakeTable(spark, LakeTableConfig(root,
      keyCols = Seq("id"), precombineCol = "ts",
      partitionCols = Seq("pb"),
      shredPaths = Seq("js:$.uid:bigint", "js:$.tag:string")))
    val df = (0 until 40).toDF("id")
      .select(col("id").cast("long").as("id"),
        col("id").cast("long").as("uid"),
        (col("id") / 10).cast("int").as("pb"),
        to_json(struct(col("id").cast("long").as("uid"),
          concat(lit("t"), lpad(col("id").cast("string"), 3, "0"))
            .as("tag"))).as("js"),
        lit(0).as("ts"))
    t.bulkInsert(df)
    val all = filesRead(t.read())
    assert(all >= 3)
    val cast = t.read(get_json_object(col("js"), "$.uid").cast("bigint") < 5)
    assert(filesRead(cast) < all, "cast(get_json_object) must prune")
    assert(cast.count() == 5)
    val bare = t.read(get_json_object(col("js"), "$.tag") === "t003")
    assert(filesRead(bare) < all, "bare get_json_object (string) must prune")
    assert(bare.select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("rows with a missing path shred to NULL and are never mis-pruned") {
    val root = freshRoot()
    val t = LakeTable(spark, LakeTableConfig(root,
      keyCols = Seq("id"), precombineCol = "ts",
      shredPaths = Seq("js:$.uid:bigint")))
    // file 1: uids present; file 2 (second commit): path absent
    def row(id: Long, js: String) =
      Seq((id, js, 0)).toDF("id", "js", "ts")
    t.bulkInsert(row(1L, """{"uid": 10}""").union(row(2L, """{"uid": 20}""")))
    t.upsert(row(3L, """{"other": 1}""").union(row(4L, """{"uid": 99}""")))
    // predicate selects nothing from the all-null region; correctness first
    val got = t.read(get_json_object(col("js"), "$.uid").cast("bigint") > 15)
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 4L))
    // nulls select nothing, never a wrong prune into visibility
    assert(t.read(get_json_object(col("js"), "$.uid").cast("bigint").isNull)
      .select("id").as[Long].collect().toSet == Set(3L))
  }

  test("upsert rewrites recompute shadows; old-entry files stay conservative") {
    val t = mk()
    // move id=1's uid out of the <5 range: the rewritten file's shadow
    // must reflect the NEW value
    val upd = Seq((1L, 100L)).toDF("id", "uid")
      .select(col("id"), col("uid"), lit(0).as("pb"),
        parse_json(to_json(struct(col("uid"),
          struct(lit(150.0).as("score")).as("meta")))).as("ev"),
        lit(1).as("ts"))
    t.upsert(upd)
    val got = t.read(variant_get(col("ev"), "$.uid", "bigint") < 5)
      .select("id").as[Long].collect().toSet
    assert(got == Set(0L, 2L, 3L, 4L))
    assert(t.read(variant_get(col("ev"), "$.uid", "bigint") === 100L)
      .select("id").as[Long].collect().toSet == Set(1L))
  }

  test("catalog surface: shredPaths property round-trips and ALTERs") {
    val wh = Files.createTempDirectory("graft_shred_wh").toString
    spark.conf.set("spark.sql.catalog.shr", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.shr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS shr.db")
    spark.sql("""CREATE TABLE shr.db.t (id BIGINT, uid BIGINT, pb INT,
      js STRING, ts INT) USING graft PARTITIONED BY (pb)
      TBLPROPERTIES (keyCols='id', precombineCol='ts',
        shredPaths='js:$.uid:bigint')""")
    val vals = (0 until 40).map(i =>
      s"""($i, $i, ${i / 10}, '{"uid": $i}', 0)""").mkString(", ")
    spark.sql(s"INSERT INTO shr.db.t VALUES $vals")
    val t = LakeTable(spark, graft.lake.TableDescriptor
      .load(s"$wh/db/t", spark.sparkContext.hadoopConfiguration).get
      .config(s"$wh/db/t"))
    assert(t.config.shredSpecs.size == 1)
    val all = filesRead(t.read())
    val pruned = t.read(
      get_json_object(col("js"), "$.uid").cast("bigint") < 5)
    assert(filesRead(pruned) < all && pruned.count() == 5)
    // ALTER adds an entry; files written before it carry no stat for it
    // (conservatively kept) — new writes record it
    spark.sql("""ALTER TABLE shr.db.t SET TBLPROPERTIES
      (shredPaths='js:$.uid:bigint; js:$.uid:string')""")
    val t2 = LakeTable(spark, graft.lake.TableDescriptor
      .load(s"$wh/db/t", spark.sparkContext.hadoopConfiguration).get
      .config(s"$wh/db/t"))
    assert(t2.config.shredSpecs.size == 2)
    assert(t2.read(get_json_object(col("js"), "$.uid") === "7").count() == 1)
    // dropping the source column is refused while a shred entry pins it
    val e = intercept[Exception](
      spark.sql("ALTER TABLE shr.db.t DROP COLUMN js"))
    assert(e.getMessage.contains("pinned"), e.getMessage)
    // UNSET clears
    spark.sql("ALTER TABLE shr.db.t UNSET TBLPROPERTIES ('shredPaths')")
    val t3 = LakeTable(spark, graft.lake.TableDescriptor
      .load(s"$wh/db/t", spark.sparkContext.hadoopConfiguration).get
      .config(s"$wh/db/t"))
    assert(t3.config.shredSpecs.isEmpty)
  }

  test("maintenance rewrites backfill shadow stats for pre-entry files") {
    // table WITHOUT shredPaths first: files carry no shadow stats
    val root = freshRoot()
    def cfg(shred: Seq[String]) = LakeTableConfig(root,
      keyCols = Seq("id"), precombineCol = "ts",
      partitionCols = Seq("pb"), clusterCols = Seq("uid"),
      shredPaths = shred)
    val t0 = LakeTable(spark, cfg(Seq.empty))
    val df = (0 until 40).toDF("id")
      .select(col("id").cast("long").as("id"),
        col("id").cast("long").as("uid"),
        (col("id") / 10).cast("int").as("pb"),
        to_json(struct(col("id").cast("long").as("uid"))).as("js"),
        lit(0).as("ts"))
    t0.bulkInsert(df)
    // entry added AFTER the data existed (the ALTER shape): old files
    // have no stat for it — correct but unpruned
    val t = LakeTable(spark, cfg(Seq("js:$.uid:bigint")))
    val all = t.read().inputFiles.length
    val pred = get_json_object(col("js"), "$.uid").cast("bigint") < 5
    assert(t.read(pred).inputFiles.length == all,
      "pre-entry files carry no shadow stat and must be kept")
    assert(t.read(pred).count() == 5)
    // any rewrite recomputes shadows on the way out: recluster the
    // table and the SAME predicate now skips
    t.recluster()
    val t2 = LakeTable(spark, cfg(Seq("js:$.uid:bigint")))
    val all2 = t2.read().inputFiles.length
    assert(all2 >= 3, s"recluster should keep range-split files, got $all2")
    assert(t2.read(pred).inputFiles.length < all2,
      "reclustered files must carry shadow stats and prune")
    assert(t2.read(pred).count() == 5)
  }

  test("guards: malformed entries fail loud; reserved prefix refused") {
    intercept[IllegalArgumentException](ShredSpec.parse("nocolons"))
    intercept[IllegalArgumentException](ShredSpec.parse("c:notapath:int"))
    intercept[Exception](ShredSpec.parse("c:$.x:nosuchtype"))
    // stable content-addressed shadow names
    assert(ShredSpec.parse("c:$.x:bigint").name ==
      ShredSpec.parse("c:$.x:bigint").name)
    assert(ShredSpec.parse("c:$.x:bigint").name !=
      ShredSpec.parse("c:$.y:bigint").name)
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("id"), precombineCol = "ts",
      shredPaths = Seq("js:$.a:string")))
    val bad = Seq((1L, "{}", 0)).toDF("id", "js", "ts")
      .withColumn("_shred_squat", lit(1))
    val e = intercept[IllegalArgumentException](t.bulkInsert(bad))
    assert(e.getMessage.contains("reserved"), e.getMessage)
  }
}
