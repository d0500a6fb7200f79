package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{LakeTable, LakeTableConfig}

/** Named tags (Iceberg tag refs): name→commit resolution, immutability,
  * cleaner pinning, rollback/restore refusal, SQL procedure surface.
  */
class TagSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("tagtest").resolve("tbl").toString

  private def df(rows: (Long, String, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "payload", "ts")
  }

  private def mk(): LakeTable = {
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts"))
    t.bulkInsert(df((1L, "v0", 0)))          // c0
    t.upsert(df((1L, "v1", 1), (2L, "b", 1))) // c1
    t.upsert(df((3L, "c", 2)))               // c2
    t
  }

  test("create/resolve/read: a tag is a name for readAsOf") {
    val t = mk()
    t.createTag("rel-1.0", 1)
    assert(t.resolveTag("rel-1.0") == 1L)
    assert(t.readTag("rel-1.0").collect().toSet ==
      t.readAsOf(1).collect().toSet)
    // unknown tag names fail with the available names listed
    val ex = intercept[IllegalArgumentException] { t.readTag("nope") }
    assert(ex.getMessage.contains("rel-1.0"))
  }

  test("tags are immutable: re-create fails, drop + create moves") {
    val t = mk()
    t.createTag("v", 0)
    val ex = intercept[IllegalArgumentException] { t.createTag("v", 1) }
    assert(ex.getMessage.contains("immutable"), ex.getMessage)
    assert(t.resolveTag("v") == 0L)
    t.dropTag("v")
    t.createTag("v", 1)
    assert(t.resolveTag("v") == 1L)
  }

  test("name validation: bare numbers and junk refuse") {
    val t = mk()
    intercept[IllegalArgumentException] { t.createTag("42", 0) }
    intercept[IllegalArgumentException] { t.createTag("a/b", 0) }
    intercept[IllegalArgumentException] { t.createTag("", 0) }
    intercept[IllegalArgumentException] { t.createTag("v", 99) } // no such commit
  }

  test("a tagged commit survives the cleaner; an untagged one does not") {
    val t = mk()
    t.createTag("pin0", 0)
    t.clean(1) // retain only the head snapshot
    // tagged: still readable below the horizon
    assert(t.readTag("pin0").collect().map(_.getLong(0)).toSet == Set(1L))
    // untagged old commit: refused (its files may be gone)
    intercept[IllegalArgumentException] { t.readAsOf(1) }
    // dropping the tag releases the pin: the NEXT clean may delete, and
    // the horizon guard refuses the read outright
    t.dropTag("pin0")
    intercept[IllegalArgumentException] { t.readAsOf(0) }
  }

  test("rollback and restore refuse to cross a tag") {
    val t = mk()
    t.createTag("head", 2)
    val ex = intercept[IllegalArgumentException] { t.rollback() }
    assert(ex.getMessage.contains("pinned"), ex.getMessage)
    intercept[IllegalArgumentException] { t.restoreTo(0) }
    t.dropTag("head")
    assert(t.rollback().contains(2L))
  }

  test("SQL procedures + VERSION AS OF '<tag>' round trip") {
    val wh = Files.createTempDirectory("tagwh").toString
    spark.conf.set("spark.sql.catalog.tagtest", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tagtest.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tagtest.db")
    spark.sql("""CREATE TABLE tagtest.db.t (pk BIGINT, payload STRING, ts INT)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO tagtest.db.t VALUES (1, 'v0', 0)")
    spark.sql("INSERT INTO tagtest.db.t VALUES (1, 'v1', 1), (2, 'b', 1)")
    assert(spark.sql("CALL tagtest.system.create_tag('db.t', 'first', 0L)")
      .head.getLong(0) == 0L)
    val viaTag = spark.sql(
      "SELECT payload FROM tagtest.db.t VERSION AS OF 'first'")
      .collect().map(_.getString(0)).toSeq
    assert(viaTag == Seq("v0"))
    // numeric versions still work beside names
    assert(spark.sql("SELECT count(*) FROM tagtest.db.t VERSION AS OF 1")
      .head.getLong(0) == 2L)
    assert(spark.sql("CALL tagtest.system.drop_tag('db.t', 'first')")
      .head.getLong(0) == 0L)
    intercept[Exception] {
      spark.sql("SELECT * FROM tagtest.db.t VERSION AS OF 'first'").collect()
    }
    spark.sql("DROP TABLE tagtest.db.t")
  }
}
