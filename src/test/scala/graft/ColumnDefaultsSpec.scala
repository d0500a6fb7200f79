package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL DEFAULT column values through the catalog
  * (TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE): Spark
  * validates and stores the default at CREATE, fills omitted columns
  * and the DEFAULT keyword at INSERT analysis; the engine keeps the
  * declaration visible on the table schema across commits.
  */
class ColumnDefaultsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft_defaults_wh").toString
    spark.conf.set("spark.sql.catalog.dft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dft.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dft.db")
    dir
  }

  test("CREATE-time defaults fill omitted columns and the DEFAULT keyword") {
    wh
    spark.sql("""CREATE TABLE dft.db.t (
        pk BIGINT, ts INT DEFAULT 0, v STRING DEFAULT 'unset',
        score DOUBLE DEFAULT 1.5)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    // omitted columns
    spark.sql("INSERT INTO dft.db.t (pk) VALUES (1)")
    // explicit DEFAULT keyword + mixed literals
    spark.sql("INSERT INTO dft.db.t (pk, v, score) VALUES (2, DEFAULT, 9.0)")
    // after commits exist (schema now resolves from the commit log) the
    // declaration must still fill — the overlay contract
    spark.sql("INSERT INTO dft.db.t (pk, ts) VALUES (3, 7)")
    val got = spark.sql(
      "SELECT pk, ts, v, score FROM dft.db.t ORDER BY pk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 0, "unset", 1.5),
      (2L, 0, "unset", 9.0),
      (3L, 7, "unset", 1.5)))
  }

  test("ALTER ADD COLUMN DEFAULT: old rows backfill, new inserts fill") {
    wh
    spark.sql("""CREATE TABLE dft.db.t2 (pk BIGINT, ts INT)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO dft.db.t2 VALUES (1, 0)")
    spark.sql("ALTER TABLE dft.db.t2 ADD COLUMN c INT DEFAULT 5")
    spark.sql("ALTER TABLE dft.db.t2 ADD COLUMN tag STRING DEFAULT 'x'")
    // the pre-alter row reads the EXISTS default — never NULL
    assert(spark.sql("SELECT c, tag FROM dft.db.t2 WHERE pk = 1")
      .collect()(0).toSeq == Seq(5, "x"))
    // an INSERT omitting the column fills it forward
    spark.sql("INSERT INTO dft.db.t2 (pk, ts) VALUES (2, 0)")
    // an INSERT providing it wins
    spark.sql("INSERT INTO dft.db.t2 (pk, ts, c) VALUES (3, 0, 9)")
    val got = spark.sql("SELECT pk, c, tag FROM dft.db.t2 ORDER BY pk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 5, "x"), (2L, 5, "x"), (3L, 9, "x")))
    // streaming tail agrees with the batch surface on old rows
    val t = graft.lake.LakeTable(spark, graft.lake.TableDescriptor
      .load(s"$wh/db/t2", spark.sparkContext.hadoopConfiguration).get
      .config(s"$wh/db/t2"))
    val tail = new graft.sources.GraftTailSource(
      spark.sqlContext, t, t.tailSchema)
    val first = tail.batchFrame(-1, 1) // bulk insert commit only
    assert(first.select("c").collect()(0).getInt(0) == 5,
      "stream backfill must match batch exists-default")
    // a malformed default fails loud at ALTER time, not at read time
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE dft.db.t2 ADD COLUMN bad INT DEFAULT 'oops'"))
    assert(e.getMessage != null)
  }

  test("ALTER COLUMN SET/DROP DEFAULT: future inserts only, backfill kept") {
    wh
    spark.sql("""CREATE TABLE dft.db.t3 (pk BIGINT, ts INT, v STRING DEFAULT 'a')
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO dft.db.t3 (pk, ts) VALUES (1, 0)")
    // repoint the CREATE-time declared default
    spark.sql("ALTER TABLE dft.db.t3 ALTER COLUMN v SET DEFAULT 'b'")
    spark.sql("INSERT INTO dft.db.t3 (pk, ts) VALUES (2, 0)")
    // existing rows keep their stored values
    assert(spark.sql("SELECT pk, v FROM dft.db.t3 ORDER BY pk").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // DROP DEFAULT: omitted column goes back to null
    spark.sql("ALTER TABLE dft.db.t3 ALTER COLUMN v DROP DEFAULT")
    spark.sql("INSERT INTO dft.db.t3 (pk, ts) VALUES (3, 0)")
    assert(spark.sql("SELECT v FROM dft.db.t3 WHERE pk = 3")
      .collect()(0).isNullAt(0))

    // SET DEFAULT on an ADD-COLUMN default repoints CURRENT but must
    // keep EXISTS backfill: the pre-column row still reads the ORIGINAL
    // constant (repointing it would rewrite history)
    spark.sql("ALTER TABLE dft.db.t3 ADD COLUMN c INT DEFAULT 5")
    spark.sql("ALTER TABLE dft.db.t3 ALTER COLUMN c SET DEFAULT 9")
    spark.sql("INSERT INTO dft.db.t3 (pk, ts) VALUES (4, 0)")
    val got = spark.sql("SELECT pk, c FROM dft.db.t3 ORDER BY pk").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((1L, 5), (2L, 5), (3L, 5), (4L, 9)),
      s"pre-column rows backfill 5, post-SET insert fills 9; got ${got.toSeq}")

    // a malformed SET DEFAULT fails loud at ALTER time
    intercept[Exception](spark.sql(
      "ALTER TABLE dft.db.t3 ALTER COLUMN c SET DEFAULT 'oops'"))
    // nested fields refuse
    intercept[Exception](spark.sql(
      "ALTER TABLE dft.db.t3 ALTER COLUMN s.f SET DEFAULT 1"))
  }

  test("nested ADD COLUMN DEFAULT backfills pre-existing rows through the struct rebuild") {
    wh
    spark.sql("""CREATE TABLE dft.db.t5 (pk BIGINT, ts INT,
        s STRUCT<a: INT>) USING graft
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO dft.db.t5 VALUES (1, 0, named_struct('a', 1))")
    // a NULL parent struct must stay null through the backfill
    spark.sql("INSERT INTO dft.db.t5 VALUES (2, 0, NULL)")
    spark.sql("ALTER TABLE dft.db.t5 ADD COLUMN s.f INT DEFAULT 5")
    // pre-field rows read the declared constant inside non-null parents
    val got = spark.sql("SELECT pk, s.f FROM dft.db.t5 ORDER BY pk").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getInt(1)))
    assert(got.toSeq == Seq((1L, 5), (2L, null)),
      s"pre-field rows backfill 5 inside non-null structs, got ${got.toSeq}")
    // post-add writers supply the field explicitly (struct shape is
    // analysis-enforced) and their value wins
    spark.sql("INSERT INTO dft.db.t5 VALUES (3, 0, named_struct('a', 2, 'f', 9))")
    assert(spark.sql("SELECT s.f FROM dft.db.t5 WHERE pk = 3")
      .collect()(0).getInt(0) == 9)
    // validation applies at the nested path too
    intercept[Exception](spark.sql(
      "ALTER TABLE dft.db.t5 ADD COLUMN s.bad DOUBLE DEFAULT rand()"))
    intercept[Exception](spark.sql(
      "ALTER TABLE dft.db.t5 ADD COLUMN s.worse INT DEFAULT 'oops'"))
  }

  test("non-constant defaults are rejected at ALTER time, not insert time") {
    wh
    spark.sql("""CREATE TABLE dft.db.t4 (pk BIGINT, ts INT, c DOUBLE)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    // nondeterministic: a CAST-probe would happily evaluate rand() once,
    // then every INSERT would mint a DIFFERENT value — must refuse now
    intercept[Exception](spark.sql(
      "ALTER TABLE dft.db.t4 ALTER COLUMN c SET DEFAULT rand()"))
    // per-statement value: evaluates, but varies per INSERT — refuse
    intercept[Exception](spark.sql(
      "ALTER TABLE dft.db.t4 ALTER COLUMN c SET DEFAULT " +
        "CAST(unix_timestamp(current_timestamp()) AS DOUBLE)"))
    // scalar subquery: evaluates at probe time, unresolvable at INSERT
    // analysis — refuse
    intercept[Exception](spark.sql(
      "ALTER TABLE dft.db.t4 ALTER COLUMN c SET DEFAULT (SELECT 1.0)"))
    // same gate on ADD COLUMN
    intercept[Exception](spark.sql(
      "ALTER TABLE dft.db.t4 ADD COLUMN bad DOUBLE DEFAULT rand()"))
    // constant expressions (including foldable function composition)
    // still pass
    spark.sql("ALTER TABLE dft.db.t4 ALTER COLUMN c SET DEFAULT 1.5 + 2.5")
    spark.sql("INSERT INTO dft.db.t4 (pk, ts) VALUES (1, 0)")
    assert(spark.sql("SELECT c FROM dft.db.t4").collect()(0).getDouble(0) == 4.0)
  }
}
