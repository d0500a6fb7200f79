package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `COPY INTO` (Delta's idempotent file-loading spelling) through the
  * parser fallback: loaded files leave markers and are skipped by later
  * COPYs; the load itself rides the table's precombine upsert, so a
  * crash between commit and marker re-ingests idempotently.
  */
class CopyIntoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft_copy_wh").toString
    spark.conf.set("spark.sql.catalog.cpy", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cpy.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cpy.db")
    dir
  }

  private def stage(rows: Seq[(Long, String)], dir: String,
      nFiles: Int = 1): Unit = {
    import spark.implicits._
    rows.toDF("pk", "v").withColumn("ts",
      org.apache.spark.sql.functions.lit(0))
      .repartition(nFiles).write.mode("append").parquet(dir)
  }

  test("idempotent loads: markers skip, late arrivals land alone") {
    wh
    val staging = Files.createTempDirectory("copy_stage").toString
    stage(Seq((1L, "a"), (2L, "b")), staging, nFiles = 2)
    spark.sql("""CREATE TABLE cpy.db.t (pk BIGINT, v STRING, ts INT)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    val r1 = spark.sql(
      s"COPY INTO cpy.db.t FROM '$staging' FILEFORMAT = PARQUET")
      .collect().head
    assert(r1.getLong(0) == 2 && r1.getLong(1) == 0 && r1.getLong(2) == 2,
      s"two staged files load on the first COPY, got $r1")
    val r2 = spark.sql(s"COPY INTO cpy.db.t FROM '$staging'").collect().head
    assert(r2.getLong(0) == 0 && r2.getLong(1) == 2,
      s"re-COPY must skip both loaded files, got $r2")
    stage(Seq((3L, "c")), staging)
    val r3 = spark.sql(s"COPY INTO cpy.db.t FROM '$staging'").collect().head
    assert(r3.getLong(0) == 1 && r3.getLong(1) == 2 && r3.getLong(2) == 1,
      s"only the late arrival loads, got $r3")
    assert(spark.sql("SELECT v FROM cpy.db.t ORDER BY pk").collect()
      .map(_.getString(0)).toSeq == Seq("a", "b", "c"))
  }

  test("PATTERN narrows the candidate set; csv loads through the header") {
    wh
    val staging = Files.createTempDirectory("copy_pat").toString
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(name: String, text: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(staging, name), true)
      try out.write(text.getBytes("UTF-8")) finally out.close()
    }
    put("a.csv", "pk,v,ts\n1,x,0\n")
    put("b.csv", "pk,v,ts\n2,y,0\n")
    put("junk.txt", "not,data\n")
    spark.sql("""CREATE TABLE cpy.db.c (pk BIGINT, v STRING, ts INT)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    val r = spark.sql(s"COPY INTO cpy.db.c FROM '$staging' " +
      "FILEFORMAT = CSV PATTERN = '*.csv'").collect().head
    assert(r.getLong(0) == 2 && r.getLong(2) == 2, s"got $r")
    assert(spark.sql("SELECT v FROM cpy.db.c ORDER BY pk").collect()
      .map(_.getString(0)).toSeq == Seq("x", "y"))
    // unsupported formats refuse loud
    intercept[Exception](spark.sql(
      s"COPY INTO cpy.db.c FROM '$staging' FILEFORMAT = AVRO").collect())
  }

  test("rows_loaded comes from commit metadata — staged files scan once") {
    wh
    val staging = Files.createTempDirectory("copy_once").toString
    stage((1L to 1000L).map(i => (i, s"v$i")), staging, nFiles = 2)
    spark.sql("""CREATE TABLE cpy.db.once (pk BIGINT, v STRING, ts INT)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    val records = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(e.taskMetrics).foreach(m =>
          records.addAndGet(m.inputMetrics.recordsRead))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = spark.sql(s"COPY INTO cpy.db.once FROM '$staging'").collect().head
      assert(r.getLong(0) == 2 && r.getLong(2) == 1000,
        s"rows_loaded must be footer-exact from the commit metadata, got $r")
      // drain the listener bus, then: inputMetrics counts BOTH the one
      // real parquet pass and the write's re-read of the persisted cache
      // (~2N total) — the old write-then-count shape added a THIRD full
      // pass over the staged parquet (~3N). Pin the 2N regime.
      var last = -1L
      while (records.get != last) { last = records.get; Thread.sleep(300) }
      assert(records.get <= 2500,
        "staged files must be read only by the upsert itself (one parquet " +
          s"pass + its cached re-read), recordsRead=${records.get}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("ORC loads; FORMAT_OPTIONS pass through to the reader") {
    wh
    val staging = Files.createTempDirectory("copy_orc").toString
    import spark.implicits._
    Seq((1L, "a", 0), (2L, "b", 0)).toDF("pk", "v", "ts")
      .write.mode("append").orc(staging)
    spark.sql("""CREATE TABLE cpy.db.o (pk BIGINT, v STRING, ts INT)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    val r = spark.sql(
      s"COPY INTO cpy.db.o FROM '$staging' FILEFORMAT = ORC").collect().head
    assert(r.getLong(2) == 2, s"got $r")
    assert(spark.sql("SELECT v FROM cpy.db.o ORDER BY pk").collect()
      .map(_.getString(0)).toSeq == Seq("a", "b"))

    // FORMAT_OPTIONS: headerless semicolon-separated csv
    val staging2 = Files.createTempDirectory("copy_opts").toString
    val fs = new org.apache.hadoop.fs.Path(staging2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(staging2, "x.csv"), true)
    try out.write("pk;v;ts\n3;c;0\n4;d;0\n".getBytes("UTF-8")) finally out.close()
    spark.sql("""CREATE TABLE cpy.db.sep (pk BIGINT, v STRING, ts INT)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    // a default-separator read would see ONE column and fail the
    // by-name alignment — the passthrough is what makes this load
    val r2 = spark.sql(s"COPY INTO cpy.db.sep FROM '$staging2' " +
      "FILEFORMAT = CSV FORMAT_OPTIONS('header' = 'true', 'sep' = ';')")
      .collect().head
    assert(r2.getLong(2) == 2, s"got $r2")
    assert(spark.sql("SELECT v FROM cpy.db.sep ORDER BY pk").collect()
      .map(_.getString(0)).toSeq == Seq("c", "d"))
  }

  test("marker compaction folds the dir into one manifest; idempotence survives") {
    wh
    val staging = Files.createTempDirectory("copy_many").toString
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val n = graft.sql.GraftCopyIntoCommand.CompactMarkersAt + 4
    (1 to n).foreach { i =>
      val out = fs.create(new org.apache.hadoop.fs.Path(staging, f"f$i%04d.csv"), true)
      try out.write(s"pk,v,ts\n$i,x$i,0\n".getBytes("UTF-8")) finally out.close()
    }
    spark.sql("""CREATE TABLE cpy.db.many (pk BIGINT, v STRING, ts INT)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    val r = spark.sql(s"COPY INTO cpy.db.many FROM '$staging' FILEFORMAT = CSV")
      .collect().head
    assert(r.getLong(0) == n && r.getLong(2) == n, s"got $r")
    // past the threshold the markers folded into ONE manifest file
    val markerDir = new org.apache.hadoop.fs.Path(s"$wh/db/many/_log/_copy")
    val entries = fs.listStatus(markerDir).map(_.getPath.getName)
    assert(entries.toSeq == Seq("_manifest"),
      s"expected one manifest, got ${entries.length} entries")
    // idempotence now reads from the manifest
    val r2 = spark.sql(s"COPY INTO cpy.db.many FROM '$staging' FILEFORMAT = CSV")
      .collect().head
    assert(r2.getLong(0) == 0 && r2.getLong(1) == n,
      s"re-COPY must skip all manifested files, got $r2")
    // late arrival: loads alone, marker lands beside the manifest
    val out = fs.create(new org.apache.hadoop.fs.Path(staging, "late.csv"), true)
    try out.write(s"pk,v,ts\n${n + 1},late,0\n".getBytes("UTF-8")) finally out.close()
    val r3 = spark.sql(s"COPY INTO cpy.db.many FROM '$staging' FILEFORMAT = CSV")
      .collect().head
    assert(r3.getLong(0) == 1 && r3.getLong(1) == n, s"got $r3")
    assert(spark.sql("SELECT count(*) FROM cpy.db.many")
      .collect().head.getLong(0) == n + 1)
  }

  test("FILES names an explicit manifest; missing entries and PATTERN-mix refuse") {
    wh
    val staging = Files.createTempDirectory("copy_files").toString
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(name: String, text: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(staging, name), true)
      try out.write(text.getBytes("UTF-8")) finally out.close()
    }
    put("a.csv", "pk,v,ts\n1,x,0\n")
    put("b.csv", "pk,v,ts\n2,y,0\n")
    put("c.csv", "pk,v,ts\n3,z,0\n")
    spark.sql("""CREATE TABLE cpy.db.fl (pk BIGINT, v STRING, ts INT)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    // only the named files load — c.csv is not touched
    val r = spark.sql(s"COPY INTO cpy.db.fl FROM '$staging' " +
      "FILEFORMAT = CSV FILES = ('a.csv', 'b.csv')").collect().head
    assert(r.getLong(0) == 2 && r.getLong(2) == 2, s"got $r")
    assert(spark.sql("SELECT v FROM cpy.db.fl ORDER BY pk").collect()
      .map(_.getString(0)).toSeq == Seq("x", "y"))
    // an explicit list is a manifest: a missing entry fails loud
    intercept[Exception](spark.sql(s"COPY INTO cpy.db.fl FROM '$staging' " +
      "FILEFORMAT = CSV FILES = ('nope.csv')").collect())
    // FILES and PATTERN together refuse
    intercept[Exception](spark.sql(s"COPY INTO cpy.db.fl FROM '$staging' " +
      "FILEFORMAT = CSV FILES = ('c.csv') PATTERN = '*.csv'").collect())
    // re-COPY of the named files skips via markers, the third file
    // still loads when finally named
    val r2 = spark.sql(s"COPY INTO cpy.db.fl FROM '$staging' " +
      "FILEFORMAT = CSV FILES = ('a.csv', 'c.csv')").collect().head
    assert(r2.getLong(0) == 1 && r2.getLong(1) == 1, s"got $r2")
    assert(spark.sql("SELECT count(*) FROM cpy.db.fl")
      .collect().head.getLong(0) == 3)
  }

  test("a staged file missing a table column fails loud, loads nothing") {
    wh
    val staging = Files.createTempDirectory("copy_bad").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("pk", "v") // no ts column
      .write.mode("append").parquet(staging)
    spark.sql("""CREATE TABLE cpy.db.bad (pk BIGINT, v STRING, ts INT)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    intercept[Exception](spark.sql(
      s"COPY INTO cpy.db.bad FROM '$staging'").collect())
    assert(spark.sql("SELECT count(*) FROM cpy.db.bad")
      .collect().head.getLong(0) == 0)
    // and the failed files are NOT marked loaded — a corrected re-COPY
    // after fixing the staging would still see them (markers only
    // follow a successful commit)
    val markers = new org.apache.hadoop.fs.Path(s"$wh/db/bad/_log/_copy")
    val fs = markers.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(markers) || fs.listStatus(markers).isEmpty)
  }
}
