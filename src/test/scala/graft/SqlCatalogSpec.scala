package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 SQL surface end-to-end: CREATE TABLE USING the graft catalog,
  * INSERT INTO (upsert semantics), INSERT OVERWRITE, SELECT with
  * pushdown, DELETE FROM, UPDATE, MERGE INTO, VERSION AS OF — all
  * through `spark.sql`, no DataFrame API in the statement path.
  */
class SqlCatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    // micros timestamps (not the INT96 default): INT96 footers carry no
    // usable stats, so timestamp bounds would never be metadata-answered
    // — the MIN/MAX pushdown spec needs the stats to exist
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.catalog.g", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    dir
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().toSeq.map(_.toSeq)

  test("CREATE TABLE / INSERT INTO upserts / SELECT / VERSION AS OF") {
    wh
    spark.sql("""CREATE TABLE g.db.t (pk BIGINT, ts INT, v STRING, region STRING)
                 USING graft PARTITIONED BY (region)
                 TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    assert(spark.sql("SELECT * FROM g.db.t").isEmpty)

    spark.sql("""INSERT INTO g.db.t VALUES
      (1, 0, 'a', 'r1'), (2, 0, 'b', 'r1'), (3, 0, 'c', 'r2')""")
    // second insert: same key 1 with HIGHER precombine wins, key 2 with
    // LOWER (stale) loses — precombine upsert through plain INSERT INTO
    spark.sql("INSERT INTO g.db.t VALUES (1, 5, 'a2', 'r1'), (4, 1, 'd', 'r2')")
    spark.sql("INSERT INTO g.db.t VALUES (2, -1, 'stale', 'r1')")

    assert(rows("SELECT pk, ts, v, region FROM g.db.t ORDER BY pk") == Seq(
      Seq(1L, 5, "a2", "r1"), Seq(2L, 0, "b", "r1"),
      Seq(3L, 0, "c", "r2"), Seq(4L, 1, "d", "r2")))

    // time travel: commit 0 was the first insert
    assert(rows("SELECT pk, v FROM g.db.t VERSION AS OF 0 ORDER BY pk") == Seq(
      Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))

    // pushdown path: partition-value predicate
    assert(rows("SELECT pk FROM g.db.t WHERE region = 'r2' ORDER BY pk") ==
      Seq(Seq(3L), Seq(4L)))
  }

  test("DELETE FROM via SupportsDelete") {
    wh
    spark.sql("""CREATE TABLE g.db.del (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.del VALUES (1,0,'a'), (2,0,'b'), (3,0,'c')")
    spark.sql("DELETE FROM g.db.del WHERE pk >= 2")
    assert(rows("SELECT pk FROM g.db.del ORDER BY pk") == Seq(Seq(1L)))
  }

  test("UPDATE: assignments evaluate against the old row; identity immutable") {
    wh
    spark.sql("""CREATE TABLE g.db.upd (pk BIGINT, ts INT, a INT, b INT)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.upd VALUES (1,0,10,100), (2,0,20,200), (3,0,30,300)")
    // swap-flavored update: both RHS see the OLD row (ANSI)
    spark.sql("UPDATE g.db.upd SET a = b, b = a + b WHERE pk <= 2")
    assert(rows("SELECT pk, a, b FROM g.db.upd ORDER BY pk") == Seq(
      Seq(1L, 100, 110), Seq(2L, 200, 220), Seq(3L, 30, 300)))
    val e = intercept[Exception] {
      spark.sql("UPDATE g.db.upd SET pk = 99 WHERE pk = 1")
    }
    assert(e.getMessage.contains("key/partition"))
  }

  test("MERGE INTO: update/delete/insert clauses through SQL") {
    wh
    spark.sql("""CREATE TABLE g.db.m (pk BIGINT, ts INT, qty INT)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.m VALUES (1,0,10), (2,0,20), (3,0,30)")
    locally {
      import spark.implicits._
      Seq((1L, 1, 111), (3L, 1, 333), (9L, 1, 999))
        .toDF("pk", "ts", "qty").createOrReplaceTempView("src")
    }

    spark.sql("""MERGE INTO g.db.m t USING src s
      ON t.pk = s.pk
      WHEN MATCHED AND t.pk = 3 THEN DELETE
      WHEN MATCHED THEN UPDATE SET qty = s.qty, ts = s.ts
      WHEN NOT MATCHED THEN INSERT *""")

    assert(rows("SELECT pk, qty FROM g.db.m ORDER BY pk") == Seq(
      Seq(1L, 111), Seq(2L, 20), Seq(9L, 999)))

    // non-key ON condition must be rejected, not silently misexecuted
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO g.db.m t USING src s
        ON t.qty = s.qty WHEN MATCHED THEN DELETE""")
    }
    assert(e.getMessage.toLowerCase.contains("record identity"))
  }

  test("INSERT OVERWRITE replaces the whole table in one commit") {
    wh
    spark.sql("""CREATE TABLE g.db.ovw (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.ovw VALUES (1,0,'a'), (2,0,'b')")
    spark.sql("INSERT OVERWRITE g.db.ovw VALUES (7,0,'z')")
    assert(rows("SELECT pk, v FROM g.db.ovw ORDER BY pk") == Seq(Seq(7L, "z")))
    // TRUNCATE TABLE rides SupportsDelete's truncate default
    spark.sql("TRUNCATE TABLE g.db.ovw")
    assert(spark.sql("SELECT * FROM g.db.ovw").isEmpty)
  }

  test("catalog metadata: SHOW TABLES, DROP TABLE, column pruning plan") {
    wh
    spark.sql("""CREATE TABLE g.db.meta (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    assert(spark.sql("SHOW TABLES IN g.db").collect()
      .exists(_.getString(1) == "meta"))
    spark.sql("INSERT INTO g.db.meta VALUES (1,0,'a')")
    // engine metadata columns stay internal
    assert(spark.sql("SELECT * FROM g.db.meta").columns.toSeq ==
      Seq("pk", "ts", "v"))
    spark.sql("DROP TABLE g.db.meta")
    assert(!spark.sql("SHOW TABLES IN g.db").collect()
      .exists(_.getString(1) == "meta"))
  }

  test("scans are snapshot-pinned: re-executing a DataFrame ignores later commits") {
    wh
    spark.sql("""CREATE TABLE g.db.pin (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.pin VALUES (1,0,'a'), (2,0,'b')")
    val df = spark.sql("SELECT pk FROM g.db.pin ORDER BY pk")
    assert(df.collect().length == 2) // resolves (and pins) the snapshot
    spark.sql("INSERT INTO g.db.pin VALUES (3,0,'c')")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "a resolved scan must not silently move to a newer snapshot")
    assert(spark.sql("SELECT count(*) FROM g.db.pin").head.getLong(0) == 3,
      "a fresh statement resolves the new head")
  }

  test("a scan resolved on an EMPTY table stays empty after a first writer lands") {
    wh
    spark.sql("""CREATE TABLE g.db.pin0 (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    val df = spark.sql("SELECT pk FROM g.db.pin0")
    assert(df.collect().isEmpty) // resolves (and pins) emptiness
    spark.sql("INSERT INTO g.db.pin0 VALUES (1,0,'a')")
    assert(df.collect().isEmpty,
      "an empty-at-resolution scan must not pick up a later first commit")
    assert(spark.sql("SELECT count(*) FROM g.db.pin0").head.getLong(0) == 1)
  }

  test("MERGE INTO ... UPDATE SET * / INSERT * expand; identity stays put") {
    wh
    spark.sql("""CREATE TABLE g.db.star (pk BIGINT, ts INT, qty INT)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.star VALUES (1,0,10), (2,0,20)")
    locally {
      import spark.implicits._
      Seq((1L, 1, 111), (5L, 1, 555))
        .toDF("pk", "ts", "qty").createOrReplaceTempView("starsrc")
    }
    spark.sql("""MERGE INTO g.db.star t USING starsrc s
      ON t.pk = s.pk
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(rows("SELECT pk, ts, qty FROM g.db.star ORDER BY pk") == Seq(
      Seq(1L, 1, 111), Seq(2L, 0, 20), Seq(5L, 1, 555)))
  }

  test("MERGE INTO ... WITH SCHEMA EVOLUTION adds the source's new columns") {
    wh
    spark.sql("""CREATE TABLE g.db.sevo (pk BIGINT, ts INT, qty INT)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.sevo VALUES (1,0,10), (2,0,20)")
    locally {
      import spark.implicits._
      Seq((1L, 1, 111, "x"), (5L, 1, 555, "y"))
        .toDF("pk", "ts", "qty", "tag").createOrReplaceTempView("sevosrc")
    }
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO g.db.sevo t USING sevosrc s
      ON t.pk = s.pk
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    // the new column exists, merged rows carry it, untouched rows null
    assert(rows("SELECT pk, ts, qty, tag FROM g.db.sevo ORDER BY pk") == Seq(
      Seq(1L, 1, 111, "x"), Seq(2L, 0, 20, null), Seq(5L, 1, 555, "y")))
    // the evolution rides the ordinary ALTER machinery: the commit-log
    // schema carries the minted column, later plain inserts see it
    spark.sql("INSERT INTO g.db.sevo VALUES (7, 0, 70, 'z')")
    assert(rows("SELECT tag FROM g.db.sevo WHERE pk = 7") == Seq(Seq("z")))
    // WITHOUT the clause, star expansion maps TARGET columns only: the
    // extra source column is ignored and the schema never changes
    locally {
      import spark.implicits._
      Seq((2L, 2, 222, "w", true)).toDF("pk", "ts", "qty", "tag", "extra")
        .createOrReplaceTempView("sevosrc2")
    }
    spark.sql("""MERGE INTO g.db.sevo t USING sevosrc2 s
      ON t.pk = s.pk
      WHEN MATCHED THEN UPDATE SET *""")
    assert(!spark.table("g.db.sevo").schema.fieldNames.contains("extra"),
      "no WITH SCHEMA EVOLUTION: the schema must not grow")
    assert(rows("SELECT qty, tag FROM g.db.sevo WHERE pk = 2") ==
      Seq(Seq(222, "w")))
  }

  test("VERSION AS OF predicate resolves against the PINNED schema after a rename") {
    wh
    spark.sql("""CREATE TABLE g.db.ren (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.ren VALUES (1,0,'a'), (2,0,'b')")
    spark.sql("ALTER TABLE g.db.ren RENAME COLUMN v TO w")
    // head exposes only w...
    assert(rows("SELECT pk FROM g.db.ren WHERE w = 'a'") == Seq(Seq(1L)))
    // ...but an as-of read filters on the OLD name (pushed into the
    // stats-skipping prune path, which must probe the as-of schema)
    assert(rows("SELECT pk FROM g.db.ren VERSION AS OF 0 WHERE v = 'a'") ==
      Seq(Seq(1L)))
  }

  test("CALL procedures: rollback / savepoint / clean / restore via SQL") {
    wh
    spark.sql("""CREATE TABLE g.db.proc (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.proc VALUES (1,0,'a'), (2,0,'b')") // c0
    spark.sql("INSERT INTO g.db.proc VALUES (3,1,'c')")            // c1
    // rollback retracts c1
    assert(rows("CALL g.system.rollback('db.proc')") == Seq(Seq(1L)))
    assert(rows("SELECT pk FROM g.db.proc ORDER BY pk") == Seq(Seq(1L), Seq(2L)))
    // savepoint c0, write more, restore back to c0
    spark.sql("INSERT INTO g.db.proc VALUES (9,2,'z')")
    assert(rows("CALL g.system.savepoint('db.proc', 0)") == Seq(Seq(0L)))
    assert(rows("CALL g.system.release_savepoint('db.proc', 0)") == Seq(Seq(0L)))
    spark.sql("CALL g.system.restore('db.proc', 0)")
    assert(rows("SELECT pk FROM g.db.proc ORDER BY pk") == Seq(Seq(1L), Seq(2L)))
    // clean + vacuum run and report (nothing old enough to delete here)
    spark.sql("CALL g.system.clean('db.proc', 10)")
    assert(rows("CALL g.system.vacuum('db.proc', 3600000)") == Seq(Seq(0L)))
  }

  test("CALL compact on a MoR table merges deltas into base files") {
    wh
    spark.sql("""CREATE TABLE g.db.morp (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts',
                   storageType='mor')""")
    spark.sql("INSERT INTO g.db.morp VALUES (1,0,'a')")
    spark.sql("INSERT INTO g.db.morp VALUES (1,1,'a2'), (2,0,'b')") // delta
    val cid = rows("CALL g.system.compact('db.morp')").head.head
      .asInstanceOf[Long]
    assert(cid >= 2L)
    assert(rows("SELECT pk, v FROM g.db.morp ORDER BY pk") ==
      Seq(Seq(1L, "a2"), Seq(2L, "b")))
  }

  test("CALL recluster rewrites deltas into cluster order via SQL") {
    wh
    spark.sql("""CREATE TABLE g.db.clus (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts',
                   storageType='mor', clusterCols='ts', statsCols='ts')""")
    spark.sql("INSERT INTO g.db.clus VALUES (1,5,'a')")
    spark.sql("INSERT INTO g.db.clus VALUES (2,1,'b'), (3,9,'c')") // delta
    val cid = rows("CALL g.system.recluster('db.clus')").head.head
      .asInstanceOf[Long]
    assert(cid >= 2L)
    assert(rows("SELECT pk, v FROM g.db.clus ORDER BY pk") ==
      Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
  }

  test("table functions: graft_history and graft_changes via SQL") {
    val w = wh
    spark.sql("""CREATE TABLE g.db.tvf (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.tvf VALUES (1,0,'a'), (2,0,'b')")
    spark.sql("INSERT INTO g.db.tvf VALUES (1,1,'a2')")
    spark.sql("DELETE FROM g.db.tvf WHERE pk = 2")
    val root = s"$w/db/tvf"
    assert(rows(s"SELECT commit_id, op FROM graft_history('$root') ORDER BY commit_id")
      == Seq(Seq(0L, "upsert"), Seq(1L, "upsert"), Seq(2L, "delete")))
    val ch = rows(s"""SELECT _change_type, pk FROM graft_changes('$root', 0, 2)
                      ORDER BY _change_type, pk""")
    assert(ch == Seq(Seq("delete", 2L), Seq("update", 1L)))
    // 4-arg form: the Delta table_changes CDF contract — updates split
    // into pre/post images, the 3-arg two-type form above unchanged
    val cdf = rows(s"""SELECT _change_type, pk, v
                       FROM graft_changes('$root', 0, 2, true)
                       ORDER BY _change_type, pk""")
    assert(cdf == Seq(Seq("delete", 2L, "b"),
      Seq("update_postimage", 1L, "a2"), Seq("update_preimage", 1L, "a")))
    // file inventory: every live path exists on disk with its real size
    val files = spark.sql(s"SELECT path, kind, bytes FROM graft_files('$root')")
      .collect()
    assert(files.nonEmpty && files.forall { r =>
      val f = new java.io.File(new java.net.URI(r.getString(0)).getPath)
      f.exists && r.getString(1) == "base" && r.getLong(2) == f.length
    }, "graft_files must inventory the live files with true sizes")
    // the commit-log metadata columns: recorded row counts sum to the
    // snapshot, key ranges recorded, no blooms on an unconfigured table
    assert(rows(s"SELECT CAST(sum(n_rows) AS BIGINT) FROM graft_files('$root')")
      == Seq(Seq(1L)))
    assert(spark.sql(s"SELECT * FROM graft_files('$root')").collect()
      .forall(r => !r.getAs[Boolean]("has_bloom") &&
        r.getAs[String]("kmin") != null && r.getAs[String]("kmax") != null))
  }

  test("CTAS stages atomically: success publishes, failure leaves no table") {
    wh
    spark.sql("""CREATE TABLE g.db.ct USING graft
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')
      AS SELECT * FROM VALUES (1L, 1, 'a'), (2L, 1, 'b') AS t(pk, ts, v)""")
    assert(rows("SELECT pk, ts, v FROM g.db.ct ORDER BY pk") ==
      Seq(Seq(1L, 1, "a"), Seq(2L, 1, "b")))
    // the staged first write is commit 0 — the timeline starts fresh
    assert(rows("SELECT pk FROM g.db.ct VERSION AS OF 0 ORDER BY pk") ==
      Seq(Seq(1L), Seq(2L)))

    // a CHECK constraint the SELECT violates fails the STAGED write:
    // the table must not exist afterwards (atomic CTAS contract)
    intercept[Exception] {
      spark.sql("""CREATE TABLE g.db.ctbad USING graft
        TBLPROPERTIES (keyCols='pk', precombineCol='ts', checks='pos:pk > 0')
        AS SELECT * FROM VALUES (-1L, 1, 'x') AS t(pk, ts, v)""")
    }
    assert(!spark.catalog.tableExists("g.db.ctbad"),
      "failed CTAS must leave no table behind")

    // CTAS with partitioning: layout property flows through staging
    spark.sql("""CREATE TABLE g.db.ctp USING graft PARTITIONED BY (region)
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')
      AS SELECT * FROM VALUES (1L, 1, 'r1'), (2L, 1, 'r2') AS t(pk, ts, region)""")
    assert(rows("SELECT pk FROM g.db.ctp WHERE region = 'r2'") == Seq(Seq(2L)))
  }

  test("REPLACE TABLE AS SELECT swaps atomically; old table serves until publish") {
    wh
    spark.sql("""CREATE TABLE g.db.rt USING graft
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')
      AS SELECT * FROM VALUES (1L, 1, 'old') AS t(pk, ts, v)""")
    // REPLACE: new schema (extra column), new contents, fresh timeline
    spark.sql("""REPLACE TABLE g.db.rt USING graft
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')
      AS SELECT * FROM VALUES (7L, 1, 'new', 42) AS t(pk, ts, v, extra)""")
    assert(rows("SELECT pk, v, extra FROM g.db.rt") == Seq(Seq(7L, "new", 42)))
    assert(rows("SELECT pk FROM g.db.rt VERSION AS OF 0") == Seq(Seq(7L)),
      "REPLACE must reset the timeline — commit 0 is the replacement")
    // upserts keep working against the relocated files
    spark.sql("INSERT INTO g.db.rt VALUES (7L, 2, 'newer', 43), (8L, 1, 'y', 0)")
    assert(rows("SELECT pk, v, extra FROM g.db.rt ORDER BY pk") ==
      Seq(Seq(7L, "newer", 43), Seq(8L, "y", 0)))

    // a failing REPLACE leaves the ORIGINAL intact
    intercept[Exception] {
      spark.sql("""REPLACE TABLE g.db.rt USING graft
        TBLPROPERTIES (keyCols='pk', precombineCol='ts', checks='c:pk < 0')
        AS SELECT * FROM VALUES (9L, 1, 'boom', 0) AS t(pk, ts, v, extra)""")
    }
    assert(rows("SELECT pk, v FROM g.db.rt ORDER BY pk") ==
      Seq(Seq(7L, "newer"), Seq(8L, "y")),
      "failed REPLACE must leave the original table untouched")

    // CREATE OR REPLACE on a missing table degrades to CREATE
    spark.sql("""CREATE OR REPLACE TABLE g.db.cor USING graft
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')
      AS SELECT 1L AS pk, 1 AS ts""")
    assert(rows("SELECT pk FROM g.db.cor") == Seq(Seq(1L)))
  }

  test("MERGE ON with residual conjuncts scopes the matched clauses") {
    wh
    spark.sql("""CREATE TABLE g.db.mres (pk BIGINT, ts INT, v STRING, grp STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""INSERT INTO g.db.mres VALUES
      (1, 0, 'a', 'x'), (2, 0, 'b', 'x'), (3, 0, 'c', 'y'), (4, 0, 'd', 'y')""")
    // residual t.grp = 'x' scopes matched clauses; source-side residual
    // s.v <> 'skip' composes; key 3/4 match the key but fail the residual
    // → no clause fires, and they are NOT re-inserted (keyed table)
    spark.sql("""MERGE INTO g.db.mres t USING (
        SELECT * FROM VALUES (1L, 1, 'A'), (2L, 1, 'skip'), (3L, 1, 'C'),
          (4L, 1, 'skip'), (9L, 1, 'new') AS s(pk, ts, v)) s
      ON t.pk = s.pk AND t.grp = 'x' AND s.v <> 'skip'
      WHEN MATCHED THEN UPDATE SET v = s.v, ts = s.ts
      WHEN NOT MATCHED THEN INSERT (pk, ts, v, grp) VALUES (s.pk, s.ts, s.v, 'z')""")
    assert(rows("SELECT pk, ts, v, grp FROM g.db.mres ORDER BY pk") == Seq(
      Seq(1L, 1, "A", "x"), Seq(2L, 0, "b", "x"),
      Seq(3L, 0, "c", "y"), Seq(4L, 0, "d", "y"),
      Seq(9L, 1, "new", "z")))
    // an ON clause missing a key equality still fails loud
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO g.db.mres t USING (SELECT 1L AS pk, 2 AS ts) s
        ON t.grp = 'x' WHEN MATCHED THEN DELETE""")
    }
    assert(e.getMessage.contains("record identity"))
  }

  test("readStream.table tails a catalog MoR table's change log by name") {
    wh
    spark.sql("""CREATE TABLE g.db.st (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES
                 (keyCols='pk', precombineCol='ts', storageType='mor')""")
    // first insert on an empty table is a base load (not a change delta);
    // the two that follow are delta commits — the tailable change log
    spark.sql("INSERT INTO g.db.st VALUES (1, 0, 'a'), (2, 0, 'b')")
    spark.sql("INSERT INTO g.db.st VALUES (1, 1, 'a2'), (3, 0, 'c')")
    spark.sql("DELETE FROM g.db.st WHERE pk = 2")
    val q = spark.readStream.table("g.db.st")
      .select("pk", "v", "_deleted")
      .writeStream.format("memory").queryName("st_tail").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("st_tail").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, "a2", false), (3L, "c", false), (2L, null, true)),
      s"catalog tail mismatch: $got")
  }

  test("writeStream.toTable runs the idempotent upsert sink by name") {
    wh
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("""CREATE TABLE g.db.sk (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    val mem = MemoryStream[(Long, Int, String)]
    mem.addData((1L, 0, "a"), (2L, 0, "b"))
    val ckpt = Files.createTempDirectory("sk_ckpt").toString
    // format("graft") is required by Spark's V1-fallback contract: the
    // writer's source must match the table provider (same rule as any
    // provider-backed catalog table)
    val q = mem.toDF().toDF("pk", "ts", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt).toTable("g.db.sk")
    try {
      q.processAllAvailable()
      // a later micro-batch upserts: key 1 re-keyed with higher precombine
      mem.addData((1L, 5, "a2"), (3L, 1, "c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(rows("SELECT pk, ts, v FROM g.db.sk ORDER BY pk") == Seq(
      Seq(1L, 5, "a2"), Seq(2L, 0, "b"), Seq(3L, 1, "c")))
  }

  test("CALL clone: zero-copy shallow clone via SQL, divergent thereafter") {
    wh
    spark.sql("""CREATE TABLE g.db.cl_src (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.cl_src VALUES (1,0,'a'), (2,0,'b')")
    spark.sql("INSERT INTO g.db.cl_src VALUES (1,1,'a2'), (3,0,'c')")
    // clone at head; reads equal the source snapshot
    spark.sql("CALL g.system.clone('db.cl_src', 'db.cl_dst', -1L)").collect()
    assert(rows("SELECT pk, v FROM g.db.cl_dst ORDER BY pk") ==
      rows("SELECT pk, v FROM g.db.cl_src ORDER BY pk"))
    // time-travel clone at the seed commit
    spark.sql("CALL g.system.clone('db.cl_src', 'db.cl_v0', 0L)").collect()
    assert(rows("SELECT pk, v FROM g.db.cl_v0 ORDER BY pk") ==
      Seq(Seq(1L, "a"), Seq(2L, "b")))
    // writes diverge: clone upserts do not touch the source
    spark.sql("INSERT INTO g.db.cl_dst VALUES (9,0,'z')")
    assert(rows("SELECT count(*) FROM g.db.cl_dst") == Seq(Seq(4L)))
    assert(rows("SELECT count(*) FROM g.db.cl_src") == Seq(Seq(3L)))
    // an existing target fails clean and leaves no staging junk
    intercept[Exception] {
      spark.sql("CALL g.system.clone('db.cl_src', 'db.cl_dst', -1L)").collect()
    }
    assert(rows("SELECT count(*) FROM g.db.cl_dst") == Seq(Seq(4L)))
  }

  test("readStream.table tails a catalog CoW table (the reference's table type)") {
    wh
    spark.sql("""CREATE TABLE g.db.stc (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.stc VALUES (1, 0, 'a'), (2, 0, 'b')")
    // update 1 (2 is rewritten but unchanged — must NOT surface), add 3
    spark.sql("INSERT INTO g.db.stc VALUES (1, 1, 'a2'), (3, 0, 'c')")
    spark.sql("DELETE FROM g.db.stc WHERE pk = 2")
    val q = spark.readStream.table("g.db.stc")
      .select("pk", "v", "_deleted")
      .writeStream.format("memory").queryName("stc_tail").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stc_tail").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, "a", false), (2L, "b", false), // initial load
      (1L, "a2", false), (3L, "c", false),                // effective changes
      (2L, "b", true)),                                   // delete tombstone
      s"CoW catalog tail mismatch: $got")
  }

  test("writeStream.toTable into a MoR table: sink ignores the advertised tail schema") {
    wh
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("""CREATE TABLE g.db.skm (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES
                 (keyCols='pk', precombineCol='ts', storageType='mor')""")
    val mem = MemoryStream[(Long, Int, String)]
    mem.addData((1L, 0, "a"), (2L, 0, "b"))
    val ckpt = Files.createTempDirectory("skm_ckpt").toString
    // the shared CatalogTable advertises the TAIL schema (_seq/_deleted);
    // the sink path must upsert the query's own 3-column frame anyway
    val q = mem.toDF().toDF("pk", "ts", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt).toTable("g.db.skm")
    try {
      q.processAllAvailable()
      mem.addData((1L, 5, "a2"))
      q.processAllAvailable()
    } finally q.stop()
    assert(rows("SELECT pk, ts, v FROM g.db.skm ORDER BY pk") == Seq(
      Seq(1L, 5, "a2"), Seq(2L, 0, "b")))
  }

  test("count(*) answers from commit-log metadata through aggregate pushdown") {
    wh
    spark.sql("""CREATE TABLE g.db.cnt (pk BIGINT, ts INT, v STRING, region STRING)
                 USING graft PARTITIONED BY (region)
                 TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""INSERT INTO g.db.cnt VALUES
      (1, 0, 'a', 'r1'), (2, 0, 'b', 'r1'), (3, 0, 'c', 'r2')""")
    spark.sql("INSERT INTO g.db.cnt VALUES (1, 5, 'a2', 'r1'), (4, 1, 'd', 'r2')")
    assert(rows("SELECT count(*) FROM g.db.cnt") == Seq(Seq(4L)))
    assert(rows(
      "SELECT region, count(*) FROM g.db.cnt GROUP BY region ORDER BY region") ==
      Seq(Seq("r1", 2L), Seq("r2", 2L)))
    // a PARTITION-equality filtered count is a metadata question too:
    // the exactness prover certifies file pruning = row filtering
    assert(rows("SELECT count(*) FROM g.db.cnt WHERE region = 'r1'") == Seq(Seq(2L)))
    assert(rows("SELECT count(*) FROM g.db.cnt WHERE region IN ('r1','r2')") ==
      Seq(Seq(4L)))
    // the proof the counts never scanned: remove every data file — real
    // scans now fail, the counts still answer
    val p = new org.apache.hadoop.fs.Path(wh, "db/cnt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var dropped = 0
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) { fs.delete(f, false); dropped += 1 }
    }
    assert(dropped > 0)
    intercept[Exception] { rows("SELECT sum(ts) FROM g.db.cnt") }
    assert(rows("SELECT count(*) FROM g.db.cnt") == Seq(Seq(4L)))
    assert(rows(
      "SELECT region, count(*) FROM g.db.cnt GROUP BY region ORDER BY region") ==
      Seq(Seq("r1", 2L), Seq("r2", 2L)))
    // filtered counts with the files gone: partition equality / IN are
    // metadata reads; a filter on a NON-partition column is a row
    // question and must scan (= fail here) — the control
    assert(rows("SELECT count(*) FROM g.db.cnt WHERE region = 'r1'") == Seq(Seq(2L)))
    assert(rows("SELECT count(*) FROM g.db.cnt WHERE region IN ('r1','r2')") ==
      Seq(Seq(4L)))
    assert(rows(
      """SELECT region, count(*) FROM g.db.cnt WHERE region = 'r2'
         GROUP BY region""") == Seq(Seq("r2", 2L)))
    intercept[Exception] { rows("SELECT count(*) FROM g.db.cnt WHERE v = 'a'") }
    // the provers pin to the time-travel snapshot: the version-0 count
    // also answers from its own commit's metadata, files still gone
    assert(rows("SELECT count(*) FROM g.db.cnt VERSION AS OF 0") == Seq(Seq(3L)))
  }

  test("MIN/MAX of stats columns answer from commit-log metadata") {
    wh
    spark.sql("""CREATE TABLE g.db.mm (pk BIGINT, ts INT, d DATE, ev TIMESTAMP,
                   region STRING)
                 USING graft PARTITIONED BY (region)
                 TBLPROPERTIES (keyCols='pk', precombineCol='ts',
                   statsCols='pk,d,ev')""")
    spark.sql("""INSERT INTO g.db.mm VALUES
      (1, 0, DATE '2024-01-02', TIMESTAMP '2024-01-02 03:04:05', 'r1'),
      (2, 0, DATE '2024-03-04', TIMESTAMP '2024-03-04 05:06:07', 'r2')""")
    spark.sql("""INSERT INTO g.db.mm VALUES
      (3, 0, DATE '2023-12-31', TIMESTAMP '2024-05-06 07:08:09', 'r1')""")
    def q(): Seq[Seq[Any]] = rows(
      """SELECT count(*), min(pk), max(pk), min(d), max(d), min(ev), max(ev)
         FROM g.db.mm""")
    val expected = Seq(Seq(3L, 1L, 3L,
      java.sql.Date.valueOf("2023-12-31"), java.sql.Date.valueOf("2024-03-04"),
      java.sql.Timestamp.valueOf("2024-01-02 03:04:05"),
      java.sql.Timestamp.valueOf("2024-05-06 07:08:09")))
    assert(q() == expected)
    // bounds of a STRING column are never metadata-answered (stats may
    // be truncated) — this query scans, which doubles as the control
    assert(rows("SELECT min(region) FROM g.db.mm") == Seq(Seq("r1")))
    // the proof: data files gone, count+bounds still answer; the string
    // bound (a real scan) now fails
    val p = new org.apache.hadoop.fs.Path(wh, "db/mm")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var dropped = 0
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) { fs.delete(f, false); dropped += 1 }
    }
    assert(dropped > 0)
    intercept[Exception] { rows("SELECT min(region) FROM g.db.mm") }
    assert(q() == expected)
    // grouped by the partition column: counts AND bounds per partition,
    // still answered with the data files gone
    assert(rows(
      """SELECT region, count(*), min(pk), max(d) FROM g.db.mm
         GROUP BY region ORDER BY region""") == Seq(
      Seq("r1", 2L, 1L, java.sql.Date.valueOf("2024-01-02")),
      Seq("r2", 1L, 2L, java.sql.Date.valueOf("2024-03-04"))))
  }

  test("dynamic partition overwrite replaces only the batch's partitions") {
    wh
    spark.sql("""CREATE TABLE g.db.dyn (pk BIGINT, ts INT, v STRING, region STRING)
                 USING graft PARTITIONED BY (region)
                 TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""INSERT INTO g.db.dyn VALUES
      (1, 0, 'a', 'r1'), (2, 0, 'b', 'r1'), (3, 0, 'c', 'r2')""")
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      spark.sql("INSERT OVERWRITE g.db.dyn VALUES (9, 1, 'z', 'r1')")
    finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // r1 fully replaced (keys 1 and 2 gone), r2 untouched
    assert(rows("SELECT pk, v, region FROM g.db.dyn ORDER BY pk") == Seq(
      Seq(3L, "c", "r2"), Seq(9L, "z", "r1")))
    // the DataFrame API spelling drives the same path
    import spark.implicits._
    Seq((7L, 0, "y", "r2")).toDF("pk", "ts", "v", "region")
      .writeTo("g.db.dyn").overwritePartitions()
    assert(rows("SELECT pk, v, region FROM g.db.dyn ORDER BY pk") == Seq(
      Seq(7L, "y", "r2"), Seq(9L, "z", "r1")))
    // static PARTITION-spec overwrite = replaceWhere: the NAMED
    // partition clears wholesale (key 9 vanishes without being
    // re-written) and the batch lands, one commit
    spark.sql("INSERT OVERWRITE g.db.dyn PARTITION (region = 'r1') " +
      "SELECT 5, 0, 'q'")
    assert(rows("SELECT pk, v, region FROM g.db.dyn ORDER BY pk") == Seq(
      Seq(5L, "q", "r1"), Seq(7L, "y", "r2")))
    // a batch row OUTSIDE the replaced region fails the whole statement
    // and leaves the table intact
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: msgs(x.getCause))
    val e = intercept[Exception] {
      Seq((8L, 0, "w", "r2")).toDF("pk", "ts", "v", "region")
        .writeTo("g.db.dyn")
        .overwrite(org.apache.spark.sql.functions.col("region") === "r1")
    }
    assert(msgs(e).exists(_.contains("satisfy the predicate")), e.getMessage)
    assert(rows("SELECT pk, v, region FROM g.db.dyn ORDER BY pk") == Seq(
      Seq(5L, "q", "r1"), Seq(7L, "y", "r2")))
  }

  test("bloomKeys TBLPROPERTIES reaches the writer: key bloom sidecars appear") {
    wh
    spark.sql("""CREATE TABLE g.db.bk (pk BIGINT, ts INT, v STRING)
                 USING graft
                 TBLPROPERTIES (keyCols='pk', precombineCol='ts', bloomKeys='100')""")
    spark.sql("INSERT INTO g.db.bk VALUES (1, 0, 'a'), (2, 0, 'b')")
    val p = new org.apache.hadoop.fs.Path(wh, "db/bk")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var sidecars = 0
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".bf")) sidecars += 1
    assert(sidecars > 0, "no bloom sidecars written for a bloomKeys table")
    assert(rows("SELECT pk FROM g.db.bk ORDER BY pk") == Seq(Seq(1L), Seq(2L)))
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES mutates maintenance knobs only") {
    wh
    spark.sql("""CREATE TABLE g.db.props (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.props VALUES (1, 0, 'a'), (2, 0, 'bb')")
    // a new CHECK validates against EXISTING rows before landing
    spark.sql("ALTER TABLE g.db.props SET TBLPROPERTIES " +
      "('checks'='len_ok:length(v) < 10')")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE g.db.props SET TBLPROPERTIES ('checks'='pk_neg:pk < 0')")
    }
    assert(e1.getMessage.contains("existing rows violate"), e1.getMessage)
    // ...and the landed check enforces on subsequent writes
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO g.db.props VALUES (3, 1, 'waytoolongvalue')")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e2).exists(_.contains("len_ok")), e2.getMessage)
    // turning bloomKeys on affects FUTURE commits: sidecars appear
    spark.sql("ALTER TABLE g.db.props SET TBLPROPERTIES ('bloomKeys'='50')")
    spark.sql("INSERT INTO g.db.props VALUES (4, 0, 'd')")
    val p = new org.apache.hadoop.fs.Path(wh, "db/props")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var sidecars = 0
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".bf")) sidecars += 1
    assert(sidecars > 0)
    // layout identity is immutable
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE g.db.props SET TBLPROPERTIES ('keyCols'='v')")
    }
    assert(e3.getMessage.contains("not alterable"), e3.getMessage)
    // an invalid checkMode fails at CREATE — never persisted, so it can
    // never brick a table whose every read would re-validate it
    val e4 = intercept[Exception] {
      spark.sql("""CREATE TABLE g.db.badmode (pk BIGINT, ts INT)
                   USING graft TBLPROPERTIES
                   (keyCols='pk', precombineCol='ts', checkMode='ignore')""")
    }
    assert(e4.getMessage.contains("checkMode must be fail|drop|warn"),
      e4.getMessage)
    // warn mode through SQL: the violating row LANDS, observed not gated
    spark.sql("ALTER TABLE g.db.props SET TBLPROPERTIES ('checkMode'='warn')")
    spark.sql("INSERT INTO g.db.props VALUES (7, 1, 'way-too-long-but-lands')")
    assert(rows("SELECT pk FROM g.db.props WHERE pk = 7") == Seq(Seq(7L)))
    spark.sql("DELETE FROM g.db.props WHERE pk = 7")
    // switching to drop mode quarantines instead of failing
    spark.sql("ALTER TABLE g.db.props SET TBLPROPERTIES ('checkMode'='drop')")
    spark.sql("INSERT INTO g.db.props VALUES (6, 1, 'also-way-too-long')")
    assert(rows("SELECT pk FROM g.db.props WHERE pk = 6").isEmpty)
    spark.sql("ALTER TABLE g.db.props SET TBLPROPERTIES ('checkMode'='fail')")
    // UNSET clears the knob: the length check no longer applies
    spark.sql("ALTER TABLE g.db.props UNSET TBLPROPERTIES ('checks')")
    spark.sql("INSERT INTO g.db.props VALUES (5, 0, 'nowlongisfine!')")
    assert(rows("SELECT pk FROM g.db.props ORDER BY pk") ==
      Seq(Seq(1L), Seq(2L), Seq(4L), Seq(5L)))
    // SHOW TBLPROPERTIES surfaces the live knob values
    val props = spark.sql("SHOW TBLPROPERTIES g.db.props").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("bloomKeys").contains("50"), props.toString)
    assert(!props.contains("checks"))
    // SHOW CREATE TABLE reproduces a runnable definition with the knobs
    val ddl = spark.sql("SHOW CREATE TABLE g.db.props").head.getString(0)
    assert(ddl.contains("graft") && ddl.contains("keyCols") &&
      ddl.contains("bloomKeys"), ddl)
  }

  test("write-audit-publish through CALL procedures") {
    wh
    spark.sql("""CREATE TABLE g.db.wap (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.wap VALUES (1, 0, 'a'), (2, 0, 'b'), (3, 0, 'c')")
    spark.sql("CALL g.system.clone('db.wap', 'db.wap_audit', -1L)").collect()
    // audited changes land on the clone; the source is untouched
    spark.sql("INSERT INTO g.db.wap_audit VALUES (1, 5, 'a2'), (4, 1, 'd')")
    spark.sql("DELETE FROM g.db.wap_audit WHERE pk = 3")
    assert(rows("SELECT pk, v FROM g.db.wap ORDER BY pk") ==
      Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    // publish fast-forwards the audit's net effect in one commit
    val pub = spark.sql("CALL g.system.publish('db.wap', 'db.wap_audit')")
      .head.getLong(0)
    assert(pub >= 0)
    assert(rows("SELECT pk, v FROM g.db.wap ORDER BY pk") ==
      Seq(Seq(1L, "a2"), Seq(2L, "b"), Seq(4L, "d")))
    // a source that advanced since the clone refuses the publish
    spark.sql("CALL g.system.clone('db.wap', 'db.wap_audit2', -1L)").collect()
    spark.sql("INSERT INTO g.db.wap_audit2 VALUES (5, 1, 'e')")
    spark.sql("INSERT INTO g.db.wap VALUES (6, 1, 'f')")
    val e = intercept[Exception] {
      spark.sql("CALL g.system.publish('db.wap', 'db.wap_audit2')").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("fast-forward")), e.getMessage)
  }

  test("a CHECK expression containing ';' round-trips the property codec") {
    // codec level: render/parse are inverses with ';' and '\' in exprs
    val m = Map("no_semi" -> "v != 'a;b'", "back" -> "v != 'c\\d'",
      "plain" -> "pk > 0")
    assert(graft.sql.ChecksProp.parse(graft.sql.ChecksProp.render(m)) == m)
    // end to end: the ALTER lands, SHOW TBLPROPERTIES emits the escaped
    // form, and feeding that form back through ALTER parses to the SAME
    // constraint set (the SHOW CREATE TABLE round-trip the escaping
    // exists for) — and the constraint ENFORCES with its literal ';'
    wh
    spark.sql("""CREATE TABLE g.db.semi (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("ALTER TABLE g.db.semi SET TBLPROPERTIES " +
      """('checks'="no_semi:v != 'a\\;b';plain:pk > 0")""")
    val shown = spark.sql("SHOW TBLPROPERTIES g.db.semi").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap.apply("checks")
    assert(graft.sql.ChecksProp.parse(shown) ==
      Map("no_semi" -> "v != 'a;b'", "plain" -> "pk > 0"), shown)
    // (doubling '\' is plain SQL string-literal quoting, not the codec's)
    val sqlLit = shown.replace("\\", "\\\\")
    spark.sql(s"""ALTER TABLE g.db.semi SET TBLPROPERTIES ('checks'="$sqlLit")""")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO g.db.semi VALUES (1, 0, 'a;b')")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("no_semi")), e.getMessage)
    spark.sql("INSERT INTO g.db.semi VALUES (2, 0, 'ok')")
    assert(rows("SELECT pk FROM g.db.semi") == Seq(Seq(2L)))
  }

  test("metadata tables: db.t.history / .files / .partitions / .tags") {
    wh
    spark.sql("""CREATE TABLE g.db.mt (pk BIGINT, ts INT, v STRING, region STRING)
                 USING graft PARTITIONED BY (region)
                 TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO g.db.mt VALUES (1, 0, 'a', 'EU'), (2, 0, 'b', 'US')")
    spark.sql("INSERT INTO g.db.mt VALUES (3, 0, 'c', 'EU')")
    spark.sql("CALL g.system.create_tag('db.mt', 'v1', 1L)").collect()

    assert(rows("SELECT commit_id, op FROM g.db.mt.history ORDER BY commit_id")
      .map(r => (r(0), r(1))).nonEmpty)
    assert(rows("SELECT commit_id FROM g.db.mt.history ORDER BY commit_id")
      == Seq(Seq(0L), Seq(1L)))
    assert(rows("SELECT name, commit_id FROM g.db.mt.tags") ==
      Seq(Seq("v1", 1L)))
    // files: every live file accounted, footer rows sum to the row count
    val files = spark.sql("SELECT part, rows, bytes FROM g.db.mt.files").collect()
    assert(files.map(_.getLong(1)).sum == 3L)
    assert(files.forall(_.getLong(2) > 0L))
    // partitions: per-partition footer sums == per-partition counts (CoW)
    assert(rows("""SELECT part, rows_written FROM g.db.mt.partitions
                   ORDER BY part""") == Seq(Seq("EU", 2L), Seq("US", 1L)))
    // metadata tables compose with plain SQL (join against the data)
    assert(spark.sql("""SELECT count(*) FROM g.db.mt t
        JOIN g.db.mt.partitions p ON t.region = p.part""").head.getLong(0) == 3L)
    // an unknown suffix still errors as a missing table
    intercept[Exception] { spark.sql("SELECT * FROM g.db.mt.nope").collect() }
    spark.sql("DROP TABLE g.db.mt")
  }

  test("db.t.ro: read-optimized MoR view skips pending deltas, read-only") {
    wh
    spark.sql("""CREATE TABLE g.db.ro_t (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk',
                   precombineCol='ts', storageType='mor')""")
    spark.sql("INSERT INTO g.db.ro_t VALUES (1, 0, 'base1'), (2, 0, 'base2')") // c0 base
    spark.sql("INSERT INTO g.db.ro_t VALUES (1, 1, 'delta1'), (3, 1, 'new3')") // c1 delta
    // snapshot merges; _ro sees the base state only
    assert(rows("SELECT pk, v FROM g.db.ro_t ORDER BY pk") ==
      Seq(Seq(1L, "delta1"), Seq(2L, "base2"), Seq(3L, "new3")))
    assert(rows("SELECT pk, v FROM g.db.ro_t.ro ORDER BY pk") ==
      Seq(Seq(1L, "base1"), Seq(2L, "base2")))
    // predicates prune and filter on the ro view like any scan
    assert(rows("SELECT v FROM g.db.ro_t.ro WHERE pk = 1") == Seq(Seq("base1")))
    // after compaction the views agree
    spark.sql("CALL g.system.compact('db.ro_t')").collect()
    assert(rows("SELECT pk, v FROM g.db.ro_t.ro ORDER BY pk") ==
      rows("SELECT pk, v FROM g.db.ro_t ORDER BY pk"))
    // read-only: writes refuse with a clear error
    val e = intercept[Exception] {
      spark.sql("INSERT INTO g.db.ro_t.ro VALUES (9, 9, 'x')")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("read-only")), e.getMessage)
    spark.sql("DROP TABLE g.db.ro_t")
  }

  test("checkpointEvery knob + CALL graft.system.checkpoint") {
    wh
    spark.sql("""CREATE TABLE g.db.ckpt (pk BIGINT, ts INT, v STRING)
                 USING graft TBLPROPERTIES (keyCols='pk',
                   precombineCol='ts', checkpointEvery='2')""")
    val loc = s"$wh/db/ckpt"
    def cks(): Seq[String] = {
      val dir = new java.io.File(loc, "_log")
      Option(dir.list()).map(_.toSeq).getOrElse(Seq.empty)
        .filter(_.startsWith("ckpt-")).sorted
    }
    spark.sql("INSERT INTO g.db.ckpt VALUES (1, 0, 'a')") // c0
    assert(cks().isEmpty)
    spark.sql("INSERT INTO g.db.ckpt VALUES (2, 0, 'b')") // c1 → cadence hit
    assert(cks() == Seq("ckpt-00000001.json"), cks())
    // the knob survives the SHOW TBLPROPERTIES round trip and ALTER
    assert(spark.sql("SHOW TBLPROPERTIES g.db.ckpt").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .get("checkpointEvery").contains("2"))
    spark.sql("ALTER TABLE g.db.ckpt SET TBLPROPERTIES ('checkpointEvery'='50')")
    spark.sql("INSERT INTO g.db.ckpt VALUES (3, 0, 'c')") // c2: cadence not hit
    assert(cks() == Seq("ckpt-00000001.json"))
    // forced materialization at the head, and reads stay correct
    assert(spark.sql("CALL g.system.checkpoint('db.ckpt')").head.getLong(0) == 2L)
    assert(cks() == Seq("ckpt-00000001.json", "ckpt-00000002.json"))
    assert(rows("SELECT pk FROM g.db.ckpt ORDER BY pk") ==
      Seq(Seq(1L), Seq(2L), Seq(3L)))
    spark.sql("DROP TABLE g.db.ckpt")
  }

  test("DELETE FROM with a partition predicate is metadata-only (no scan, no rewrite)") {
    wh
    spark.sql("""CREATE TABLE g.db.retn (pk BIGINT, ts INT, v STRING, region STRING)
                 USING graft PARTITIONED BY (region)
                 TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""INSERT INTO g.db.retn VALUES
      (1,0,'a','r1'), (2,0,'b','r1'), (3,0,'c','r2'), (4,0,'d','r3')""")
    // remove every data file: anything that scans OR rewrites now fails —
    // the surviving DELETEs below are therefore provably metadata-only
    val p = new org.apache.hadoop.fs.Path(wh, "db/retn")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var dropped = 0
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) { fs.delete(f, false); dropped += 1 }
    }
    assert(dropped > 0)
    intercept[Exception] { rows("SELECT sum(ts) FROM g.db.retn") }
    // retention shape: a RANGE predicate on the partition column
    spark.sql("DELETE FROM g.db.retn WHERE region < 'r2'")
    assert(rows("SELECT count(*) FROM g.db.retn") == Seq(Seq(2L)))
    // IN-list partition predicate
    spark.sql("DELETE FROM g.db.retn WHERE region IN ('r3')")
    assert(rows("SELECT count(*) FROM g.db.retn") == Seq(Seq(1L)))
    // a non-partition predicate is a row question — it must read (= fail
    // here, the control that the fast path is a prover, not a guess)
    intercept[Exception] { spark.sql("DELETE FROM g.db.retn WHERE v = 'c'") }
  }

  test("bloomCols property: CREATE + SHOW TBLPROPERTIES + ALTER round trip") {
    wh
    spark.sql("""CREATE TABLE g.db.bcol (pk BIGINT, ts INT, ref BIGINT)
                 USING graft TBLPROPERTIES
                 (keyCols='pk', precombineCol='ts', bloomCols='ref')""")
    spark.sql("INSERT INTO g.db.bcol VALUES (1,0,11),(2,0,22)")
    assert(rows("SHOW TBLPROPERTIES g.db.bcol")
      .exists(r => r(0) == "bloomCols" && r(1) == "ref"))
    assert(rows("SELECT pk FROM g.db.bcol WHERE ref = 22") == Seq(Seq(2L)))
    spark.sql("ALTER TABLE g.db.bcol UNSET TBLPROPERTIES ('bloomCols')")
    spark.sql("INSERT INTO g.db.bcol VALUES (3,0,33)")
    assert(rows("SELECT pk FROM g.db.bcol WHERE ref = 33") == Seq(Seq(3L)))
    // a nonexistent column refuses at ALTER time, not at the next write
    intercept[Exception] {
      spark.sql("ALTER TABLE g.db.bcol SET TBLPROPERTIES ('bloomCols'='nope')")
    }
  }

  test("SUM pushdown: metadata-answered, NULL-correct, proven by deleting files") {
    wh
    spark.sql("""CREATE TABLE g.db.sums (pk BIGINT, ts INT, region STRING,
                   x INT, v INT)
                 USING graft PARTITIONED BY (region)
                 TBLPROPERTIES (keyCols='pk', precombineCol='ts',
                   sumCols='x,v')""")
    spark.sql("""INSERT INTO g.db.sums VALUES
      (1,0,'r1',10,NULL), (2,0,'r1',20,NULL), (3,0,'r2',5,7), (4,0,'r2',6,8)""")
    assert(rows("SELECT sum(x) FROM g.db.sums") == Seq(Seq(41L)))
    // all-NULL column slice sums to NULL through the metadata path too
    assert(rows("SELECT sum(v) FROM g.db.sums WHERE region = 'r1'") ==
      Seq(Seq(null)))
    assert(rows("SELECT sum(x), sum(v) FROM g.db.sums WHERE region = 'r2'") ==
      Seq(Seq(11L, 15L)))
    // the proof: with every data file gone, sums still answer while a
    // non-sum column's aggregate must scan (= fail)
    val p = new org.apache.hadoop.fs.Path(wh, "db/sums")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var dropped = 0
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) { fs.delete(f, false); dropped += 1 }
    }
    assert(dropped > 0)
    assert(rows("SELECT sum(x), count(*) FROM g.db.sums") == Seq(Seq(41L, 4L)))
    assert(rows("SELECT sum(v) FROM g.db.sums WHERE region = 'r1'") ==
      Seq(Seq(null)))
    // the GROUPED form answers from per-partition metadata sums too
    assert(rows("""SELECT region, sum(x), sum(v) FROM g.db.sums
                   GROUP BY region ORDER BY region""") ==
      Seq(Seq("r1", 30L, null), Seq("r2", 11L, 15L)))
    intercept[Exception] { rows("SELECT sum(ts) FROM g.db.sums") }
  }

  test("SUM pushdown: pending MoR deltas fall back; compaction re-enables metadata") {
    wh
    spark.sql("""CREATE TABLE g.db.sums_mor (pk BIGINT, ts INT, x INT)
                 USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts',
                   storageType='mor', sumCols='x')""")
    spark.sql("INSERT INTO g.db.sums_mor VALUES (1,0,10), (2,0,20)")
    spark.sql("INSERT INTO g.db.sums_mor VALUES (1,1,100)") // delta update
    // correct while deltas pend (the scan path owns this regime)
    assert(rows("SELECT sum(x) FROM g.db.sums_mor") == Seq(Seq(120L)))
    spark.sql("CALL g.system.compact('db.sums_mor')")
    assert(rows("SELECT sum(x) FROM g.db.sums_mor") == Seq(Seq(120L)))
    // compaction re-recorded per-file sums: with every data file gone,
    // the sum still answers — the metadata path, proven
    val p = new org.apache.hadoop.fs.Path(wh, "db/sums_mor")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var dropped = 0
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) { fs.delete(f, false); dropped += 1 }
    }
    assert(dropped > 0)
    assert(rows("SELECT sum(x) FROM g.db.sums_mor") == Seq(Seq(120L)))
  }
}
