package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{CommitConflict, GraftTxn, LakeTable, LakeTableConfig}

/** Multi-table transactions ([[graft.lake.GraftTxn]]): staged commits,
  * one atomic decision, lazy crash-safe materialization, and the
  * engine invariants around undecided transactions.
  */
class TxnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_txn").toString

  private def mk(root: String, part: Boolean = false): LakeTable = {
    val t = LakeTable(spark, LakeTableConfig(root,
      keyCols = Seq("pk"), precombineCol = "ts",
      partitionCols = if (part) Seq("part") else Seq.empty))
    t.bulkInsert(Seq((1L, 1, "a", 0), (2L, 2, "b", 0))
      .toDF("pk", "part", "v", "ts"))
    t
  }

  private def rows(t: LakeTable): Set[(Long, String)] =
    LakeTable(spark, t.config).read()
      .select("pk", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("commit makes writes to two tables visible atomically") {
    val dir = freshDir()
    val (a, b) = (mk(s"$dir/a"), mk(s"$dir/b"))
    val txn = GraftTxn.begin(spark, s"$dir/_txns")
    txn.table(a).upsert(Seq((1L, 1, "a2", 1)).toDF("pk", "part", "v", "ts"))
    txn.table(b).upsert(Seq((3L, 3, "c", 1)).toDF("pk", "part", "v", "ts"))
    // staged: INVISIBLE on both tables (fresh handles = fresh caches)
    assert(rows(a) == Set((1L, "a"), (2L, "b")))
    assert(rows(b) == Set((1L, "a"), (2L, "b")))
    txn.commit()
    assert(rows(a) == Set((1L, "a2"), (2L, "b")))
    assert(rows(b) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // materialized commits are ordinary commits: time travel works
    assert(LakeTable(spark, a.config).readAsOf(0)
      .select("pk").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("abort leaves both tables untouched and retires the staged ids") {
    val dir = freshDir()
    val (a, b) = (mk(s"$dir/a"), mk(s"$dir/b"))
    val txn = GraftTxn.begin(spark, s"$dir/_txns")
    txn.table(a).upsert(Seq((1L, 1, "BAD", 1)).toDF("pk", "part", "v", "ts"))
    txn.table(b).delete(Seq(2L).toDF("pk"))
    txn.abort()
    assert(rows(a) == Set((1L, "a"), (2L, "b")))
    assert(rows(b) == Set((1L, "a"), (2L, "b")))
    // the aborted id is retired, never reused: the next commit skips it
    val a2 = LakeTable(spark, a.config)
    a2.upsert(Seq((9L, 9, "z", 2)).toDF("pk", "part", "v", "ts"))
    assert(a2.log.latestId.contains(2L),
      s"aborted staged id 1 must retire; head = ${a2.log.latestId}")
  }

  test("undecided: same-partition writer conflicts, disjoint writer rebases") {
    val dir = freshDir()
    val a = mk(s"$dir/a", part = true)
    val txn = GraftTxn.begin(spark, s"$dir/_txns")
    txn.table(a).upsert(Seq((1L, 1, "a2", 1)).toDF("pk", "part", "v", "ts"))
    // same partition (part=1): must conflict against the staged commit
    val w = LakeTable(spark, a.config)
    intercept[CommitConflict](
      w.upsert(Seq((10L, 1, "x", 1)).toDF("pk", "part", "v", "ts")))
    // disjoint partition (part=2): rebases over the staged commit
    w.upsert(Seq((20L, 2, "y", 1)).toDF("pk", "part", "v", "ts"))
    assert(rows(a).contains((20L, "y")))
    txn.commit()
    val after = rows(a)
    assert(after.contains((1L, "a2")) && after.contains((20L, "y")),
      s"both the transaction and the disjoint writer must land: $after")
  }

  test("crash window: no decision = invisible; stale reaper aborts; late commit throws") {
    val dir = freshDir()
    val a = mk(s"$dir/a")
    val txn = GraftTxn.begin(spark, s"$dir/_txns")
    txn.table(a).upsert(Seq((1L, 1, "LOST", 1)).toDF("pk", "part", "v", "ts"))
    // simulated crash: no decide. Cold readers see the pre-txn state.
    assert(rows(a) == Set((1L, "a"), (2L, "b")))
    val reaped = GraftTxn.abortStale(spark, s"$dir/_txns", olderThanMs = -1)
    assert(reaped.contains(txn.id))
    // the late commit loses to the reaper's atomic decision
    val e = intercept[CommitConflict](txn.commit())
    assert(e.getMessage.contains("abort"), e.getMessage)
    assert(rows(a) == Set((1L, "a"), (2L, "b")))
  }

  test("undecided txn caps tails, checkpoints, clean, rollback, restore") {
    val dir = freshDir()
    val a = LakeTable(spark, LakeTableConfig(s"$dir/a",
      keyCols = Seq("pk"), precombineCol = "ts", partitionCols = Seq("part"),
      checkpointEvery = 1))
    a.bulkInsert(Seq((1L, 1, "a", 0)).toDF("pk", "part", "v", "ts"))
    val txn = GraftTxn.begin(spark, s"$dir/_txns")
    txn.table(a).upsert(Seq((2L, 2, "b", 1)).toDF("pk", "part", "v", "ts"))
    val h = LakeTable(spark, a.config)
    assert(h.log.tailableHead.contains(0L),
      "tailable head must cap below the staged id")
    // a disjoint writer lands ABOVE the staged id; the cap holds
    h.upsert(Seq((3L, 3, "c", 1)).toDF("pk", "part", "v", "ts"))
    assert(h.log.latestId.exists(_ > 1L))
    assert(h.log.tailableHead.contains(0L))
    intercept[IllegalArgumentException](
      h.changesBetween(0, h.log.latestId.get))
    intercept[IllegalArgumentException](h.rollback())
    intercept[IllegalArgumentException](h.restoreTo(0))
    txn.commit()
    val h2 = LakeTable(spark, a.config)
    assert(h2.log.tailableHead == h2.log.latestId)
    assert(h2.read().count() == 3)
    // the feed now serves the whole window in id order
    assert(h2.changesBetween(0, h2.log.latestId.get).count() == 2)
  }

  test("CALL graft.system.txn_reap aborts stale transactions via SQL") {
    val dir = freshDir()
    val a = mk(s"$dir/a")
    val wh = Files.createTempDirectory("graft_txn_wh").toString
    spark.conf.set("spark.sql.catalog.txc", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.txc.warehouse", wh)
    val txn = GraftTxn.begin(spark, s"$dir/_txns")
    txn.table(a).upsert(Seq((7L, 7, "g", 1)).toDF("pk", "part", "v", "ts"))
    val n = spark.sql(
      s"CALL txc.system.txn_reap('$dir/_txns', -1)").collect()(0).getLong(0)
    assert(n == 1L)
    intercept[CommitConflict](txn.commit())
    assert(rows(a) == Set((1L, "a"), (2L, "b")))
  }

  test("SQL BEGIN/COMMIT: two INSERTs become visible atomically; read-your-writes") {
    val dir = freshDir()
    spark.conf.set("spark.sql.catalog.txnsql", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.txnsql.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS txnsql.db")
    spark.sql("""CREATE TABLE txnsql.db.ta (pk BIGINT, ts INT, v STRING)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""CREATE TABLE txnsql.db.tb (pk BIGINT, ts INT, v STRING)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO txnsql.db.ta VALUES (1, 0, 'a0')")
    spark.sql("INSERT INTO txnsql.db.tb VALUES (1, 0, 'b0')")

    // COMMIT/ROLLBACK without BEGIN fail loud
    intercept[Exception](spark.sql("COMMIT").collect())
    intercept[Exception](spark.sql("ROLLBACK").collect())

    val txnId = spark.sql("BEGIN TRANSACTION").collect()(0).getString(0)
    assert(txnId.nonEmpty)
    // a second BEGIN refuses while one is open
    intercept[Exception](spark.sql("BEGIN").collect())
    spark.sql("INSERT INTO txnsql.db.ta VALUES (2, 1, 'a1')")
    spark.sql("INSERT INTO txnsql.db.tb VALUES (2, 1, 'b1')")
    // read-your-writes INSIDE the session
    assert(spark.sql("SELECT count(*) FROM txnsql.db.ta").collect()(0).getLong(0) == 2)
    // INVISIBLE to an unstaged handle (another engine/session)
    def outside(t: String): Long =
      LakeTable(spark, LakeTableConfig(s"$dir/db/$t",
        keyCols = Seq("pk"), precombineCol = "ts")).read().count()
    assert(outside("ta") == 1 && outside("tb") == 1,
      "staged SQL writes must be invisible before COMMIT")
    val st = spark.sql("COMMIT").collect()(0)
    assert(st.getString(0) == txnId && st.getString(1) == "committed")
    assert(outside("ta") == 2 && outside("tb") == 2,
      "COMMIT must make both tables' writes visible")

    // ROLLBACK discards: both tables stay at their committed state
    spark.sql("BEGIN")
    spark.sql("INSERT INTO txnsql.db.ta VALUES (9, 2, 'never')")
    spark.sql("UPDATE txnsql.db.tb SET v = 'never' WHERE pk = 1")
    spark.sql("ROLLBACK")
    assert(outside("ta") == 2)
    assert(spark.sql("SELECT v FROM txnsql.db.tb WHERE pk = 1")
      .collect()(0).getString(0) == "b0")
    assert(spark.sql("SELECT count(*) FROM txnsql.db.ta")
      .collect()(0).getLong(0) == 2, "post-ROLLBACK reads are unstaged again")
  }

  test("SAVEPOINT / ROLLBACK TO retracts staged work across tables, txn stays open") {
    val dir = freshDir()
    spark.conf.set("spark.sql.catalog.txsp", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.txsp.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS txsp.db")
    spark.sql("""CREATE TABLE txsp.db.a (pk BIGINT, ts INT, v STRING)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""CREATE TABLE txsp.db.b (pk BIGINT, ts INT, v STRING)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO txsp.db.a VALUES (1, 0, 'a0')")

    // savepoint/rollback-to/release outside a txn fail loud
    intercept[Exception](spark.sql("SAVEPOINT s1").collect())
    intercept[Exception](spark.sql("ROLLBACK TO SAVEPOINT s1").collect())
    intercept[Exception](spark.sql("RELEASE SAVEPOINT s1").collect())

    spark.sql("BEGIN TRANSACTION").collect()
    spark.sql("INSERT INTO txsp.db.a VALUES (2, 1, 'kept')")
    spark.sql("SAVEPOINT s1").collect()
    // staged work AFTER the savepoint, on both tables — b is enlisted
    // only after s1, so its floor is implicitly empty
    spark.sql("INSERT INTO txsp.db.a VALUES (3, 1, 'doomed')")
    spark.sql("INSERT INTO txsp.db.b VALUES (9, 1, 'doomed')")
    assert(spark.sql("SELECT count(*) FROM txsp.db.a").collect()(0).getLong(0) == 3)
    assert(spark.sql("SELECT count(*) FROM txsp.db.b").collect()(0).getLong(0) == 1)

    spark.sql("ROLLBACK TO SAVEPOINT s1").collect()
    // read-your-writes reflects the restored state, txn still open
    assert(spark.sql("SELECT count(*) FROM txsp.db.a").collect()(0).getLong(0) == 2,
      "post-savepoint staged work on a must be retracted, pre-savepoint kept")
    assert(spark.sql("SELECT count(*) FROM txsp.db.b").collect()(0).getLong(0) == 0,
      "a table enlisted after the savepoint rolls back to empty staged state")
    // a rolled-back-to savepoint survives for a second use
    spark.sql("INSERT INTO txsp.db.a VALUES (4, 1, 'doomed2')")
    spark.sql("ROLLBACK TO SAVEPOINT s1").collect()
    assert(spark.sql("SELECT count(*) FROM txsp.db.a").collect()(0).getLong(0) == 2)

    // unknown savepoint refuses; RELEASE forgets the name
    intercept[Exception](spark.sql("ROLLBACK TO SAVEPOINT nope").collect())
    spark.sql("RELEASE SAVEPOINT s1").collect()
    intercept[Exception](spark.sql("ROLLBACK TO SAVEPOINT s1").collect())

    // COMMIT publishes exactly the surviving staged work
    spark.sql("INSERT INTO txsp.db.b VALUES (10, 1, 'final')")
    spark.sql("COMMIT").collect()
    def outside(t: String): Seq[(Long, String)] =
      LakeTable(spark, LakeTableConfig(s"$dir/db/$t",
        keyCols = Seq("pk"), precombineCol = "ts")).read()
        .select("pk", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(outside("a") == Seq((1L, "a0"), (2L, "kept")),
      "only the pre-savepoint staged write publishes on a")
    assert(outside("b") == Seq((10L, "final")),
      "only the post-rollback staged write publishes on b")
  }

  test("session close aborts the open SQL txn; staged commits retire immediately") {
    val dir = freshDir()
    spark.conf.set("spark.sql.catalog.txcls", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.txcls.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS txcls.db")
    spark.sql("""CREATE TABLE txcls.db.t (pk BIGINT, ts INT, v STRING)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO txcls.db.t VALUES (1, 0, 'a')")
    spark.sql("BEGIN TRANSACTION").collect()
    spark.sql("INSERT INTO txcls.db.t VALUES (2, 1, 'staged')")
    val t = LakeTable(spark, LakeTableConfig(s"$dir/db/t",
      keyCols = Seq("pk"), precombineCol = "ts"))
    assert(t.log.stagedCommits.nonEmpty, "the INSERT must be staged")

    // the application-end listener calls exactly this handler — fire it
    // directly (stopping the shared spec context would kill every other
    // suite): the open txn aborts, staged commits retire NOW, not at
    // the next txn_reap
    val aborted = graft.sql.GraftSessionTxn.abortAll()
    assert(aborted.nonEmpty, "the open session txn must be aborted")
    assert(t.log.stagedCommits.isEmpty,
      "staged commits must retire with the session, not wait for the reaper")
    assert(t.read().count() == 1, "the staged write must never publish")

    // the session slot is free again: a new BEGIN works, COMMIT without
    // one fails loud
    intercept[Exception](spark.sql("COMMIT").collect())
    spark.sql("BEGIN").collect()
    spark.sql("INSERT INTO txcls.db.t VALUES (3, 1, 'kept')")
    spark.sql("COMMIT").collect()
    assert(t.read().count() == 2)
  }

  test("SQL txn: MERGE and DELETE stage too; COPY INTO refuses inside one") {
    val dir = freshDir()
    spark.conf.set("spark.sql.catalog.txnsq2", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.txnsq2.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS txnsq2.db")
    spark.sql("""CREATE TABLE txnsq2.db.t (pk BIGINT, ts INT, v STRING)
      USING graft TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO txnsq2.db.t VALUES (1, 0, 'a'), (2, 0, 'b'), (3, 0, 'c')")
    def outside(): Map[Long, String] =
      LakeTable(spark, LakeTableConfig(s"$dir/db/t",
        keyCols = Seq("pk"), precombineCol = "ts")).read()
        .select("pk", "v").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap

    spark.sql("BEGIN")
    spark.sql("""MERGE INTO txnsq2.db.t t
      USING (SELECT 1L AS pk, 1 AS ts, 'a2' AS v) s ON t.pk = s.pk
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    spark.sql("DELETE FROM txnsq2.db.t WHERE pk = 3")
    // staged: invisible outside, read-your-writes inside
    assert(outside() == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(spark.sql("SELECT count(*) FROM txnsq2.db.t")
      .collect().head.getLong(0) == 2)
    // COPY INTO refuses inside the transaction, loudly, before loading
    val staging = freshDir()
    spark.sql("SELECT 9L AS pk, 0 AS ts, 'z' AS v").write.parquet(s"$staging/p")
    val e = intercept[Exception](spark.sql(
      s"COPY INTO txnsq2.db.t FROM '$staging/p'").collect())
    assert(e.getMessage.contains("transaction"))
    spark.sql("COMMIT")
    assert(outside() == Map(1L -> "a2", 2L -> "b"),
      "MERGE update and DELETE must publish atomically at COMMIT")
    // and the refused COPY INTO works fine after the decision
    spark.sql(s"COPY INTO txnsq2.db.t FROM '$staging/p'").collect()
    assert(outside() == Map(1L -> "a2", 2L -> "b", 9L -> "z"))
  }

  test("read-your-writes: later txn writes see earlier ones; decide is terminal") {
    val dir = freshDir()
    val a = mk(s"$dir/a")
    val txn = GraftTxn.begin(spark, s"$dir/_txns")
    val h = txn.table(a)
    h.upsert(Seq((5L, 5, "e", 1)).toDF("pk", "part", "v", "ts"))
    // the txn's own handle resolves its staged commit...
    assert(h.read().select("pk").as[Long].collect().toSet ==
      Set(1L, 2L, 5L))
    // ...and a SECOND write on the same table merges over it
    h.upsert(Seq((5L, 5, "e2", 2), (6L, 6, "f", 2))
      .toDF("pk", "part", "v", "ts"))
    assert(h.read().select("pk", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b"), (5L, "e2"), (6L, "f")))
    // outsiders stay blind to BOTH staged commits
    assert(rows(a) == Set((1L, "a"), (2L, "b")))
    txn.commit()
    intercept[IllegalArgumentException](txn.abort())
    assert(rows(a) == Set((1L, "a"), (2L, "b"), (5L, "e2"), (6L, "f")))
  }

  test("read-your-writes: multi-write txn aborts to the pre-txn state") {
    val dir = freshDir()
    val a = mk(s"$dir/a")
    val txn = GraftTxn.begin(spark, s"$dir/_txns")
    val h = txn.table(a)
    h.upsert(Seq((5L, 5, "e", 1)).toDF("pk", "part", "v", "ts"))
    h.delete(Seq(1L).toDF("pk"))
    assert(h.read().select("pk").as[Long].collect().toSet == Set(2L, 5L))
    txn.abort()
    assert(rows(a) == Set((1L, "a"), (2L, "b")))
    // both ids retired: the next live commit lands above them
    val a2 = LakeTable(spark, a.config)
    a2.upsert(Seq((9L, 9, "z", 3)).toDF("pk", "part", "v", "ts"))
    assert(a2.log.latestId.contains(3L),
      s"aborted staged ids 1,2 must retire; head = ${a2.log.latestId}")
  }
}
