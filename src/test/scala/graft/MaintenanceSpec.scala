package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{LakeTable, LakeTableConfig, Maintenance}

/** Async table services (VERDICT r13 item #7): a maintenance driver
  * evaluates the commit log and fires compact / compactSmall / clean /
  * archive per policy, THROUGH the public OCC-checked operations — so
  * it is safe to run concurrently with live writers: a lost race skips
  * the action (re-fires next round when the trigger still holds), and
  * no writer update is ever lost.
  */
class MaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("mainttest").resolve("tbl").toString

  private def df(rows: (Long, Int, String, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "part", "payload", "ts")
  }

  test("triggers: compact after N deltas, clean past retain, archive") {
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts",
      partitionCols = Seq("part"), storageType = "mor"))
    t.bulkInsert(df((1L, 1, "a", 0)))
    (1 to 4).foreach(i => t.upsert(df((1L, 1, s"v$i", i))))
    // below threshold: nothing fires
    assert(Maintenance.run(t,
      Maintenance.Policy(compactDeltaCommits = 10)).isEmpty)
    val fired = Maintenance.run(t, Maintenance.Policy(
      compactDeltaCommits = 3, retainCommits = 2))
    assert(fired.map(_._1).toSet == Set("compact", "clean"), fired.toString)
    assert(!t.log.liveFiles(None).exists(_.isDelta), "deltas compacted")
    assert(t.log.cleanedUpTo > 0, "cleaner advanced")
    assert(t.read().select("payload").collect().head.getString(0) == "v4")
    // idempotent-by-need: triggers no longer hold
    assert(Maintenance.run(t, Maintenance.Policy(
      compactDeltaCommits = 3, retainCommits = 2)).isEmpty)
  }

  test("small-file trigger fires compactSmall only when fragments exist") {
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts",
      partitionCols = Seq("part"), storageType = "mor"))
    t.bulkInsert(df((1L, 1, "a", 0)))
    t.upsert(df((2L, 1, "b", 1)))
    t.upsert(df((3L, 1, "c", 1)))
    val fired = Maintenance.run(t,
      Maintenance.Policy(smallFileBytes = 1024 * 1024))
    assert(fired.map(_._1) == Seq("compact_small"), fired.toString)
    assert(Maintenance.run(t,
      Maintenance.Policy(smallFileBytes = 1024 * 1024)).isEmpty)
  }

  test("maintainer racing a live writer: no lost updates, services ran") {
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts",
      partitionCols = Seq("part"), storageType = "mor"))
    t.bulkInsert(df((0L, 1, "seed", 0)))
    val policy = Maintenance.Policy(compactDeltaCommits = 3,
      smallFileBytes = 1024 * 1024, retainCommits = 5)
    val writerTable = LakeTable(spark, t.config)
    val maintTable = LakeTable(spark, t.config)
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val maintainer = new Thread(() => {
      try while (!stop.get()) {
        Maintenance.run(maintTable, policy).foreach(actions.add)
        Thread.sleep(20)
      } catch { case e: Throwable => errs.add(e) }
    })
    maintainer.start()
    val n = 25
    try (1 to n).foreach { i =>
      writerTable.upsert(df((i.toLong, 1, s"row$i", i), (0L, 1, s"seed$i", i)))
    } finally { stop.set(true); maintainer.join(120000) }
    assert(errs.isEmpty, s"maintainer threw: ${errs.peek()}")
    // the tail of deltas must get serviced: condition-poll instead of a
    // single wall-clock-bound round — on a loaded box every in-loop
    // round can lose its race (and the maintainer thread can outlive
    // its join window, keeping the races alive), which is noise, not an
    // OCC bug. Each retry round is quiet-by-then and eventually lands.
    def ranSomething: Boolean = actions.toArray
      .map(_.asInstanceOf[(String, String)])
      .exists(_._2 != "conflict-skipped")
    var tries = 0
    while (!ranSomething && tries < 240) {
      Maintenance.run(maintTable, policy).foreach(actions.add)
      if (!ranSomething) Thread.sleep(250)
      tries += 1
    }
    // NO LOST UPDATES: every writer row present with its latest version
    val rows = t.read().select("pk", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size == n + 1, s"expected ${n + 1} keys, got ${rows.size}")
    (1 to n).foreach(i => assert(rows(i.toLong) == s"row$i"))
    assert(rows(0L) == s"seed$n", "precombine-latest must win for the hot key")
    // services actually ran (concurrently with the writer, or in the
    // condition-polled settlement rounds above)
    val ran = actions.toArray.map(_.asInstanceOf[(String, String)])
      .filter(_._2 != "conflict-skipped").map(_._1).toSet
    assert(ran.nonEmpty, "maintenance never fired")
  }

  test("recluster trigger: upsert-eroded clustering re-prunes after the policy fires") {
    import org.apache.spark.sql.functions.col
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts",
      statsCols = Seq("part"), clusterCols = Seq("part"),
      storageType = "mor"))
    // clustered seed: one globally range-ordered bulk insert over the
    // cluster column — a point predicate prunes to ~1 file
    t.bulkInsert(df((1 to 64).map(i => (i.toLong, i % 8, s"v$i", 0)): _*))
    // drift: MoR delta commits skip the clustering shuffle BY DESIGN —
    // each delta spans every part value, so a point predicate reads one
    // more file per write and stats skipping erodes linearly
    (1 to 6).foreach(k =>
      t.upsert(df((1 to 16).map(i => (100L * k + i, i % 8, s"u$k-$i", k)): _*)))
    val before = t.read(col("part") === 3).inputFiles.length
    assert(before > 1, s"erosion fixture must defeat pruning, read $before files")
    // below the drift ratio: nothing fires (the eroded fraction is ~1.0
    // here, so probe with an impossible ratio first)
    assert(!Maintenance.run(t, Maintenance.Policy(reclusterDriftRatio = 2.0))
      .exists(_._1 == "recluster"))
    val fired = Maintenance.run(t, Maintenance.Policy(reclusterDriftRatio = 0.5))
    assert(fired.map(_._1).contains("recluster"), fired.toString)
    val after = t.read(col("part") === 3).inputFiles.length
    assert(after < before,
      s"stats skipping must be restored: read $before files before, $after after")
    // rows unchanged by the physical rewrite
    assert(t.read().count() == 64 + 6 * 16)
    assert(t.read().filter(col("pk") === 605L).select("payload")
      .collect().head.getString(0) == "u6-5")
    // idempotent-by-need: a reclustered table no longer drifts
    assert(!Maintenance.run(t, Maintenance.Policy(reclusterDriftRatio = 0.5))
      .exists(_._1 == "recluster"))
  }

  test("recluster trigger conflict-skips under a live writer") {
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts",
      statsCols = Seq("part"), clusterCols = Seq("part")))
    t.bulkInsert(df((1 to 32).map(i => (i.toLong, i % 4, s"v$i", 0)): _*))
    (1 to 4).foreach(k =>
      t.upsert(df((1 to 8).map(i => (100L * k + i, i % 4, s"u$k-$i", k)): _*)))
    val policy = Maintenance.Policy(reclusterDriftRatio = 0.3)
    val writerTable = LakeTable(spark, t.config)
    val maintTable = LakeTable(spark, t.config)
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintainer = new Thread(() => {
      try while (!stop.get()) {
        Maintenance.run(maintTable, policy).foreach(actions.add)
        Thread.sleep(10)
      } catch { case e: Throwable => errs.add(e) }
    })
    maintainer.start()
    val n = 15
    // the WRITER retries its own OCC losses (ordinary client contract);
    // the MAINTAINER must only ever skip, never throw
    try (1 to n).foreach { i =>
      var done = false
      var att = 0
      while (!done && att < 30) {
        try { writerTable.upsert(df((i.toLong, i % 4, s"w$i", 100 + i))); done = true }
        catch { case _: graft.lake.CommitConflict => att += 1 }
      }
      assert(done, s"writer $i never landed")
    } finally { stop.set(true); maintainer.join(120000) }
    assert(errs.isEmpty,
      s"recluster under a live writer must skip, never throw: ${errs.peek()}")
    // no lost updates regardless of how many reclusters landed or skipped
    val rows = t.read().select("pk", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size == 32 + 4 * 8)
    (1 to n).foreach(i => assert(rows(i.toLong) == s"w$i", s"pk $i"))
  }

  test("absolute DV-position cap folds what the ratio trigger never would") {
    import org.apache.spark.sql.functions.col
    val t = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts", deleteMode = "dv"))
    t.bulkInsert(df((1 to 400).map(i => (i.toLong, i % 4, s"v$i", 0)): _*))
    // uniform LOW-ratio deletes: a handful of positions per file, far
    // under any sane per-file ratio — the unbounded-accumulation shape
    (0 to 4).foreach(k =>
      t.deleteWhereDv(col("pk").isin((1 to 8).map(i => (k * 8 + i).toLong): _*)))
    val positions = t.log.liveDvs().map(_.rows).sum
    assert(positions == 40, s"fixture expects 40 live positions, got $positions")
    // the ratio trigger (50%) never fires on ~10% DV'd files
    assert(!Maintenance.run(t, Maintenance.Policy(dvFoldRatio = 0.5))
      .exists(_._1.startsWith("dv_fold")))
    // the absolute cap does — and retires every live position
    val fired = Maintenance.run(t, Maintenance.Policy(dvFoldPositions = 30))
    assert(fired.map(_._1).contains("dv_fold_abs"), fired.toString)
    assert(t.log.liveDvs().isEmpty, "fold must retire all live DVs")
    assert(t.read().count() == 400 - 40)
    // under the cap: quiet
    assert(!Maintenance.run(t, Maintenance.Policy(dvFoldPositions = 30))
      .exists(_._1.startsWith("dv_fold")))
  }

  test("SQL surface: CALL graft.system.maintain") {
    val wh = Files.createTempDirectory("maint_wh").toString
    spark.conf.set("spark.sql.catalog.mnt", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mnt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mnt.db")
    spark.sql("""CREATE TABLE mnt.db.t (pk BIGINT, part INT, payload STRING,
      ts INT) USING graft PARTITIONED BY (part)
      TBLPROPERTIES (keyCols='pk', precombineCol='ts', storageType='mor',
      compactEvery='3')""")
    spark.sql("INSERT INTO mnt.db.t VALUES (1, 1, 'a', 0)")
    // compactEvery=3 INLINE-compacts as writes land, so stage deltas
    // below the inline trigger and let maintain()'s policy fire clean
    spark.sql("INSERT INTO mnt.db.t VALUES (1, 1, 'b', 1)")
    spark.sql("INSERT INTO mnt.db.t VALUES (1, 1, 'c', 2)")
    val nActions = spark.sql("CALL mnt.system.maintain('db.t', 2, 0)")
      .collect().head.getLong(0)
    assert(nActions >= 1, s"expected at least the clean to fire, got $nActions")
    val rows = spark.sql("SELECT payload FROM mnt.db.t WHERE pk = 1").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("c"))
  }

  test("MV refresh and stale-ANALYZE ride the maintenance policy") {
    import graft.lake.{ColStats, MaterializedAgg, TableDescriptor}
    val root = freshRoot()
    val t = LakeTable(spark, LakeTableConfig(root,
      keyCols = Seq("pk"), precombineCol = "ts", partitionCols = Seq("part")))
    t.bulkInsert(df((1L, 1, "a", 0), (2L, 2, "b", 0)))
    // register an MV on the source descriptor the way the SQL DDL does
    val mvRoot = root + "_mv"
    val agg = new MaterializedAgg(spark, t, mvRoot,
      dims = Seq("part"), sums = Map.empty)
    agg.refresh()
    TableDescriptor.save(mvRoot,
      TableDescriptor.fromConfig(agg.table.config).copy(
        matView = graft.lake.MatViewDescriptor(root, Seq("part"))),
      spark.sparkContext.hadoopConfiguration)
    TableDescriptor.save(root,
      TableDescriptor.fromConfig(t.config).copy(matViews = Seq(mvRoot)),
      spark.sparkContext.hadoopConfiguration)
    t.analyzeColumns()

    // source moves 2 commits: MV is stale, stats 2 commits behind
    t.upsert(df((3L, 1, "c", 1)))
    t.upsert(df((4L, 2, "d", 1)))
    val acts = Maintenance.run(t, Maintenance.Policy(
      refreshMvAfter = 1, analyzeAfter = 2)).toMap
    assert(acts.keys.exists(_.startsWith("refresh_mv:")), s"got $acts")
    assert(acts.contains("analyze"), s"got $acts")
    assert(agg.applied == t.log.latestId)
    val cs = ColStats.load(root, spark.sparkContext.hadoopConfiguration).get
    assert(cs.commit == t.log.latestId.get)

    // fresh again: neither trigger holds
    val quiet = Maintenance.run(t, Maintenance.Policy(
      refreshMvAfter = 1, analyzeAfter = 2))
    assert(!quiet.exists(a => a._1.startsWith("refresh_mv") || a._1 == "analyze"),
      s"got $quiet")

    // an analyzeAfter policy never runs the FIRST analyze (that scan is
    // an operator decision): a never-analyzed table stays untouched
    val t2 = LakeTable(spark, LakeTableConfig(freshRoot(),
      keyCols = Seq("pk"), precombineCol = "ts"))
    t2.bulkInsert(df((1L, 1, "a", 0)))
    (1 to 3).foreach(i => t2.upsert(df((1L, 1, s"v$i", i))))
    assert(!Maintenance.run(t2, Maintenance.Policy(analyzeAfter = 1))
      .exists(_._1 == "analyze"))
  }

  test("a broken MV (vanished dim descriptor) is skipped, never fatal to the round") {
    import spark.implicits._
    import graft.lake.{MaterializedAgg, TableDescriptor}
    val factRoot = freshRoot()
    val fact = LakeTable(spark, LakeTableConfig(factRoot,
      keyCols = Seq("pk"), precombineCol = "ts"))
    val dimRoot = freshRoot()
    val dim = LakeTable(spark, LakeTableConfig(dimRoot,
      keyCols = Seq("k"), precombineCol = "ts"))
    dim.bulkInsert(Seq((1, "a", 0)).toDF("k", "grp", "ts"))
    fact.bulkInsert(Seq((1L, 1, 10L, 0)).toDF("pk", "k", "v", "ts"))
    val hconf = spark.sparkContext.hadoopConfiguration
    val mvRoot = factRoot + "_mv"
    val agg = new MaterializedAgg(spark, fact, mvRoot,
      dims = Seq("grp"), sums = Map.empty, dimJoins = Seq(graft.lake.DimSide.using(dim, Seq("k"))))
    agg.refresh()
    TableDescriptor.save(dimRoot, TableDescriptor.fromConfig(dim.config), hconf)
    TableDescriptor.save(mvRoot,
      TableDescriptor.fromConfig(agg.table.config).copy(
        matView = graft.lake.MatViewDescriptor(factRoot, Seq("grp"),
          dimJoins = Seq(graft.lake.DimJoin(dimRoot, Seq("k"))))), hconf)
    // a SECOND, healthy single-table MV on the same fact — the broken
    // one must not stop it from being serviced
    val mv2Root = factRoot + "_mv2"
    val agg2 = new MaterializedAgg(spark, fact, mv2Root,
      dims = Seq("k"), sums = Map.empty)
    agg2.refresh()
    TableDescriptor.save(mv2Root,
      TableDescriptor.fromConfig(agg2.table.config).copy(
        matView = graft.lake.MatViewDescriptor(factRoot, Seq("k"))), hconf)
    TableDescriptor.save(factRoot,
      TableDescriptor.fromConfig(fact.config)
        .copy(matViews = Seq(mvRoot, mv2Root)), hconf)

    // the dim table's descriptor vanishes (dropped out-of-band); the
    // fact moves so both MVs are stale
    val fs = new org.apache.hadoop.fs.Path(dimRoot).getFileSystem(hconf)
    fs.delete(new org.apache.hadoop.fs.Path(dimRoot, "_log/_table.json"), false)
    fact.upsert(Seq((2L, 1, 5L, 1)).toDF("pk", "k", "v", "ts"))

    val acts = Maintenance.run(fact, Maintenance.Policy(refreshMvAfter = 1))
    val broken = acts.find(_._1 == s"refresh_mv:${mvRoot.split('/').last}")
    assert(broken.exists(_._2.startsWith("skipped")),
      s"the broken MV must be reported as a skip, got $acts")
    val healthy = acts.find(_._1 == s"refresh_mv:${mv2Root.split('/').last}")
    assert(healthy.exists(!_._2.startsWith("skipped")),
      s"the healthy MV must still be serviced, got $acts")
    assert(agg2.applied == fact.log.latestId)
  }

  test("a moved dim triggers refresh_mv regardless of the fact-lag threshold") {
    import spark.implicits._
    import graft.lake.{MaterializedAgg, TableDescriptor}
    val factRoot = freshRoot()
    val fact = LakeTable(spark, LakeTableConfig(factRoot,
      keyCols = Seq("pk"), precombineCol = "ts"))
    val dimRoot = freshRoot()
    val dim = LakeTable(spark, LakeTableConfig(dimRoot,
      keyCols = Seq("k"), precombineCol = "ts"))
    dim.bulkInsert(Seq((1, "a", 0)).toDF("k", "grp", "ts"))
    fact.bulkInsert(Seq((1L, 1, 10L, 0)).toDF("pk", "k", "v", "ts"))
    val mvRoot = factRoot + "_mv"
    val agg = new MaterializedAgg(spark, fact, mvRoot,
      dims = Seq("grp"), sums = Map.empty,
      dimJoins = Seq(graft.lake.DimSide.using(dim, Seq("k"))))
    agg.refresh()
    val hconf = spark.sparkContext.hadoopConfiguration
    // catalog flows persist descriptors at CREATE; the direct-API
    // fixture mimics that (fromDescriptor resolves dims through them)
    TableDescriptor.save(dimRoot, TableDescriptor.fromConfig(dim.config), hconf)
    TableDescriptor.save(mvRoot,
      TableDescriptor.fromConfig(agg.table.config).copy(
        matView = graft.lake.MatViewDescriptor(factRoot, Seq("grp"),
          dimJoins = Seq(graft.lake.DimJoin(dimRoot, Seq("k"))))), hconf)
    TableDescriptor.save(factRoot,
      TableDescriptor.fromConfig(fact.config).copy(matViews = Seq(mvRoot)), hconf)

    val policy = Maintenance.Policy(refreshMvAfter = 5)
    assert(!Maintenance.run(fact, policy).exists(_._1.startsWith("refresh_mv")),
      "fresh MV under the lag threshold: nothing fires")
    // the DIM moves while the fact holds still (lag 0 < threshold 5)
    dim.upsert(Seq((1, "a2", 1)).toDF("k", "grp", "ts"))
    val fired = Maintenance.run(fact, policy)
    assert(fired.exists(_._1.startsWith("refresh_mv")), fired.toString)
    assert(agg.fresh, "the fired refresh must rebuild to the new dim state")
    assert(agg.read().select("grp").collect().map(_.getString(0)).toSeq ==
      Seq("a2"))
  }
}
