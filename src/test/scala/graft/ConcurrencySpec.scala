package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions, DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{CommitConflict, LakeTable, LakeTableConfig}

/** Disjoint-writer optimistic concurrency (VERDICT r4 item #3): a head
  * mismatch at publish no longer aborts writers whose read scope is
  * partition-confined and disjoint from every intervening commit — they
  * rebase onto the new head. Overlapping writers still resolve to one
  * winner and one clean CommitConflict.
  *
  * The race is reproduced deterministically through the `onHeadResolved`
  * seam: a competing writer's commit fires inside the window between the
  * victim's head resolution and its publish — the exact interleaving the
  * optimistic check guards.
  */
class ConcurrencySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("occtest").resolve("tbl").toString

  private def df(rows: (Long, Int, String, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "vendorid", "payload", "ts")
  }

  private def cfg(root: String, storage: String = "cow",
      global: Boolean = false) =
    LakeTableConfig(root, keyCols = Seq("pk"), precombineCol = "ts",
      partitionCols = Seq("vendorid"), storageType = storage,
      globalIndex = global)

  private def snap(t: LakeTable): Set[(Long, Int, String, Int)] = {
    import spark.implicits._
    t.read().select($"pk", $"vendorid", $"payload", $"ts")
      .as[(Long, Int, String, Int)].collect().toSet
  }

  /** arm `victim` so that `intruder()` commits once, inside the victim's
    * resolve→publish window (self-clearing: the rebase attempt must not
    * re-trigger it) */
  private def interleave(victim: LakeTable)(intruder: => Unit): Unit =
    victim.onHeadResolved = () => {
      victim.onHeadResolved = () => ()
      intruder
    }

  test("disjoint partitions: both concurrent CoW upserts land") {
    val root = freshRoot()
    val w1 = LakeTable(spark, cfg(root))
    w1.bulkInsert(df((1L, 1, "a", 0), (2L, 2, "b", 0)))
    val w2 = LakeTable(spark, cfg(root))
    interleave(w2) { w1.upsert(df((1L, 1, "a2", 1))) } // partition 1 lands mid-write
    val cid = w2.upsert(df((2L, 2, "b2", 1)))          // partition 2 → rebase
    assert(cid == 2L, s"rebased write must land after the intervener, got $cid")
    val t = LakeTable(spark, cfg(root))
    assert(snap(t) == Set((1L, 1, "a2", 1), (2L, 2, "b2", 1)),
      "neither writer's rows may be lost")
    // incremental readers see the rebased rows above the intervener's id
    assert(t.readIncremental(1L).select("pk").collect().map(_.getLong(0))
      .toSet == Set(2L),
      "rebased rows must carry the rebased commit id, not the failed one")
  }

  test("same partition: one winner, loser aborts with CommitConflict") {
    val root = freshRoot()
    val w1 = LakeTable(spark, cfg(root))
    w1.bulkInsert(df((1L, 1, "a", 0), (2L, 1, "b", 0)))
    val w2 = LakeTable(spark, cfg(root))
    interleave(w2) { w1.upsert(df((1L, 1, "a2", 1))) }
    val ex = intercept[CommitConflict] { w2.upsert(df((2L, 1, "b2", 1))) }
    assert(ex.getMessage.contains("stale write"))
    assert(snap(LakeTable(spark, cfg(root))) ==
      Set((1L, 1, "a2", 1), (2L, 1, "b", 0)),
      "the losing write must leave no trace")
  }

  test("same partition with occRetries: BOTH writes land, serialized") {
    val root = freshRoot()
    val retryCfg = cfg(root).copy(occRetries = 3)
    val w1 = LakeTable(spark, retryCfg)
    w1.bulkInsert(df((1L, 1, "a", 0), (2L, 1, "b", 0)))
    val w2 = LakeTable(spark, retryCfg)
    interleave(w2) { w1.upsert(df((1L, 1, "a2", 1))) }
    val cid = w2.upsert(df((2L, 1, "b2", 1))) // conflict -> full re-run
    assert(cid == 2L, s"retried write must land after the intervener, got $cid")
    assert(snap(LakeTable(spark, retryCfg)) ==
      Set((1L, 1, "a2", 1), (2L, 1, "b2", 1)),
      "both same-partition writers must land under retry — the serial outcome")
  }

  test("occRetries exhaustion: persistent conflicts still fail clean") {
    val root = freshRoot()
    val retryCfg = cfg(root).copy(occRetries = 1)
    val w1 = LakeTable(spark, retryCfg)
    w1.bulkInsert(df((1L, 1, "a", 0)))
    val w2 = LakeTable(spark, retryCfg)
    // re-arming intruder: a rival lands inside EVERY attempt's window
    var fired = 0
    def arm(): Unit = w2.onHeadResolved = () => {
      w2.onHeadResolved = () => ()
      fired += 1
      w1.upsert(df((1L, 1, s"rival$fired", fired + 10)))
      arm()
    }
    arm()
    intercept[CommitConflict] { w2.upsert(df((1L, 1, "mine", 1))) }
    assert(fired == 2, s"expected initial attempt + 1 retry, got $fired")
    assert(snap(LakeTable(spark, retryCfg)).contains((1L, 1, "rival2", 12)),
      "the rivals' writes stand; the exhausted loser leaves no trace")
  }

  test("overwriteWhere racing a disjoint-partition upsert: both land") {
    val root = freshRoot()
    // vendorid stats let the overwrite prove its scope is partition 1
    // only — the rival's partition-2 commit is then disjoint and the
    // overwrite rebases instead of conflicting
    val statsCfg = LakeTableConfig(root, keyCols = Seq("pk"),
      precombineCol = "ts", partitionCols = Seq("vendorid"),
      statsCols = Seq("vendorid"))
    val w1 = LakeTable(spark, statsCfg)
    w1.bulkInsert(df((1L, 1, "a", 0), (2L, 2, "b", 0)))
    val w2 = LakeTable(spark, statsCfg)
    interleave(w2) { w1.upsert(df((2L, 2, "b2", 1))) }
    w2.overwriteWhere(functions.col("vendorid") === 1, df((9L, 1, "z", 1)))
    assert(snap(LakeTable(spark, statsCfg)) ==
      Set((9L, 1, "z", 1), (2L, 2, "b2", 1)),
      "the replaced partition and the rival's partition must both land")
  }

  test("overwriteWhere racing a same-partition writer: clean conflict, no trace") {
    val root = freshRoot()
    val w1 = LakeTable(spark, cfg(root))
    w1.bulkInsert(df((1L, 1, "a", 0)))
    val w2 = LakeTable(spark, cfg(root))
    interleave(w2) { w1.upsert(df((1L, 1, "a2", 1))) }
    intercept[CommitConflict] {
      w2.overwriteWhere(functions.col("vendorid") === 1, df((9L, 1, "z", 1)))
    }
    assert(snap(LakeTable(spark, cfg(root))) == Set((1L, 1, "a2", 1)),
      "the losing overwrite must leave no trace")
  }

  test("disjoint MoR delta upserts: both land; tail stream sees the rebase") {
    val root = freshRoot()
    val w1 = LakeTable(spark, cfg(root, storage = "mor"))
    w1.bulkInsert(df((1L, 1, "a", 0), (2L, 2, "b", 0)))
    val w2 = LakeTable(spark, cfg(root, storage = "mor"))
    interleave(w2) { w1.upsert(df((10L, 1, "n1", 1))) }
    val cid = w2.upsert(df((20L, 2, "n2", 1)))
    assert(cid == 2L)
    val t = LakeTable(spark, cfg(root, storage = "mor"))
    assert(snap(t).map(_._1) == Set(1L, 2L, 10L, 20L))
    // the rebased delta is addressable by its NEW commit id in the tail
    val src = new graft.sources.GraftTailSource(
      spark.sqlContext, t, t.tailSchema)
    assert(src.batchFrame(1L, 2L).select("pk").collect()
      .map(_.getLong(0)).toSet == Set(20L))
  }

  test("global index never rebases (table-wide read scope)") {
    val root = freshRoot()
    val w1 = LakeTable(spark, cfg(root, global = true))
    w1.bulkInsert(df((1L, 1, "a", 0), (2L, 2, "b", 0)))
    val w2 = LakeTable(spark, cfg(root, global = true))
    interleave(w2) { w1.upsert(df((1L, 1, "a2", 1))) }
    intercept[CommitConflict] { w2.upsert(df((2L, 2, "b2", 1))) }
  }

  test("delete vs upsert on disjoint partitions both land") {
    val root = freshRoot()
    val w1 = LakeTable(spark, cfg(root))
    w1.bulkInsert(df((1L, 1, "a", 0), (2L, 2, "b", 0)))
    val w2 = LakeTable(spark, cfg(root))
    interleave(w2) { w1.upsert(df((2L, 2, "b2", 1))) }
    w2.delete(df((1L, 1, "a", 0)))           // partition-pinned keys → scoped
    assert(snap(LakeTable(spark, cfg(root))) == Set((2L, 2, "b2", 1)))
  }

  test("two interveners in the window: a single rebase clears both") {
    val root = freshRoot()
    val w1 = LakeTable(spark, cfg(root))
    w1.bulkInsert(df((1L, 1, "a", 0), (2L, 2, "b", 0), (3L, 3, "c", 0)))
    val w2 = LakeTable(spark, cfg(root))
    interleave(w2) {
      w1.upsert(df((1L, 1, "a2", 1)))        // commit 1, partition 1
      w1.upsert(df((2L, 2, "b2", 1)))        // commit 2, partition 2
    }
    val cid = w2.upsert(df((3L, 3, "c2", 1))) // partition 3, over both
    assert(cid == 3L)
    assert(snap(LakeTable(spark, cfg(root))) ==
      Set((1L, 1, "a2", 1), (2L, 2, "b2", 1), (3L, 3, "c2", 1)))
  }

  test("a second conflict during the rebase rebases again") {
    val root = freshRoot()
    val w1 = LakeTable(spark, cfg(root))
    w1.bulkInsert(df((1L, 1, "a", 0), (2L, 2, "b", 0), (3L, 3, "c", 0)))
    val w2 = LakeTable(spark, cfg(root))
    // first fire: partition 1 lands; second fire (inside the rebase's own
    // window): partition 2 lands — w2 must survive both
    var fired = 0
    w2.onHeadResolved = () => {
      fired += 1
      if (fired == 1) w1.upsert(df((1L, 1, "a2", 1)))
      else if (fired == 2) w1.upsert(df((2L, 2, "b2", 1)))
    }
    val cid = w2.upsert(df((3L, 3, "c2", 1)))
    assert(cid == 3L, s"expected a chained rebase to land at 3, got $cid")
    assert(snap(LakeTable(spark, cfg(root))) ==
      Set((1L, 1, "a2", 1), (2L, 2, "b2", 1), (3L, 3, "c2", 1)))
  }

  test("aborted and rebased writers leak no data directories") {
    val root = freshRoot()
    val w1 = LakeTable(spark, cfg(root))
    w1.bulkInsert(df((1L, 1, "a", 0), (2L, 2, "b", 0)))
    // a rebase (disjoint) and an abort (same partition)
    val w2 = LakeTable(spark, cfg(root))
    interleave(w2) { w1.upsert(df((1L, 1, "a2", 1))) }
    w2.upsert(df((2L, 2, "b2", 1)))
    val w3 = LakeTable(spark, cfg(root))
    interleave(w3) { w1.upsert(df((1L, 1, "a3", 2))) }
    intercept[CommitConflict] { w3.upsert(df((1L, 1, "a4", 2))) }
    val t = LakeTable(spark, cfg(root))
    val live = t.log.liveFiles()
      .map(f => new java.io.File(f.path).getParentFile.getParentFile.getName)
      .toSet ++
      t.log.commits.flatMap(_.adds)
        .map(f => new java.io.File(f.path).getParentFile.getParentFile.getName)
        .toSet
    val onDisk = new java.io.File(root, "data").listFiles().map(_.getName).toSet
    assert((onDisk -- live).isEmpty,
      s"leaked orphan dirs: ${(onDisk -- live).mkString(",")}")
  }

  test("a rename landing mid-write: the disjoint upsert rebases and keeps it") {
    val root = freshRoot()
    val w1 = LakeTable(spark, cfg(root))
    w1.bulkInsert(df((1L, 1, "a", 0), (2L, 2, "b", 0)))
    val w2 = LakeTable(spark, cfg(root))
    // the schema commit touches no partitions, so ANY partition-scoped
    // writer is disjoint with it — the rebase must also RE-EVOLVE the
    // commit's recorded schema against the renamed head, or the upsert
    // would revert the rename for every later reader
    interleave(w2) { w1.renameColumn("payload", "body") }
    w2.upsert(df((2L, 2, "b2", 1)))
    val t = LakeTable(spark, cfg(root))
    val cols = t.read().columns.toSeq
    assert(cols.contains("body") && !cols.contains("payload"),
      s"rebased write must keep the intervening rename, got $cols")
    import spark.implicits._
    assert(t.read().select($"pk", $"body").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b2")))
  }

  test("a rebased write KEEPS the data of a column it introduced") {
    val root = freshRoot()
    val w1 = LakeTable(spark, cfg(root))
    w1.bulkInsert(df((1L, 1, "a", 0), (2L, 2, "b", 0)))
    val w2 = LakeTable(spark, cfg(root))
    interleave(w2) { w1.upsert(df((1L, 1, "a2", 1))) } // partition 1 lands
    import spark.implicits._
    // w2 brings a brand-new column into partition 2; the rebase must
    // carry its values through (adapt-to-head alone would drop them)
    w2.upsert(Seq((2L, 2, "b2", 1, 42))
      .toDF("pk", "vendorid", "payload", "ts", "extra"))
    val t = LakeTable(spark, cfg(root))
    assert(t.read().select($"pk", $"extra").as[(Long, Option[Int])]
      .collect().toSet == Set((1L, None), (2L, Some(42))),
      "the rebased write's new column must land with its data")
  }

  test("stress: racing writer threads converge to the serial per-key outcome") {
    val root = freshRoot()
    LakeTable(spark, cfg(root)).bulkInsert(df((999L, 9, "seed", 0)))
    val threads = 3
    val opsPer = 4
    // thread t owns keys 100t..100t+2; a key's partition NEVER moves
    // (identity = key + partition under the non-global index). Keys 0-1
    // live in the thread's OWN partition (concurrent batches there are
    // disjoint → the rebase path); key 2 lives in the SHARED partition 9,
    // included on even ops only (overlap → the abort-and-retry path).
    def rows(tid: Int, i: Int) = {
      val own = (0 to 1).map(k => (100L * tid + k, tid + 1, s"t$tid-i$i-k$k", i))
      val shared =
        if (i % 2 == 0) Seq((100L * tid + 2, 9, s"t$tid-i$i-k2", i)) else Seq.empty
      own ++ shared
    }
    val committed = new java.util.concurrent.atomic.AtomicInteger(0)
    val retried = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val futures = (0 until threads).map { tid =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val w = LakeTable(spark, cfg(root))
          for (i <- 1 to opsPer) {
            var done = false
            var attempts = 0
            while (!done) {
              try {
                w.upsert(df(rows(tid, i): _*)); done = true
                committed.incrementAndGet()
              } catch {
                case _: CommitConflict =>
                  retried.incrementAndGet(); attempts += 1
                  assert(attempts < 50, s"writer $tid live-locked at op $i")
              }
            }
          }
        }
      })
    }
    futures.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(committed.get() == threads * opsPer)
    val t = LakeTable(spark, cfg(root))
    // threads are serial within themselves and keys are thread-disjoint,
    // so the final table is fully determined despite arbitrary
    // interleavings: per key, the owner's LAST batch covering it wins
    val lastShared = (1 to opsPer).filter(_ % 2 == 0).max
    val expected = (0 until threads).flatMap { tid =>
      (0 to 1).map(k => (100L * tid + k, tid + 1, s"t$tid-i$opsPer-k$k", opsPer)) :+
        ((100L * tid + 2, 9, s"t$tid-i$lastShared-k2", lastShared))
    }.toSet + ((999L, 9, "seed", 0))
    assert(snap(t) == expected)
    // exactly one commit per successful upsert — rebases retire their
    // failed id without publishing it, aborted attempts publish nothing
    assert(t.log.commits.size == 1 + threads * opsPer,
      s"timeline has ${t.log.commits.size} commits; ${retried.get()} retries")
  }

  // ---- cross-process races (graft.tools.WriterProc, one JVM each) -----
  // The in-process seam tests above share a JVM; these pin that the OCC
  // guard needs NOTHING in-memory — two independent JVMs whose only
  // shared state is the filesystem race through the same
  // resolve→barrier→publish window, and atomic create-or-fail of the
  // commit JSON alone picks one winner. Documents the deployment
  // assumption explicitly: a store with atomic create-if-absent
  // (POSIX O_EXCL here; HDFS create / S3 conditional put in prod).

  private def spawnWriter(root: String, vendor: Int, pk: Long, tag: String,
      syncDir: String, id: String, occRetries: Int = 0): Process = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cp = "/opt/spark/jars/*:" + new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g", "-cp", cp,
      "graft.tools.WriterProc", root, vendor.toString, pk.toString, tag,
      syncDir, id, occRetries.toString))
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectOutput(new java.io.File(s"$syncDir/out-$id.log"))
    pb.redirectErrorStream(true)
    pb.start()
  }

  /** run two barriered writer processes to completion → (exitA, exitB) */
  private def raceProcs(root: String,
      a: (Int, Long, String), b: (Int, Long, String),
      occRetries: Int = 0): (Int, Int) = {
    val syncDir = Files.createTempDirectory("xproc_sync").toString
    val pa = spawnWriter(root, a._1, a._2, a._3, syncDir, "a", occRetries)
    val pb = spawnWriter(root, b._1, b._2, b._3, syncDir, "b", occRetries)
    try {
      // release the barrier once BOTH have resolved the same head
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!(Files.exists(java.nio.file.Paths.get(syncDir, "ready-a")) &&
               Files.exists(java.nio.file.Paths.get(syncDir, "ready-b")))) {
        assert(System.nanoTime() < deadline, "writers never reached the barrier")
        assert(pa.isAlive || Files.exists(java.nio.file.Paths.get(syncDir, "ready-a")),
          s"writer a died before the barrier:\n${readLog(syncDir, "a")}")
        assert(pb.isAlive || Files.exists(java.nio.file.Paths.get(syncDir, "ready-b")),
          s"writer b died before the barrier:\n${readLog(syncDir, "b")}")
        Thread.sleep(50)
      }
      Files.write(java.nio.file.Paths.get(syncDir, "go"), Array.empty[Byte])
      assert(pa.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "writer a hung")
      assert(pb.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "writer b hung")
      (pa.exitValue(), pb.exitValue())
    } finally { pa.destroyForcibly(); pb.destroyForcibly() }
  }

  private def readLog(syncDir: String, id: String): String =
    scala.util.Try(new String(Files.readAllBytes(
      java.nio.file.Paths.get(syncDir, s"out-$id.log")))).getOrElse("")
      .linesIterator.toSeq.takeRight(25).mkString("\n")

  test("cross-process same-partition race: one winner, one clean conflict") {
    val root = freshRoot()
    val t = LakeTable(spark, cfg(root))
    t.bulkInsert(df((1L, 1, "base", 0)))
    val (ea, eb) = raceProcs(root, (1, 10L, "from-a"), (1, 11L, "from-b"))
    assert(Set(ea, eb) == Set(0, 2),
      s"expected one commit and one CommitConflict, got exits ($ea, $eb)")
    val payloads = snap(t).map(_._3)
    val winner = if (ea == 0) "from-a" else "from-b"
    val loser = if (ea == 0) "from-b" else "from-a"
    assert(payloads.contains(winner) && !payloads.contains(loser),
      s"table must hold exactly the winner's row: $payloads")
  }

  test("cross-process same-partition race with occRetries: both land") {
    val root = freshRoot()
    val t = LakeTable(spark, cfg(root))
    t.bulkInsert(df((1L, 1, "base", 0)))
    val (ea, eb) = raceProcs(root, (1, 10L, "from-a"), (1, 11L, "from-b"),
      occRetries = 3)
    assert((ea, eb) == (0, 0),
      s"both writers must commit under retry, got ($ea, $eb)")
    val payloads = snap(t).map(_._3)
    assert(payloads.contains("from-a") && payloads.contains("from-b"),
      s"both rows must land: $payloads")
    assert(t.log.commits.map(_.id).distinct.size == t.log.commits.size)
  }

  test("cross-process disjoint-partition race: the loser rebases; both land") {
    val root = freshRoot()
    val t = LakeTable(spark, cfg(root))
    t.bulkInsert(df((1L, 1, "base", 0), (2L, 2, "base", 0)))
    val (ea, eb) = raceProcs(root, (1, 10L, "from-a"), (2, 20L, "from-b"))
    assert((ea, eb) == (0, 0),
      s"both disjoint writers must commit (one via rebase), got ($ea, $eb)")
    val payloads = snap(t).map(_._3)
    assert(payloads.contains("from-a") && payloads.contains("from-b"))
    // the two commits serialized onto distinct successive head ids
    assert(t.log.commits.map(_.id).distinct.size == t.log.commits.size)
  }

  test("a no-files rebase (emptying delete) racing a rename keeps the rename") {
    val root = freshRoot()
    val w1 = LakeTable(spark, cfg(root))
    w1.bulkInsert(df((1L, 1, "a", 0), (2L, 2, "b", 0)))
    val w2 = LakeTable(spark, cfg(root))
    // deleting EVERY row of partition 2 produces a commit with removes
    // but zero adds — the metadata-only rebase path; the recorded
    // schema must be the renamed head's, not a by-name re-evolution
    // that resurrects 'payload' as a phantom column
    interleave(w2) { w1.renameColumn("payload", "body") }
    w2.delete(df((2L, 2, "b", 0)).select("pk", "vendorid"))
    val t = LakeTable(spark, cfg(root))
    val cols = t.read().columns.toSeq
    assert(cols.contains("body") && !cols.contains("payload"),
      s"phantom column after no-files rebase: $cols")
    import spark.implicits._
    assert(t.read().select($"pk", $"body").as[(Long, String)]
      .collect().toSet == Set((1L, "a")))
  }

  test("CommitStore seam: a lost-race publish surfaces as CommitConflict; " +
      "a non-atomic store is exactly the hazard the contract forbids") {
    import graft.lake.{Commit, CommitLog, CommitStore}
    import org.apache.hadoop.fs.{FileSystem, Path}
    val hconf = spark.sparkContext.hadoopConfiguration
    val schema = """{"type":"struct","fields":[]}"""

    // a store that loses every race (the conditional-put primitive
    // reporting "already exists") must fail the append LOUD — the
    // caller re-resolves, nothing is silently dropped
    object AlwaysLoses extends CommitStore {
      override def publishAtomic(fs: FileSystem, tmp: Path, dst: Path) = false
    }
    val l1 = new CommitLog(freshRoot(), hconf, store = AlwaysLoses)
    intercept[CommitConflict](
      l1.append(Commit(0L, "upsert", 0L, schema, Seq.empty, Seq.empty)))
    assert(l1.latestId.isEmpty, "a refused publish must leave no commit")

    // the CONTRACT-VIOLATING store: last-writer-wins overwrite (an
    // object store without conditional put). Two same-id publishes both
    // "succeed" and the first commit's content is silently REPLACED —
    // the exact corruption publishAtomic's create-if-absent contract
    // exists to make impossible. Pinned here as the documented hazard:
    // such a store needs an external lock provider, never this trait
    // implemented over a plain PUT.
    object Overwrites extends CommitStore {
      override def publishAtomic(fs: FileSystem, tmp: Path, dst: Path) = {
        fs.delete(dst, false); fs.rename(tmp, dst)
      }
    }
    val root2 = freshRoot()
    val l2 = new CommitLog(root2, hconf, store = Overwrites)
    l2.append(Commit(0L, "upsert", 0L, schema,
      Seq(graft.lake.FileAdd("/a", "p", "base")), Seq.empty))
    // a second writer publishing the SAME id is not arbitrated:
    new CommitLog(root2, hconf, store = Overwrites)
      .append(Commit(0L, "upsert", 1L, schema, Seq.empty, Seq.empty))
    val cold = new CommitLog(root2, hconf)
    assert(cold.read(0L).adds.isEmpty, "the winner's commit was " +
      "silently replaced — the hazard a conditional put prevents")

    // default path: the filesystem store arbitrates the same race to
    // one winner and one clean conflict (behavior unchanged)
    val root3 = freshRoot()
    val l3 = new CommitLog(root3, hconf)
    l3.append(Commit(0L, "upsert", 0L, schema,
      Seq(graft.lake.FileAdd("/a", "p", "base")), Seq.empty))
    intercept[CommitConflict](new CommitLog(root3, hconf)
      .append(Commit(0L, "upsert", 1L, schema, Seq.empty, Seq.empty)))
    assert(new CommitLog(root3, hconf).read(0L).adds.nonEmpty)
  }
}
