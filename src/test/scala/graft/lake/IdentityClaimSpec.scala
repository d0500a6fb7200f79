package graft.lake

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Identity-range claim markers ([[CommitLog.claimIdentityRange]]):
  * the conditional put must be keyed on the BASE ALONE. The old
  * `<base>_<units>` naming let two racing writers that computed the
  * same next base but different unit counts (units vary with the
  * batch's partition count) publish to DIFFERENT destinations — both
  * claims landing, ranges overlapping, duplicate ids minted. Markers
  * are now named by zero-padded base with units in the file CONTENT,
  * so any two claimers of one base collide regardless of units.
  */
class IdentityClaimSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshLog(): (CommitLog, Path) = {
    val root = Files.createTempDirectory("idclaim").resolve("t").toString
    val t = LakeTable(spark, LakeTableConfig(
      root, keyCols = Seq("pk"), precombineCol = "ts"))
    import spark.implicits._
    t.bulkInsert(Seq((1L, 0, 0)).toDF("pk", "v", "ts"))
    (t.log, new Path(root, "_log/_ident_pk"))
  }

  test("claim markers are keyed by base alone; units travel in content") {
    val (log, dir) = freshLog()
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

    assert(log.claimIdentityRange("pk", 5L) == 0L)
    assert(log.claimIdentityRange("pk", 7L) == 5L)
    assert(log.claimIdentityRange("pk", 1L) == 12L)

    val markers = fs.listStatus(dir).map(_.getPath.getName).sorted.toSeq
    assert(markers == Seq(f"${0L}%020d", f"${5L}%020d", f"${12L}%020d"),
      s"marker names must be the zero-padded base with NO units suffix " +
        s"(the destination two same-base racers collide on), got $markers")
    def content(n: String): String = {
      val in = fs.open(new Path(dir, n))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
    assert(content(f"${0L}%020d") == "5" && content(f"${5L}%020d") == "7",
      "units must round-trip through marker content")

    // the race the naming fix closes: a SECOND claim of an already-taken
    // base must be rejected by the store even when its units differ —
    // publishing under the old scheme (base_units) would have minted an
    // overlapping range. Simulate the loser's publish directly.
    val tmp = new Path(dir, ".claim-loser.tmp")
    val out = fs.create(tmp, true)
    try out.write("9".getBytes("UTF-8")) finally out.close()
    val landed = fs.rename(tmp, new Path(dir, f"${5L}%020d"))
    assert(!landed || content(f"${5L}%020d") == "7",
      "a same-base claim with different units must not displace the winner")
  }

  test("a mixed-version double claim of one base advances past the LARGER range") {
    val (log, dir) = freshLog()
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    // a rolling-upgrade race left TWO claims of base 0: an upgraded
    // writer's zero-padded marker (units 10 in content) and a legacy
    // writer's 0_100 — the next base must clear BOTH ranges, not just
    // whichever marker the listing happens to sort last
    val out = fs.create(new Path(dir, f"${0L}%020d"), true)
    try out.write("10".getBytes("UTF-8")) finally out.close()
    fs.create(new Path(dir, "0_100"), true).close()
    assert(log.claimIdentityRange("pk", 3L) == 100L,
      "next base must be max over ALL claims at the max base of base+units")
  }

  test("a legacy racer landing between list and publish forces a retreat") {
    val root = Files.createTempDirectory("idclaim").resolve("t").toString
    val t = LakeTable(spark, LakeTableConfig(
      root, keyCols = Seq("pk"), precombineCol = "ts"))
    import spark.implicits._
    t.bulkInsert(Seq((1L, 0, 0)).toDF("pk", "v", "ts"))
    val dir = new Path(root, "_log/_ident_pk")
    // store seam: just before OUR publish of a claim base lands, a
    // legacy-version writer publishes `<same base>_50` — a DIFFERENT
    // destination name, so both creates succeed and the collision
    // arbitration never fires. The post-publish re-list must detect the
    // legacy twin and RETREAT: the returned range starts past both.
    @volatile var injected = false
    val racing = new CommitStore {
      override def publishAtomic(fs: org.apache.hadoop.fs.FileSystem,
          tmp: Path, dst: Path): Boolean = {
        if (!injected && dst.getName.forall(_.isDigit)) {
          injected = true
          fs.create(new Path(dst.getParent, s"${dst.getName.toLong}_50"),
            true).close()
        }
        CommitStore.Filesystem.publishAtomic(fs, tmp, dst)
      }
    }
    val log = new CommitLog(root, spark.sparkContext.hadoopConfiguration,
      0, racing)
    val got = log.claimIdentityRange("pk", 4L)
    assert(got == 50L,
      s"the claimer must retreat past the legacy racer's [0, 50), got $got")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(dir).map(_.getPath.getName).sorted.toSeq
    assert(names.contains(f"${50L}%020d"))
  }

  test("legacy <base>_<units> markers still advance the next base") {
    val (log, dir) = freshLog()
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    fs.create(new Path(dir, "7_5"), true).close()
    assert(log.claimIdentityRange("pk", 4L) == 12L,
      "a pre-upgrade claim file must be honored when computing the next base")
    assert(log.claimIdentityRange("pk", 2L) == 16L)
  }
}
