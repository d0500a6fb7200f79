package graft.tools

import org.apache.hadoop.conf.Configuration

import graft.lake.{Commit, CommitLog, FileAdd}

/** A/B measurement for timeline archival: a LONG timeline (default 2000
  * commits) is cleaned to a short travel horizon, then archived — the
  * claim under test is that `_log/` LISTING, cold resolution, and
  * clean's replay all become O(horizon), not O(table age), while full
  * history stays readable from O(n/segment) archive segments.
  * Metadata-only by design (same rationale as CkptAB): the costs are
  * file counts and JSON opens, so the timeline is synthesized straight
  * through `CommitLog.append`, no Spark session.
  *
  * Run: `sbt "runMain graft.tools.ArchiveAB [nCommits]"`
  */
object ArchiveAB {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val retain = 20
    val root = java.nio.file.Files.createTempDirectory("archab").toString
    val hconf = new Configuration()

    val width = 8
    val log = new CommitLog(root, hconf, checkpointEvery = 16)
    def files(id: Long): Seq[FileAdd] = (0 until 3).map { j =>
      FileAdd(s"$root/data/c$id/part-$j.parquet", s"p${id % 4}", "base",
        kmin = f"k$id%08d", kmax = f"k${id + 1}%08d",
        cmin = Map("ts" -> id.toString), cmax = Map("ts" -> (id + 1).toString),
        bytes = 1L << 20, rows = 10000L)
    }
    val schema = """{"type":"struct","fields":[]}"""
    (0L until n).foreach { id =>
      val removes =
        if (id >= width) files(id - width).map(_.path) else Seq.empty
      log.append(Commit(id, "upsert", 0L, schema, files(id), removes),
        basedOnLatest = if (id == 0) log.EmptyTable else id - 1)
    }
    log.clean(retain)

    def logCounts(): (Int, Int, Int) = {
      val names = new java.io.File(root, "_log").list().toSeq
      (names.count(_.matches("\\d+\\.json")),
        names.count(_.startsWith("arch-")),
        names.count(_.startsWith("ckpt-")))
    }
    def coldResolve(): (Double, Long, Long) = {
      val c = new CommitLog(root, hconf)
      val t0 = System.nanoTime()
      val live = c.liveFiles()
      val sec = (System.nanoTime() - t0) / 1e9
      require(live.size == width * 3, s"live=${live.size}")
      (sec, c.jsonOpens.get(), c.ckptOpens.get())
    }
    def minOf3() = (1 to 3).map(_ => coldResolve()).minBy(_._1)

    val (preJsons, _, _) = logCounts()
    val (preSec, preOpens, _) = minOf3()
    val preHistory = log.commitsAll.size

    val t0 = System.nanoTime()
    val archived = log.archive(segmentSize = 100)
    val archSec = (System.nanoTime() - t0) / 1e9

    val (postJsons, postSegs, postCks) = logCounts()
    val (postSec, postOpens, postCkOpens) = minOf3()
    // full history must survive, served from segments
    val cold = new CommitLog(root, hconf)
    val postHistory = cold.commitsAll.size
    require(postHistory == preHistory, s"history $preHistory -> $postHistory")
    // travel below the boundary refuses
    val refused =
      try { cold.liveFiles(Some(5L)); false }
      catch { case e: IllegalArgumentException =>
        e.getMessage.contains("archived") }
    require(refused, "expected archived-commit travel to refuse")

    println(f"[archab] commits=$n retain=$retain archived=$archived " +
      f"archive_sec=$archSec%.3f | pre: log_jsons=$preJsons " +
      f"cold_sec=$preSec%.4f cold_opens=$preOpens | post: " +
      f"log_jsons=$postJsons segments=$postSegs ckpts=$postCks " +
      f"cold_sec=$postSec%.4f cold_opens=$postOpens ckpt_opens=$postCkOpens | " +
      f"listing_ratio=${preJsons.toDouble / math.max(1, postJsons)}%.0fx " +
      f"history_rows=$postHistory")
  }
}
