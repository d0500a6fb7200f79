package graft.tools

import org.apache.hadoop.conf.Configuration

import graft.lake.{Commit, CommitLog, FileAdd}

/** A/B measurement for commit-log checkpoints: cold-reader snapshot
  * resolution over a LONG timeline, with checkpoints present vs
  * deleted. Metadata-only by design — resolution cost is commit-JSON
  * I/O, so the timeline is synthesized directly through
  * `CommitLog.append` (realistic FileAdd payloads incl. stats), no
  * Spark session involved. Prints min-of-3 wall times and the open
  * counts (the scale term: local fs hides per-open latency that S3
  * does not).
  *
  * Run: `sbt "runMain graft.tools.CkptAB [nCommits]"`
  */
object CkptAB {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val every = 16
    val root = java.nio.file.Files.createTempDirectory("ckptab").toString
    val hconf = new Configuration()

    // one writer builds the timeline: each commit supersedes the files
    // of the commit `width` back (live set stays ~width*files bounded,
    // like a compacting table), with per-file key/column stats so the
    // JSON payload is production-shaped
    val width = 8
    val log = new CommitLog(root, hconf, checkpointEvery = every)
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

    def coldResolve(): (Double, Long, Long) = {
      val c = new CommitLog(root, hconf)
      val t0 = System.nanoTime()
      val live = c.liveFiles()
      val sec = (System.nanoTime() - t0) / 1e9
      require(live.size == width * 3, s"live=${live.size}")
      (sec, c.jsonOpens.get(), c.ckptOpens.get())
    }
    def minOf3(): (Double, Long, Long) =
      (1 to 3).map(_ => coldResolve()).minBy(_._1)

    val (withSec, withOpens, withCk) = minOf3()
    // delete every checkpoint → the full-replay control
    val dir = new java.io.File(root, "_log")
    dir.listFiles().filter(_.getName.startsWith("ckpt-")).foreach(_.delete())
    val (bareSec, bareOpens, _) = minOf3()

    println(f"[ckptab] commits=$n every=$every " +
      f"with_ckpt: sec=$withSec%.4f commit_opens=$withOpens ckpt_opens=$withCk | " +
      f"full_replay: sec=$bareSec%.4f commit_opens=$bareOpens | " +
      f"opens_ratio=${bareOpens.toDouble / math.max(1, withOpens)}%.0fx " +
      f"time_ratio=${bareSec / withSec}%.1fx")
  }
}
