package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, LakeTableConfig}

/** Model-based chaos sequences: seeded-random interleavings of the
  * table's MUTATING surface — upsert / key delete / predicate delete /
  * deletion-vector delete / compact / small-file compact / bounded
  * clean — on BOTH storage types, checked against an in-memory model:
  *
  *   1. after EVERY operation, the live snapshot equals the model;
  *   2. at the end, EVERY still-travelable historical commit replays
  *      exactly (time travel over the whole mixed history, including
  *      snapshots taken under live DVs and MoR delta stacks);
  *   3. the change feed composes: applying changesBetween(a, b) onto
  *      the model at a yields the model at b, for random (a, b).
  *
  * The single-op laws live in LakePropertySpec; what this adds is the
  * INTERLEAVING — bugs like the r16 nested-pruning row-shape slip (a
  * path only a specific operation ORDER leaves behind) hide exactly in
  * combinations no single-op law exercises. Sequences are seed-pinned
  * so a failure reproduces byte-identically.
  */
class LakeChaosSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private type Row = (Long, Int, String, Int) // pk, vid, payload, ts
  /** record identity: bare pk under a GLOBAL index (an upsert may MOVE
    * the row across partitions); (partition, pk) without one — the
    * same pk may then live in both partitions */
  private type Model = Map[Any, Row]

  private def toDf(rows: Seq[Row]): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "vendorid", "payload", "ts")
  }

  private def snap(df: DataFrame, keyOf: Row => Any): Model = {
    import spark.implicits._
    val rows = df.select($"pk", $"vendorid", $"payload", $"ts")
      .as[Row].collect()
    val m = rows.map(r => keyOf(r) -> r).toMap
    assert(m.size == rows.length, s"duplicate identity rows: ${rows.toSeq}")
    m
  }

  /** precombine upsert semantics: incoming wins ties (higher commit);
    * within one batch the later row wins an equal-ts tie (_seq) */
  private def applyUpsert(m: Model, rows: Seq[Row], keyOf: Row => Any): Model = {
    val batchWinner = rows.zipWithIndex
      .groupBy { case (r, _) => keyOf(r) }
      .map { case (k, rs) => k -> rs.maxBy { case ((_, _, _, ts), i) => (ts, i) }._1 }
    batchWinner.foldLeft(m) { case (acc, (k, v)) =>
      acc.get(k) match {
        case Some((_, _, _, oldTs)) if oldTs > v._4 => acc
        case _ => acc + (k -> v)
      }
    }
  }

  private def runChaos(mode: String, globalIdx: Boolean, seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val keyOf: Row => Any =
      if (globalIdx) r => r._1 else r => (r._1, r._2)
    val t = LakeTable(spark, LakeTableConfig(
      Files.createTempDirectory(s"chaos_$mode").resolve("t").toString,
      Seq("pk"), "ts", partitionCols = Seq("vendorid"),
      storageType = mode, globalIndex = globalIdx))

    def batch(n: Int): Seq[Row] =
      (1 to n).map(_ => (rnd.nextInt(8).toLong + 1, rnd.nextInt(2) + 1,
        s"p${rnd.nextInt(1000)}", rnd.nextInt(6)))

    var model: Model = Map.empty
    // (commit id, model at that commit) for the time-travel replay
    var history = Vector.empty[(Long, Model)]

    // seed commit so every later op has something to chew on
    val seedBatch = batch(6)
    val c0 = t.upsert(toDf(seedBatch))
    model = applyUpsert(model, seedBatch, keyOf)
    assert(model.nonEmpty)
    history :+= (c0, model)

    val nOps = 14
    (1 to nOps).foreach { i =>
      val op = rnd.nextInt(10)
      op match {
        case 0 | 1 | 2 | 3 => // upsert (the dominant op in real life)
          val b = batch(rnd.nextInt(5) + 1)
          val cid = t.upsert(toDf(b))
          model = applyUpsert(model, b, keyOf)
          history :+= (cid, model)
        case 4 => // delete by bare key: hits the pk in EVERY partition
          val doomed = model.values.map(_._1).toSeq.distinct.sorted
            .filter(_ => rnd.nextBoolean()).take(3)
          if (doomed.nonEmpty) {
            import spark.implicits._
            val cid = t.delete(doomed.toDF("pk"))
            model = model.filterNot { case (_, r) => doomed.contains(r._1) }
            history :+= (cid, model)
          }
        case 5 => // delete by predicate (partition-scoped when possible)
          val vid = rnd.nextInt(2) + 1
          val tsCut = rnd.nextInt(6)
          val cid = t.deleteWhere(
            org.apache.spark.sql.functions.col("vendorid") === vid &&
              org.apache.spark.sql.functions.col("ts") < tsCut)
          model = model.filterNot { case (_, (_, v, _, ts)) => v == vid && ts < tsCut }
          history :+= (cid, model)
        case 6 => // deletion-vector delete (position deletes, CoW only)
          val doomed = model.values.map(_._1).toSeq.distinct.sorted
            .filter(_ => rnd.nextBoolean()).take(2)
          if (mode == "cow" && doomed.nonEmpty) {
            import spark.implicits._
            val cid = t.deleteDv(doomed.toDF("pk"))
            model = model.filterNot { case (_, r) => doomed.contains(r._1) }
            history :+= (cid, model)
          }
        case 7 => // physical reorganization: never a logical change
          val cid = if (mode == "mor") t.compact() else t.compactSmall()
          if (t.log.latestId.contains(cid)) history :+= (cid, model)
        case 8 => // fold DVs (CoW) / compact the delta stack (MoR): no-op reorg
          val cid = if (mode == "cow") t.foldDvs() else t.compact()
          if (cid >= 0 && t.log.latestId.contains(cid)) history :+= (cid, model)
        case 9 => // bounded clean: keeps a deep travelable suffix
          t.clean(retain = 8)
          history = history.filter(_._1 > t.log.cleanedUpTo)
      }
      assert(snap(t.read(), keyOf) == model,
        s"[$mode seed=$seed] live snapshot diverged after op #$i (op=$op)")
    }

    // law 2: every still-travelable commit replays exactly
    history.foreach { case (cid, m) =>
      assert(snap(t.readAsOf(cid), keyOf) == m,
        s"[$mode seed=$seed] time travel to commit $cid diverged")
    }

    // law 3: the change feed composes between random historical points
    if (history.size >= 2) {
      val idx = rnd.shuffle(history.indices.toList).take(2).sorted
      val (fromC, fromM) = history(idx.head)
      val (toC, toM) = history(idx.last)
      if (fromC < toC) {
        import spark.implicits._
        val changes = t.changesBetween(fromC, toC)
          .select($"pk", $"vendorid", $"payload", $"ts", $"_change_type")
          .as[(Long, Int, String, Int, String)].collect()
        val replayed = changes.foldLeft(fromM) { case (acc, (pk, v, p, ts, ct)) =>
          val row: Row = (pk, v, p, ts)
          ct match {
            case "delete" => acc - keyOf(row)
            case "insert" | "update" => acc + (keyOf(row) -> row)
            case other => fail(s"unexpected change type $other")
          }
        }
        assert(replayed == toM,
          s"[$mode seed=$seed] changesBetween($fromC, $toC) does not compose")
      }
    }
  }

  /** default seeds are pinned for CI determinism; widen the sweep with
    * GRAFT_CHAOS_SEEDS=1,2,3,... for local fuzzing sessions */
  private val seeds: Seq[Long] = sys.env.get("GRAFT_CHAOS_SEEDS")
    .map(_.split(',').map(_.trim.toLong).toSeq)
    .getOrElse(Seq(11L, 42L, 1337L))

  for {
    (mode, globalIdx) <- Seq(("cow", false), ("mor", false),
      ("cow", true), ("mor", true))
    seed <- seeds
  } test("chaos sequence holds against the model " +
      s"($mode${if (globalIdx) "+global" else ""}, seed=$seed)") {
    runChaos(mode, globalIdx, seed)
  }
}
