package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StringType

import graft.lake.GraftTxn

/** SQL spelling for multi-table transactions ([[graft.lake.GraftTxn]]):
  * `BEGIN [TRANSACTION]` / `COMMIT` / `ROLLBACK`, parsed by
  * [[GraftSqlParser]]'s fallback mini-parser (Spark's grammar has none
  * of the three as statements — verified: all raise ParseException).
  *
  * Scope is the SESSION: while a transaction is open, every graft
  * catalog table resolved by a statement ([[GraftTableV2.lake]]) uses
  * the transaction's STAGED handle — writes land as invisible
  * `.json.txn` commits, reads fold the session's own staged commits
  * (read-your-writes), and other sessions/engines see nothing until
  * `COMMIT` publishes the single atomic decision marker that makes
  * every staged commit visible at once. `ROLLBACK` retires them all.
  *
  * The coordinator directory lives under the graft catalog's warehouse
  * (`<warehouse>/_txns` — the same location the `txn_reap` janitor
  * sweeps), resolved from the current catalog when it is a graft one,
  * otherwise from the first registered graft catalog.
  *
  * Deliberately OUTSIDE transaction scope (documented, loud where
  * possible): DDL (CREATE/ALTER — descriptor writes are not commit-log
  * commits), maintenance statements (OPTIMIZE/VACUUM build their own
  * unstaged handles), and time-travel reads (`VERSION AS OF` pins a
  * published snapshot; staged commits are not part of any snapshot).
  */
private[graft] object GraftSessionTxn {
  private val open = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, GraftTxn]())

  def current(s: SparkSession): Option[GraftTxn] = Option(open.get(s))

  /** Abort every open session transaction NOW, returning the aborted
    * txn ids. Two callers: the application-end listener below (a
    * session that dies with a txn open must retire its staged commits
    * DETERMINISTICALLY, not leak them until the `txn_reap` janitor),
    * and the Verify/Bench harness guard (an open txn must never leak
    * across catalog queries). Abort is pure metadata IO (one decision
    * marker), safe while the SparkContext is stopping. */
  def abortAll(): Seq[String] = {
    val txns = open.synchronized {
      val vs = new java.util.ArrayList(open.values())
      open.clear()
      scala.jdk.CollectionConverters.ListHasAsScala(vs).asScala.toSeq
    }
    txns.flatMap(t => scala.util.Try { t.abort(); t.id }.toOption)
  }

  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  def begin(s: SparkSession, txn: GraftTxn): Unit = {
    require(Option(open.get(s)).isEmpty,
      s"a transaction is already open in this session " +
        s"(${open.get(s).id}); COMMIT or ROLLBACK it first")
    open.put(s, txn)
    // one-time application-end hook: sessions share the context, so one
    // listener retires every session's open transaction at stop()
    if (hooked.compareAndSet(false, true)) {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          abortAll(); ()
        }
      })
    }
    ()
  }

  def clear(s: SparkSession): Unit = { open.remove(s); () }

  /** `<warehouse>/_txns` of the current graft catalog, else of the
    * first registered one (name-sorted, deterministic) */
  def coordDir(session: SparkSession): String = {
    val cm = session.sessionState.catalogManager
    val cur = cm.currentCatalog match {
      case g: GraftCatalog => Some(g)
      case _ => None
    }
    val cat = cur.orElse {
      session.conf.getAll.keys.toSeq
        .filter(_.startsWith("spark.sql.catalog."))
        .map(_.stripPrefix("spark.sql.catalog."))
        .filterNot(_.contains("."))
        .sorted.iterator
        .flatMap(n => scala.util.Try(cm.catalog(n)).toOption)
        .collectFirst { case g: GraftCatalog => g }
    }.getOrElse(throw new IllegalStateException(
      "BEGIN TRANSACTION needs a graft catalog (none registered in this session)"))
    cat.warehousePath + "/_txns"
  }
}

private[sql] final case class GraftBeginTxnCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("txn_id", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val txn = GraftTxn.begin(session, GraftSessionTxn.coordDir(session))
    GraftSessionTxn.begin(session, txn)
    Seq(Row(txn.id))
  }
}

private[sql] final case class GraftCommitTxnCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("txn_id", StringType, nullable = false)(),
      AttributeReference("status", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val txn = GraftSessionTxn.current(session).getOrElse(
      throw new IllegalStateException("COMMIT without an open transaction"))
    // the session slot clears whatever the outcome: a lost decision race
    // (the reaper aborted us) surfaces as GraftTxn.commit's
    // CommitConflict AFTER the staged commits followed that decision —
    // leaving the dead txn open would just poison every later statement
    try txn.commit() finally GraftSessionTxn.clear(session)
    Seq(Row(txn.id, "committed"))
  }
}

private[sql] final case class GraftRollbackTxnCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("txn_id", StringType, nullable = false)(),
      AttributeReference("status", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val txn = GraftSessionTxn.current(session).getOrElse(
      throw new IllegalStateException("ROLLBACK without an open transaction"))
    try txn.abort() finally GraftSessionTxn.clear(session)
    Seq(Row(txn.id, "rolled back"))
  }
}

/** `SAVEPOINT name` / `ROLLBACK TO [SAVEPOINT] name` / `RELEASE
  * [SAVEPOINT] name` — partial rollback inside the open session
  * transaction ([[graft.lake.GraftTxn.savepoint]]): ROLLBACK TO
  * retracts every staged commit made since the savepoint across ALL
  * enlisted tables while the transaction stays open. */
private[sql] final case class GraftSavepointCommand(name: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("txn_id", StringType, nullable = false)(),
      AttributeReference("savepoint", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val txn = GraftSessionTxn.current(session).getOrElse(
      throw new IllegalStateException("SAVEPOINT without an open transaction"))
    txn.savepoint(name)
    Seq(Row(txn.id, name))
  }
}

private[sql] final case class GraftRollbackToSavepointCommand(name: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("txn_id", StringType, nullable = false)(),
      AttributeReference("savepoint", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val txn = GraftSessionTxn.current(session).getOrElse(
      throw new IllegalStateException(
        "ROLLBACK TO SAVEPOINT without an open transaction"))
    txn.rollbackToSavepoint(name)
    Seq(Row(txn.id, name))
  }
}

private[sql] final case class GraftReleaseSavepointCommand(name: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("txn_id", StringType, nullable = false)(),
      AttributeReference("savepoint", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val txn = GraftSessionTxn.current(session).getOrElse(
      throw new IllegalStateException(
        "RELEASE SAVEPOINT without an open transaction"))
    txn.releaseSavepoint(name)
    Seq(Row(txn.id, name))
  }
}
