package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-identity-based schema evolution for [[LakeTable]] (the Delta
  * column-mapping / Hudi schema-on-read role; the reference's Hudi stack
  * delegated this to the jar — re-expressed here Spark-first).
  *
  * Every commit's `schemaJson` records the TABLE schema at commit time,
  * and every field carries a stable column id in its StructField
  * metadata (`graft.cid`). Identity, not name, is what a reader matches
  * files against:
  *
  *   - **rename**: a metadata-only commit maps a new name to the SAME id
  *     — old files keep the old physical name; reads alias by id.
  *   - **drop**: the field leaves the schema; old files keep the bytes
  *     but no reader selects them. Re-adding the same NAME mints a fresh
  *     id, so dropped data never resurrects (the Delta semantics that
  *     name-matching alone cannot give).
  *   - **widen**: int→long / float→double etc.; old files keep the
  *     narrow physical type; reads cast up by id. Narrowing/incompatible
  *     changes are rejected at commit time while any pre-change file is
  *     still live.
  *
  * Pre-feature commits carry no ids; their fields default to
  * name-identity (`cid == name`), which reproduces the old name-matching
  * behavior exactly — no migration step.
  */
private[graft] object SchemaEvo {

  /** StructField metadata key holding the stable column id */
  val CidKey = "graft.cid"

  /** stable id of a field: explicit metadata, else the name (legacy) */
  def cid(f: StructField): String =
    if (f.metadata.contains(CidKey)) f.metadata.getString(CidKey) else f.name

  private def withCid(f: StructField, id: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(CidKey, id).build())

  /** the field under a new name, carrying its identity (also used with
    * `newName == f.name` to materialize a legacy field's implicit id) */
  def renameField(f: StructField, newName: String): StructField =
    withCid(f.copy(name = newName), cid(f))

  /** a brand-new nullable field with a FRESH id (never name-identified,
    * so re-adding a previously dropped name cannot resurrect old data —
    * even on a legacy table whose old files identify by name) */
  def mintField(name: String, dt: DataType): StructField =
    withCid(StructField(name, dt, nullable = true),
      f"a${System.nanoTime()}%x")

  /** internal engine columns (`_commit_id`, `_seq`, ...) are identified
    * by name forever and never rename/widen */
  def isInternal(name: String): Boolean = name.startsWith("_")

  /** Widening lattice permitted on live files: the cast is exact, so a
    * reader upcasting an old file can never lose information. */
  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    // exact: every int/short/byte is representable as a double; longs
    // are NOT (53-bit mantissa), so long→double is rejected
    case (ByteType | ShortType | IntegerType, DoubleType) => true
    case _ => false
  }

  /** The table schema after a write: start from the previous table
    * schema, evolve by NAME against the batch (carrying ids), then
    * append genuinely new columns with fresh ids minted from the commit.
    *
    *   - shared name, batch type wider        → widened type, same id
    *   - shared name, same type               → unchanged
    *   - user column missing from the batch   → KEPT (a narrow MoR delta
    *     append must not narrow the table; readers null-backfill)
    *   - new column in the batch              → appended, fresh id
    *   - internal columns mirror the batch exactly (never kept)
    *
    * Incompatible type changes are rejected here — before any commit
    * JSON is written — EXCEPT when `reset` (a whole-table overwrite: no
    * old file survives, so the batch schema simply replaces the table's,
    * carrying ids for names that persist).
    */
  def evolve(prev: Option[StructType], batch: StructType, commitId: Long,
      reset: Boolean = false): StructType = {
    val prevFields = prev.map(_.fields.toSeq).getOrElse(Seq.empty)
    val prevByName = prevFields.map(f => f.name -> f).toMap
    var fresh = 0
    def mint(): String = { fresh += 1; s"c${commitId}_$fresh" }
    val batchNames = batch.fieldNames.toSet
    val evolvedExisting: Seq[StructField] =
      if (reset) Seq.empty
      else prevFields.flatMap { pf =>
        if (isInternal(pf.name)) None // internals mirror the batch
        else batch.fields.find(_.name == pf.name) match {
          case None =>
            // kept but ABSENT from this batch: the commit's files lack
            // the column, so readers null-backfill — the schema MUST
            // say nullable or Spark may elide IS NOT NULL filters
            // against rows that are in fact null
            Some(withCid(pf.copy(nullable = true), cid(pf)))
          case Some(bf) =>
            val target =
              if (pf.dataType == bf.dataType) pf.dataType
              else if (canWiden(pf.dataType, bf.dataType)) bf.dataType
              else if (canWiden(bf.dataType, pf.dataType)) pf.dataType // narrow batch upcasts
              else throw new IllegalArgumentException(
                s"incompatible type change for column '${pf.name}': " +
                  s"${pf.dataType.simpleString} -> ${bf.dataType.simpleString} " +
                  "(only exact widenings are allowed while old files are live)")
            Some(withCid(pf.copy(dataType = target,
              nullable = pf.nullable || bf.nullable), cid(pf)))
        }
      }
    val known = evolvedExisting.map(_.name).toSet
    val appended = batch.fields.toSeq
      .filter(f => !known.contains(f.name) && !isInternal(f.name))
      .map { f =>
        val id = if (reset) prevByName.get(f.name).map(cid).getOrElse {
          if (f.metadata.contains(CidKey)) f.metadata.getString(CidKey) else mint()
        } else mint()
        // a column appended to an EXISTING table null-backfills every
        // pre-existing file — force nullable (first commits / resets
        // keep the batch's own nullability: no older files exist)
        withCid(if (prev.isEmpty || reset) f else f.copy(nullable = true), id)
      }
    val internals = batch.fields.toSeq.filter(f => isInternal(f.name))
    StructType(evolvedExisting ++ appended ++ internals)
  }

  /** canonical identity of a schema for read-grouping: (cid, name, type)
    * per field, order-insensitive — two schemas with equal keys need no
    * adaptation between them */
  def adaptKey(s: StructType): Set[(String, String, DataType)] =
    s.fields.map(f => (cid(f), f.name, f.dataType)).toSet

  /** Conform a frame read under `from` (a file group's commit schema) to
    * `target` (the table schema of the read): match by column id —
    * rename via alias, widen via cast, null-backfill columns the files
    * predate. Internal columns are passed through only when the SOURCE
    * has them (a base file must not grow phantom `_seq`/`_deleted`
    * columns that would leak past the MoR merge into snapshots).
    */
  def adapt(df: DataFrame, from: StructType, target: StructType): DataFrame = {
    val fromByCid = from.fields.map(f => cid(f) -> f).toMap
    val fromNames = from.fieldNames.toSet
    val targetNames = target.fieldNames.toSet
    val selected: Seq[Column] = target.fields.toSeq.flatMap { tf =>
      if (isInternal(tf.name))
        if (fromNames.contains(tf.name)) Some(col(tf.name)) else None
      else fromByCid.get(cid(tf)) match {
        case Some(sf) if sf.name == tf.name && sf.dataType == tf.dataType =>
          Some(col(sf.name))
        case Some(sf) => Some(col(sf.name).cast(tf.dataType).as(tf.name))
        case None => Some(lit(null).cast(tf.dataType).as(tf.name))
      }
    }
    // internals present in the files but absent from the target schema
    // (delta-file `_seq`/`_deleted` under a base target) stay visible:
    // the MoR merge consumes them downstream
    val extras = from.fields.toSeq
      .filter(f => isInternal(f.name) && !targetNames.contains(f.name))
      .map(f => col(f.name))
    df.select(selected ++ extras: _*)
  }

  /** Union a TIMELINE of schemas by column id: later generations win a
    * column's name/type (renames and widenings surface under their
    * final form instead of as duplicate name-matched fields), columns
    * only old commits knew stay present (a change stream keeps emitting
    * a dropped column's historical values), internals merge by name.
    * First-appearance order is kept so the result is stable. */
  def foldTimeline(schemas: Seq[StructType]): StructType = {
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    schemas.foreach(_.fields.foreach { f =>
      val key = if (isInternal(f.name)) s"!${f.name}" else cid(f)
      acc(key) = f // later commit wins name/type; insertion order kept
    })
    StructType(acc.values.toSeq)
  }

  /** Conform one micro-batch file group (written under `from`) to a
    * STREAM's fixed schema — by column id, like [[adapt]], but strict:
    * the stream contract (Delta's) is that non-representable evolution
    * FAILS the stream for a restart rather than silently nulling or
    * dropping data. Renames alias transparently; pre-widening files
    * cast up; a column ADDED or widened past the stream schema after
    * start throws. */
  def adaptToStream(df: DataFrame, from: StructType, stream: StructType): DataFrame = {
    val fromUser = from.fields.filterNot(f => isInternal(f.name))
    val fromByCid = fromUser.map(f => cid(f) -> f).toMap
    val streamCids = stream.fields.filterNot(f => isInternal(f.name))
      .map(cid).toSet
    val unknown = fromUser.filterNot(f => streamCids.contains(cid(f)))
    if (unknown.nonEmpty) throw new IllegalStateException(
      s"table schema evolved after stream start (new column(s) " +
        s"${unknown.map(_.name).mkString(", ")}): restart the stream to " +
        "pick up the evolved schema")
    val fromNames = from.fieldNames.toSet
    df.select(stream.fields.toSeq.map { sf =>
      if (isInternal(sf.name))
        if (fromNames.contains(sf.name)) col(sf.name)
        else lit(null).cast(sf.dataType).as(sf.name)
      else fromByCid.get(cid(sf)) match {
        case Some(ff) if ff.name == sf.name && ff.dataType == sf.dataType =>
          col(sf.name)
        case Some(ff) =>
          if (!canWiden(ff.dataType, sf.dataType))
            throw new IllegalStateException(
              s"column '${sf.name}' evolved to ${ff.dataType.simpleString}, " +
                s"beyond the stream's ${sf.dataType.simpleString}: restart " +
                "the stream to pick up the evolved schema")
          col(ff.name).cast(sf.dataType).as(sf.name)
        case None => lit(null).cast(sf.dataType).as(sf.name)
      }
    }: _*)
  }

  /** Target schema for a REBASED write (its commit lost the optimistic
    * race to disjoint interveners): the new head's schema — so a
    * concurrent rename/widen maps this write's old physical names onto
    * their new identity — PLUS any user column of the failed commit the
    * head does not know. Keeping those is what serial re-execution
    * would do: a column this write introduced (or re-introduced after a
    * concurrent drop) lands with THIS write's data, re-minted under a
    * fresh id by the recommit's evolve, so dropped generations never
    * resurrect through it. */
  def rebaseTarget(failed: StructType, head: StructType): StructType = {
    val headCids = head.fields.filterNot(f => isInternal(f.name)).map(cid).toSet
    val headNames = head.fieldNames.toSet
    // a name collision (the intervener dropped AND re-added this very
    // name) cannot be represented twice — the head's definition wins
    val keep = failed.fields.filter(f =>
      !isInternal(f.name) && !headCids.contains(cid(f)) &&
        !headNames.contains(f.name))
    StructType(head.fields ++ keep)
  }

  /** Validate that every retained live file (grouped by its commit
    * schema) can still be adapted to `next` losslessly: for each shared
    * column id the file's physical type must equal or widen to the new
    * type. Called at commit time so a bad evolution fails BEFORE the
    * commit publishes. */
  def validateAgainstLiveFiles(
      next: StructType, liveSchemas: Seq[StructType]): Unit = {
    val nextByCid = next.fields.map(f => cid(f) -> f).toMap
    liveSchemas.foreach { fileSchema =>
      fileSchema.fields.filterNot(f => isInternal(f.name)).foreach { ff =>
        nextByCid.get(cid(ff)).foreach { nf =>
          if (!canWiden(ff.dataType, nf.dataType))
            throw new IllegalArgumentException(
              s"schema change would corrupt live files: column '${nf.name}' " +
                s"has live data of type ${ff.dataType.simpleString}, which " +
                s"cannot widen to ${nf.dataType.simpleString}")
        }
      }
    }
  }
}
