package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** "IceLite" — a minimal Iceberg-style table format built from scratch for
  * this engine (no Iceberg jar exists in the sandbox): immutable parquet
  * data files + a JSON snapshot log with an atomic put-if-absent commit.
  *
  * Layout:
  * {{{
  *   <dir>/snap/v0000000001.json     // one immutable snapshot DIFF per commit
  *   <dir>/snap/c0000000032.json     // periodic full-state checkpoint
  *   <dir>/data/<commitUuid>/b=<bucket>/part-*.parquet
  * }}}
  *
  * Commit protocol (the analogue of the reference's one-JDBC-transaction-
  * per-put batch, `/root/reference/src/main/java/io/confluent/connect/jdbc/sink/JdbcDbWriter.java:56,83`):
  * data files are staged first (invisible — snapshots reference files
  * explicitly, never by directory listing), then the next snapshot file is
  * published with an atomic create-if-absent move. Losing a race throws;
  * the caller re-reads and retries. A crash between staging and publish
  * leaves only unreferenced orphan files. Snapshot `properties` carry the
  * free-form commit bookkeeping — `(epoch, offsetRange)` for exactly-once
  * streaming — mirroring Iceberg snapshot summaries.
  *
  * Metadata scale (Iceberg's manifest-list idea, re-shaped for a linear
  * CAS-serialized log — concurrent writers serialize through the
  * put-if-absent commit): each published v-file holds only the DIFF of the
  * per-bucket file lists against its parent — O(files added/replaced this
  * commit), NOT O(live files). A MOR append epoch therefore writes and a
  * tailing driver parses O(changes) metadata regardless of table size;
  * the full per-bucket listing is materialized only in periodic
  * checkpoint files (`c*.json`, every [[IceLite.CheckpointEvery]] commits,
  * at create, and at the expiry boundary). State reads fold
  * checkpoint + diffs, memoized per table handle so a streaming driver
  * folds exactly one diff per epoch.
  *
  * Data is hash-bucketed by conv_id (`bucket = pmod(xxhash64(conv_id), P)`,
  * reference analogue: `PARTITION BY HASH` DDL,
  * `.../dialect/PostgreSqlDatabaseDialect.java:208-232`), so a CDC merge
  * rewrites only affected buckets and point/range queries prune by bucket.
  */
final class IceLiteTable(val dir: String) {
  import IceLite._

  private val snapDir = Paths.get(dir, "snap")
  private val dataDir = Paths.get(dir, "data")

  def currentVersion: Long =
    listSnapshotVersions.lastOption.getOrElse(0L)

  /** Retained (non-expired) snapshot versions, oldest → newest. The
    * listing the metadata tables ([[MetaTables]]) enumerate — O(retained
    * versions), never touches data files.
    */
  def versions: Seq[Long] = listSnapshotVersions

  // Files.list/Files.walk hold a directory fd until closed — a long-running
  // streaming driver calls currentVersion every epoch, so leaking them to GC
  // would exhaust the fd limit (EMFILE). Always materialize-then-close.
  private def listDir[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(p)
    try f(s.iterator.asScala) finally s.close()
  }

  private def listSnapshotVersions: Seq[Long] =
    if (!Files.isDirectory(snapDir)) Seq.empty
    else
      listDir(snapDir)(_.map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
        .toSeq).sorted

  private def listCheckpointVersions: Seq[Long] =
    if (!Files.isDirectory(snapDir)) Seq.empty
    else
      listDir(snapDir)(_.map(_.getFileName.toString)
        .filter(n => n.startsWith("c") && n.endsWith(".json"))
        .map(n => n.stripPrefix("c").stripSuffix(".json").toLong)
        .toSeq).sorted

  private[table] def vFile(v: Long): Path = snapDir.resolve(f"v$v%010d.json")
  private def cFile(v: Long): Path = snapDir.resolve(f"c$v%010d.json")

  // Memoized folded state (immutable value; volatile write). A streaming
  // driver calls current every epoch with a monotonically increasing
  // version, so each call folds exactly ONE new diff on top of the cache
  // instead of re-parsing the whole per-bucket file listing (the
  // O(live-files)-per-epoch driver cost this format removes).
  @volatile private var stateCache: Snapshot = _

  /** Diffs folded by the last [[snapshot]] call — the deterministic
    * per-read metadata cost (0 = cache hit; a tailing reader sees 1 per
    * new commit). Observability/test hook, not part of the table state.
    */
  @volatile var lastFoldSteps: Int = 0

  /** Full table state as of `version`: nearest checkpoint (or the memoized
    * fold, whichever is closer) + the diff chain up to `version`.
    */
  def snapshot(version: Long): Snapshot = {
    // Expiry (on the background maintenance thread since round 4) can
    // delete a checkpoint BETWEEN this reader's list and read: it first
    // writes the new boundary checkpoint, then deletes the old ones, so
    // a re-list always sees a complete chain again. Bounded retry loop
    // (not a single retry): a second expiry can race the first re-read,
    // and the missing-file signal may arrive WRAPPED (e.g.
    // UncheckedIOException around a FileNotFound from a stream) — match
    // the cause chain, not just the top-level type.
    import IceLite.missingFile
    var attempt = 0
    while (true) {
      try return snapshot0(version)
      catch { case e: Throwable if missingFile(e) && attempt < 4 => attempt += 1 }
    }
    throw new IllegalStateException("unreachable")
  }

  private def snapshot0(version: Long): Snapshot = {
    val c = stateCache
    if (c != null && c.version == version) { lastFoldSteps = 0; return c }
    var s: Snapshot = {
      val ckv = listCheckpointVersions.filter(_ <= version) match {
        case Seq() => None
        case vs    => Some(vs.max)
      }
      val cacheUsable = c != null && c.version < version
      ckv match {
        case Some(k) if !cacheUsable || k > c.version => readCheckpoint(cFile(k))
        case _ if cacheUsable => c
        case None =>
          listSnapshotVersions.headOption match {
            case Some(1L) =>
              // no checkpoint but the chain is complete from v1 (e.g. a
              // crash between create()'s v1 link and its c1 checkpoint
              // write): v1's diff is against the empty parent
              emptySnapshot
            case Some(v0) if v0 <= version =>
              // pre-diff-build table whose history was expired (old
              // expiry wrote no checkpoints): every old-format v-file is
              // a self-sufficient full snapshot — seed from the oldest
              readDiffOrFull(vFile(v0)) match {
                case Left(full) => full
                case Right(_) => throw new IllegalStateException(
                  s"no checkpoint at or below version $version in $snapDir and the oldest " +
                    s"surviving v-file v$v0 is a diff — corrupt or expired table metadata")
              }
            case _ => throw new IllegalStateException(
              s"no checkpoint at or below version $version in $snapDir — corrupt or expired table metadata")
          }
      }
    }
    var steps = 0
    while (s.version < version) {
      // old-format (pre-diff build) v-files carry the FULL state — they
      // replace instead of folding, keeping round-2 tables readable
      readDiffOrFull(vFile(s.version + 1)) match {
        case Right(d)   => s = fold(s, d)
        case Left(full) => s = full
      }
      steps += 1
    }
    lastFoldSteps = steps
    val c2 = stateCache
    if (c2 == null || version > c2.version) stateCache = s
    s
  }

  def current: Snapshot = snapshot(currentVersion)

  def schema: StructType =
    org.apache.spark.sql.types.DataType.fromJson(current.schemaJson).asInstanceOf[StructType]

  def numBuckets: Int = current.numBuckets

  /** All base data files (absolute paths) of the current snapshot,
    * optionally restricted to a bucket subset — the bucket-pruning path.
    */
  def dataFiles(buckets: Option[Set[Int]] = None): Seq[String] =
    resolve(current.files, buckets)

  /** MOR delta files (absolute paths), optionally bucket-pruned. */
  def deltaFiles(buckets: Option[Set[Int]] = None): Seq[String] =
    resolve(current.deltas, buckets)

  /** Resolve a snapshot's table-relative file lists to absolute paths —
    * the pinned-snapshot variant of [[dataFiles]]/[[deltaFiles]], for
    * writers that must read base state and commit against the SAME
    * snapshot (CdcApply's COW race detection).
    */
  private[graft] def resolve(m: Map[Int, Seq[String]], buckets: Option[Set[Int]]): Seq[String] =
    m.toSeq
      .filter { case (b, _) => buckets.forall(_.contains(b)) }
      .flatMap(_._2)
      .map(rel => Paths.get(dir).resolve(rel).toString)

  /** Read the table's current STATE (or a bucket subset): base files with
    * the current table schema — older files missing later-added columns
    * surface them as nulls (ALTER-ADD semantics for free from the parquet
    * reader) — merged at read time with any outstanding MOR delta files
    * (see [[MorRead.merged]]; a no-op pass-through when there are none).
    */
  def read(spark: SparkSession, buckets: Option[Set[Int]] = None): DataFrame =
    readSnapshotState(spark, current, buckets)

  /** Time travel: the table STATE as of snapshot `version` (that commit's
    * base files merged with its then-outstanding deltas, under its schema
    * version) — Iceberg's `VERSION AS OF`. Valid while the snapshot
    * survives `expireSnapshots` (expiry deletes unreferenced files).
    */
  def readAt(spark: SparkSession, version: Long, buckets: Option[Set[Int]] = None): DataFrame =
    readSnapshotState(spark, snapshot(version), buckets)

  /** Incremental change feed: the net change rows committed in
    * `(fromVersion, toVersion]` — see [[ChangeFeed.read]]. O(changes in
    * range), never O(table); valid while the range's snapshots survive
    * expiry, like [[readAt]].
    */
  def readChanges(spark: SparkSession, fromVersion: Long, toVersion: Long = -1L): DataFrame =
    ChangeFeed.read(spark, this, fromVersion, toVersion)

  // ------------------------------------------------------------------
  // Named refs + rollback (B10)
  // ------------------------------------------------------------------

  private val refsDir = Paths.get(dir, "refs")

  /** Named refs: human-named pointers to snapshot versions — the
    * reproducibility primitive a training pipeline needs ("the exact
    * corpus run 17 trained on") and the anchor that stops
    * [[expireSnapshots]] from GC'ing a snapshot still referenced by
    * name. One tiny file per ref; re-tagging a name repoints it
    * (atomic replace, last writer wins — git-tag -f semantics).
    * Analogue: Iceberg table refs; the reference engine has no table
    * format, so no reference citation applies.
    */
  def tags: Map[String, Long] =
    if (!Files.isDirectory(refsDir)) Map.empty
    else listDir(refsDir)(_.filter(p => !p.getFileName.toString.startsWith(".")).toSeq)
      .flatMap { p =>
        scala.util.Try(p.getFileName.toString -> Files.readString(p).trim.toLong).toOption
      }.toMap

  /** Tag `version` (default: current) as `name`. Validates the snapshot
    * is readable before pointing at it. Returns the tagged version.
    *
    * Metadata-growth note: a long-lived tag pins the diff chain above
    * it (expiry keeps every v-file ≥ the oldest tag — one small diff
    * json per commit since the tag, data files shared, not duplicated).
    * Drop tags you no longer need; the next expiry reclaims the chain.
    */
  /** Validated ref file path. Leading '.' is rejected (not just '..'
    * traversal — dotfiles are the tmp-file namespace and are excluded
    * from the [[tags]] listing, so a dot-named ref would be unlistable).
    */
  private def refPath(name: String): Path = {
    require(name.nonEmpty && !name.startsWith(".") &&
      name.forall(c => c.isLetterOrDigit || "-_.".contains(c)),
      s"ref name '$name' must be [A-Za-z0-9_-][A-Za-z0-9._-]*")
    refsDir.resolve(name)
  }

  def tag(name: String, version: Long = -1L): Long = {
    val target = refPath(name)
    // Serialized against expireSnapshots (same JVM): expiry computes its
    // keep window from one read of the tag set, so a tag of an older
    // version racing it could land AFTER that read and point at a chain
    // the expiry is about to delete — violating the pinning contract.
    IceLite.refLock(dir).synchronized {
      val v = if (version < 0) currentVersion else version
      snapshot(v) // throws if the version never existed or is already expired
      Files.createDirectories(refsDir)
      // atomic REPLACE (not writeAtomically's put-if-absent): re-tagging
      // must repoint the name, and a reader never sees a partial file
      val tmp = refsDir.resolve(s".tmp-${UUID.randomUUID()}")
      Files.writeString(tmp, v.toString)
      Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // Cross-process best-effort: an expiry in ANOTHER process may have
      // read its tag set before our ref landed. Re-check the ON-DISK
      // marker now the ref is visible (snapshot() could answer from the
      // in-JVM memo and miss a foreign delete): an expiry that dropped v
      // removed its v-file and wrote no checkpoint at it. If it is gone,
      // un-publish and fail loudly instead of leaving a dangling ref.
      if (!Files.exists(vFile(v)) && !Files.exists(cFile(v))) {
        Files.deleteIfExists(target)
        throw new IllegalStateException(
          s"tag '$name': snapshot v$v was expired concurrently (ref rolled back)")
      }
      v
    }
  }

  /** Drop ref `name`; its snapshot becomes expirable again. */
  def dropTag(name: String): Boolean = Files.deleteIfExists(refPath(name))

  /** Time travel by name: [[readAt]] the version ref `name` points to. */
  def readAtTag(spark: SparkSession, name: String,
                buckets: Option[Set[Int]] = None): DataFrame =
    readAt(spark, tags.getOrElse(name,
      throw new NoSuchElementException(s"no ref '$name' on table $dir")), buckets)

  /** Roll the table's CURRENT state back to `toVersion`'s (bad-batch
    * recovery): commits a NEW snapshot carrying the target's exact
    * file/delta/schema/property state. History is preserved — the bad
    * versions stay time-travelable until expiry — and the operation
    * composes with concurrent writers through the normal commit CAS.
    * Copying the target's properties also rolls back the epoch
    * high-water bookkeeping, so a redelivery of a rolled-back epoch
    * APPLIES again instead of being skipped — exactly-once semantics
    * follow the state, not the wall clock. `lastDeltaSeq` is the
    * target's (its delta rows all carry seq ≤ it); the next MOR commit
    * stamps seq = version+1, which is strictly above any row in the
    * restored delta set.
    *
    * Feed contract: a rollback is NOT expressible as incremental change
    * rows (the reverted rows were never re-written) — [[readChanges]]
    * over a range containing one throws loudly, and feed consumers
    * (mirror, incremental views, SCD2) must re-bootstrap from a fresh
    * snapshot. The commit stamps its own `rollbackTo` metrics key so the
    * feed can tell it apart from the target's original commit kind.
    *
    * Streaming note: a Structured Streaming checkpoint is NOT rolled
    * back with the table — the source will not redeliver epochs its
    * checkpoint already committed. The restored epoch properties make a
    * REDELIVERED rolled-back epoch apply (not skip), so to re-ingest
    * the reverted range restart the stream from a fresh checkpoint (or
    * a new streamId, per the high-water WARN in CdcApply.lastEpoch).
    */
  def rollback(toVersion: Long): Snapshot = {
    // validate eagerly: commit's build callback may retry under CAS, and
    // the version check can only become MORE true as the parent advances
    require(toVersion >= 1 && toVersion <= currentVersion,
      s"rollback target v$toVersion is outside [1, v$currentVersion]")
    val target = snapshot(toVersion)
    commit { parent =>
      target.copy(
        properties = target.properties +
          ("rollback.to" -> toVersion.toString) +
          ("rollback.from" -> parent.version.toString),
        metrics = Map("rollbackTo" -> toVersion, "rollbackFrom" -> parent.version))
    }
  }

  /** Re-bucket the table: rewrite the CURRENT state (outstanding MOR
    * deltas folded in) into `newNumBuckets` hash buckets and commit the
    * new layout atomically — the operation a table needs when it has
    * outgrown its bucket count. Bucket count bounds write parallelism,
    * compaction granularity and point-read pruning fan-out, and the
    * day-one choice rarely survives a 100 TB growth curve. O(live
    * table) by nature, but a single exchange: one base∪delta read, one
    * rebalance onto the new bucket id, one sorted+bloomed zstd write.
    *
    * Consistency: numBuckets is PER SNAPSHOT, so time travel and bucket
    * pruning of old versions keep the old layout. State is unchanged —
    * the change feed treats the commit as state-preserving (like
    * compaction) and epoch bookkeeping carries over untouched. A
    * concurrent commit between the state read and the CAS aborts the
    * rebucket, deleting its staged rewrite (re-run it); conversely, a
    * CDC apply staged under the old layout is fenced by its own
    * numBuckets re-check and aborts rather than landing rows in wrong
    * buckets.
    */
  def rebucket(spark: SparkSession, newNumBuckets: Int): Snapshot = {
    import org.apache.spark.sql.functions.col
    require(newNumBuckets > 0, s"newNumBuckets must be positive, got $newNumBuckets")
    val cur = current
    if (newNumBuckets == cur.numBuckets) return cur
    val stage = newStageDir()
    readSnapshotState(spark, cur, None)
      .withColumn("bucket", IceLite.bucketOf(col("conv_id"), newNumBuckets))
      .hint("rebalance", "bucket")
      .sortWithinPartitions("bucket", "conv_id", "turn_idx")
      .write.mode("overwrite")
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#conv_id", "true")
      .partitionBy("bucket")
      .parquet(stage.toString)
    val staged = stagedFilesByBucket(stage)
    Option(IceLite.testOnRebucketStaged.getAndSet(null)).foreach(_.apply())
    try commit { parent =>
      if (parent.version != cur.version)
        throw new IllegalStateException(
          s"rebucket of $dir raced: rewrote v${cur.version} but v${parent.version} " +
            "committed meanwhile — re-run rebucket (staged files deleted)")
      parent.copy(
        numBuckets = newNumBuckets,
        files = staged,
        deltas = Map.empty,
        metrics = Map(
          "rebucketFrom" -> cur.numBuckets.toLong,
          "rebucketTo" -> newNumBuckets.toLong))
    } catch {
      case e: Throwable =>
        // the staged rewrite (a full table copy) is referenced by no
        // snapshot — delete it now; only removeOrphanFiles's grace-aged
        // sweep would ever collect it otherwise. Guarded: a throw AFTER
        // the durable CAS (e.g. an interrupt in post-commit bookkeeping)
        // must not delete files the committed snapshot references.
        if (!stageCommitted(staged.values.flatten.toSet)) dropStageDir(stage)
        throw e
    }
  }

  // ------------------------------------------------------------------
  // Write-audit-publish (B12)
  // ------------------------------------------------------------------

  private val auditsDir = Paths.get(dir, "audits")

  /** Validated audit-file path (same naming rules as refs; dotfiles are
    * the tmp namespace).
    */
  private def auditPath(name: String): Path = {
    require(name.nonEmpty && !name.startsWith(".") &&
      name.forall(c => c.isLetterOrDigit || "-_.".contains(c)),
      s"audit name '$name' must be [A-Za-z0-9_-][A-Za-z0-9._-]*")
    auditsDir.resolve(s"$name.json")
  }

  /** Unpublished audits: name → the parent version each was staged on.
    *
    * Write-audit-publish is the curation gate a training-data pipeline
    * runs before data goes live: apply a batch so its FULL would-be
    * snapshot is staged under a name (data files written, table pointer
    * untouched), run audit queries against [[readAudit]] (contamination,
    * dedup rates, PII scans — the q41/q30-class checks), then
    * [[publishAudit]] atomically or [[discardAudit]]. Iceberg's
    * WAP-branch pattern re-expressed on IceLite's snapshot log; the
    * reference's analogue is its per-put transaction boundary
    * (`.../sink/JdbcDbWriter.java:56,83`) — WAP widens that boundary to
    * "after a human/automated audit", which JDBC autocommit cannot.
    */
  def audits: Map[String, Long] =
    if (!Files.isDirectory(auditsDir)) Map.empty
    else listDir(auditsDir)(_.filter { p =>
      val n = p.getFileName.toString
      n.endsWith(".json") && !n.startsWith(".")
    }.toSeq).flatMap { p =>
      scala.util.Try(
        p.getFileName.toString.stripSuffix(".json") -> readSnapshot(p).parentVersion).toOption
    }.toMap

  /** Stage `build`'s result as the named UNPUBLISHED audit snapshot:
    * `build` sees the current snapshot as parent and its result is
    * written as a self-sufficient FULL snapshot json under `audits/` —
    * invisible to version listings, time travel, the change feed and
    * expiry. Re-staging a name replaces it (the previous stage's files
    * become crash-class orphans unless [[discardAudit]] ran first —
    * [[removeOrphanFiles]] collects them).
    * Expiry note: the audit shares its parent's data files; since
    * `keepLast >= 1` always keeps the current version and a publish is
    * only valid while the parent IS current, expiry cannot break a
    * still-publishable audit.
    */
  private[graft] def stageAudit(name: String, build: Snapshot => Snapshot): Snapshot = {
    val target = auditPath(name)
    val base = current
    val next0 = build(base).copy(version = base.version + 1, parentVersion = base.version)
    val next = next0.copy(
      files = next0.files.filter(_._2.nonEmpty),
      deltas = next0.deltas.filter(_._2.nonEmpty))
    Files.createDirectories(auditsDir)
    val tmp = auditsDir.resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.writeString(tmp, toJson(next))
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** The staged audit snapshot (metadata view). */
  def auditSnapshot(name: String): Snapshot = {
    val p = auditPath(name)
    if (!Files.exists(p)) throw new NoSuchElementException(s"no audit '$name' on table $dir")
    readSnapshot(p)
  }

  /** The audited WOULD-BE state — what [[read]] will return after
    * [[publishAudit]]. Bucket-prunable like any read; audit queries and
    * the whole query surface run against this frame unchanged.
    */
  def readAudit(spark: SparkSession, name: String,
                buckets: Option[Set[Int]] = None): DataFrame =
    readSnapshotState(spark, auditSnapshot(name), buckets)

  /** Atomically publish the audit: one CAS commit carrying the staged
    * snapshot's exact file/delta/schema/property state (epoch markers
    * land with it — a redelivery of the audited batch after publish is
    * the usual no-op). Fails LOUDLY if any commit landed since the stage
    * (the audited state no longer describes current+batch): discard and
    * re-stage — same contract as the rebucket/COW fences.
    */
  def publishAudit(name: String): Snapshot = {
    val a = auditSnapshot(name)
    val snap = commit { parent =>
      if (parent.version != a.parentVersion)
        throw new IllegalStateException(
          s"audit '$name' was staged against v${a.parentVersion} but $dir is now at " +
            s"v${parent.version} — discardAudit and re-stage the batch")
      a
    }
    Files.deleteIfExists(auditPath(name))
    snap
  }

  /** Drop the audit and delete the data files that belong to IT alone
    * (everything its snapshot references that its parent does not). If
    * the parent has already been expired the files are left on disk —
    * the crash-orphan class, collected by [[removeOrphanFiles]] — rather
    * than risking a wrong delete here.
    */
  def discardAudit(name: String): Boolean = {
    val p = auditPath(name)
    if (!Files.exists(p)) return false
    val a = readSnapshot(p)
    Files.deleteIfExists(p)
    val own = (a.files.values.flatten ++ a.deltas.values.flatten).toSet
    scala.util.Try(snapshot(a.parentVersion)).toOption.foreach { par =>
      val parentRefs = (par.files.values.flatten ++ par.deltas.values.flatten).toSet
      (own -- parentRefs).foreach(rel => Files.deleteIfExists(Paths.get(dir).resolve(rel)))
    }
    true
  }

  private def readSnapshotState(
      spark: SparkSession, s: Snapshot, buckets: Option[Set[Int]]): DataFrame = {
    val sch = schemaOf(s)
    val files = resolve(s.files, buckets)
    val base =
      if (files.isEmpty) spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), sch)
      else spark.read.schema(sch).parquet(files: _*)
    val deltaPaths = resolve(s.deltas, buckets)
    if (deltaPaths.isEmpty) base
    else MorRead.merged(spark, sch, base, deltaPaths)
  }

  /** Base files only — MOR deltas NOT applied (compaction + COW internals). */
  def readBase(spark: SparkSession, buckets: Option[Set[Int]] = None): DataFrame = {
    val files = dataFiles(buckets)
    val sch = schema
    if (files.isEmpty) spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), sch)
    else spark.read.schema(sch).parquet(files: _*)
  }

  private def schemaOf(s: Snapshot): StructType =
    org.apache.spark.sql.types.DataType.fromJson(s.schemaJson).asInstanceOf[StructType]

  /** Fresh unique staging directory for one commit's data files. */
  def newStageDir(): Path = {
    val p = dataDir.resolve(UUID.randomUUID().toString)
    Files.createDirectories(p)
    p
  }

  /** Collect staged parquet files per bucket (written with
    * partitionBy("bucket") as b=N subdirs), as table-relative paths.
    */
  def stagedFilesByBucket(stage: Path): Map[Int, Seq[String]] =
    if (!Files.isDirectory(stage)) Map.empty
    else
      listDir(stage)(_.filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("bucket="))
        .map { bdir =>
          val b = bdir.getFileName.toString.stripPrefix("bucket=").toInt
          val fs = listDir(bdir)(_.filter(_.getFileName.toString.endsWith(".parquet"))
            .map(p => Paths.get(dir).relativize(p).toString)
            .toSeq).sorted
          b -> fs
        }
        .toMap)

  /** Expire snapshots older than the last `keepLast`, then delete data
    * files no longer referenced by any surviving snapshot (orphan GC —
    * Iceberg's expire_snapshots + remove_orphan_files). Returns
    * (snapshotsDeleted, dataFilesDeleted). Readers of surviving snapshots
    * are unaffected: expiry never touches referenced files.
    *
    * Crash-tolerant: a crash partway through a PREVIOUS expiry's v-file
    * deletes (after its boundary checkpoint landed) leaves orphan diff
    * v-files whose ancestor chain is gone. The fold therefore seeds from
    * the OLDEST state with a complete forward chain (a checkpoint at or
    * above `oldest surviving v - 1`, the empty parent when the chain
    * starts at v1, or an old-format full-snapshot v-file); v-files below
    * that seed are deleted WITHOUT orphan-ref collection — their data
    * refs are unknowable without the expired ancestors, so files only
    * they referenced stay on disk (same class as pre-publish crash
    * orphans; [[removeOrphanFiles]] collects both) rather than risking a
    * wrong delete.
    *
    * `keepLast` is clamped to >= 1: keeping zero snapshots would delete
    * every v-file and leave an unloadable table (checkpoints survive but
    * currentVersion would be 0).
    */
  def expireSnapshots(keepLast: Int = 2): (Int, Int) =
    // Holds the table's ref lock for the whole run: the keep window is
    // computed from ONE read of the tag set, so a concurrent in-process
    // tag() of an older version landing after that read would pin
    // nothing and be left pointing at the chain this run deletes.
    // Expiry is maintenance-cadence work (sub-second on the metadata
    // sizes it is budgeted for) — serializing rare tag() calls behind it
    // is the correct trade.
    IceLite.refLock(dir).synchronized { expireSnapshots0(keepLast) }

  private def expireSnapshots0(keepLast: Int): (Int, Int) = {
    val keepN = math.max(1, keepLast)
    def refs(s: Snapshot): Iterable[String] = s.files.values.flatten ++ s.deltas.values.flatten
    val versions = listSnapshotVersions
    if (versions.isEmpty) return (0, 0)
    // the contiguous suffix ending at the current version is the foldable
    // chain; anything below a gap is a crashed-expiry leftover
    val suffix = versions.foldLeft(List.empty[Long]) {
      case (prev :: rest, v) if v == prev + 1 => v :: prev :: rest
      case (_, v)                             => List(v)
    }.reverse
    // tagged versions are pinned: the keep window extends DOWN to the
    // oldest readable tagged version, keeping the contiguous diff chain
    // above it (the expiry boundary below gets a checkpoint, so the
    // tagged snapshot stays foldable forever). Tags pointing outside the
    // foldable suffix are already unreadable — they don't pin anything.
    val suffixSet = suffix.toSet
    val minTagged = tags.values.filter(suffixSet).reduceOption(_ min _)
    val cut = suffix.takeRight(keepN).head
    val keep = suffix.dropWhile(_ < math.min(cut, minTagged.getOrElse(cut)))
    val keepSet = keep.toSet
    val drop = versions.filterNot(keepSet)
    if (drop.isEmpty) return (0, 0)
    // fold seed: oldest checkpoint whose forward chain is complete; else
    // the empty parent (chain from v1); else an old-format full v-file
    val h = suffix.head
    val usableCks = listCheckpointVersions.filter(c => c >= h - 1 && c <= versions.last)
    var s: Snapshot =
      if (usableCks.nonEmpty) readCheckpoint(cFile(usableCks.min))
      else if (h == 1L) emptySnapshot
      else readDiffOrFull(vFile(h)) match {
        case Left(full) => full
        case Right(_) => throw new IllegalStateException(
          s"cannot expire $dir: oldest foldable v-file v$h is a diff and no checkpoint " +
            s"at or above v${h - 1} exists — corrupt table metadata")
      }
    // kept versions BELOW the fold seed are unreadable anyway (their
    // ancestor diffs are gone — a previous crash already orphaned them):
    // expire them too rather than keeping v-files that cannot be opened
    val keepLive = keep.filter(_ >= s.version)
    val dropAll = versions.filterNot(keepLive.toSet)
    val isDrop = dropAll.toSet
    val deadRefs = scala.collection.mutable.Set.empty[String]
    val liveRefs = scala.collection.mutable.Set.empty[String]
    var boundary: Snapshot = null
    def record(x: Snapshot): Unit = {
      (if (isDrop(x.version)) deadRefs else liveRefs) ++= refs(x)
      if (keepLive.headOption.contains(x.version)) boundary = x
    }
    record(s)
    suffix.filter(_ > s.version).foreach { v =>
      s = readDiffOrFull(vFile(v)) match {
        case Right(d)   => fold(s, d)
        case Left(full) => full
      }
      record(s)
    }
    // The oldest SURVIVING version must stay readable after its ancestor
    // diffs are gone: checkpoint it first, then drop diffs + checkpoints
    // below the boundary.
    if (boundary != null && !Files.exists(cFile(boundary.version)))
      writeAtomically(cFile(boundary.version), toJson(boundary))
    val dead = deadRefs.toSet -- liveRefs
    dead.foreach(rel => Files.deleteIfExists(Paths.get(dir).resolve(rel)))
    dropAll.foreach(v => Files.deleteIfExists(vFile(v)))
    keepLive.headOption.foreach { b => listCheckpointVersions.filter(_ < b).foreach(v => Files.deleteIfExists(cFile(v))) }
    // the memoized fold may reference an expired ancestor chain only via
    // values (immutable) — safe to keep; readers of kept versions fold
    // from the new boundary checkpoint.
    sweepEmptyCommitDirs()
    (dropAll.size, dead.size)
  }

  /** Remove commit dirs holding no data (all files deleted or never
    * committed); a dir with any non-empty bucket subdir survives.
    */
  private def sweepEmptyCommitDirs(): Unit =
    if (Files.isDirectory(dataDir))
      listDir(dataDir)(_.filter(Files.isDirectory(_)).toSeq).foreach { d =>
        val empty = !listDir(d)(_.exists(p =>
          Files.isDirectory(p) && listDir(p)(_.nonEmpty)))
        if (empty) {
          val w = Files.walk(d)
          try w.iterator.asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
          finally w.close()
        }
      }

  /** Delete a staging dir that will never be committed (raced or failed
    * writers). Never called on a dir whose files a snapshot references.
    * Best-effort: it runs inside catch blocks, and a cleanup failure must
    * never mask the original commit/race exception (leftovers fall to
    * [[removeOrphanFiles]]).
    */
  private def dropStageDir(stage: Path): Unit =
    try {
      if (Files.isDirectory(stage)) {
        val w = Files.walk(stage)
        try w.iterator.asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        finally w.close()
      }
    } catch {
      case scala.util.control.NonFatal(e) => System.err.println(
        s"[graft] WARN failed to drop stage dir $stage (removeOrphanFiles collects it): $e")
    }

  /** False only when the CURRENT snapshot verifiably references none of
    * `rels` — the guard a failed-commit cleanup needs: an exception can
    * escape commit() or its caller AFTER the CAS durably landed (e.g. an
    * interrupt), and deleting staged files the committed snapshot
    * references would lose data. Unknown (metadata unreadable) reads as
    * "committed": keep the files, let [[removeOrphanFiles]] decide later.
    */
  private def stageCommitted(rels: Set[String]): Boolean =
    scala.util.Try {
      val s = current
      (s.files.values.flatten ++ s.deltas.values.flatten).exists(rels)
    }.getOrElse(true)

  /** Delete data files referenced by NO reachable snapshot — Iceberg's
    * `remove_orphan_files`. [[expireSnapshots]]'s dead-ref collection only
    * sees files referenced by the snapshots it drops; files that never
    * made it into ANY commit — a writer that crashed between staging and
    * commit, a raced rebucket/compaction whose cleanup itself crashed, a
    * staged audit abandoned without [[discardAudit]] — are invisible to
    * it and accumulate forever. This is their collector.
    *
    * Live set = every file referenced by any READABLE version (walked
    * via the same checkpoint-seeded fold readers use, so versions kept
    * alive by an old checkpoint are protected), any checkpoint, and any
    * staged audit. A file outside that set is deleted only when older
    * than `graceMs` (modification time) — the grace window protects
    * files a CONCURRENT writer staged but has not committed yet, so the
    * default (24h, the usual Iceberg guidance) must exceed the longest
    * plausible staging job (a full-table rebucket included); pass 0 only
    * when no writer can be in flight, negative to disable (returns 0 —
    * the StreamConfig.orphanGraceMs contract). Metadata reads are STRICT:
    * any read failure outside the known below-a-crashed-expiry-gap
    * signals aborts the sweep loudly — a shrunken live set would turn
    * repairable metadata corruption into data deletion. Holds the
    * table's ref lock: a concurrent expiry rewrites the checkpoint seed
    * mid-walk otherwise.
    *
    * Scale: one driver-side walk of the data dir (O(live files) — bounded
    * by the compaction story) + one metadata-chain fold (O(retained
    * versions), same class as expiry). No Spark job.
    *
    * Returns the number of data files deleted.
    */
  def removeOrphanFiles(graceMs: Long = 86400000L): Int =
    IceLite.refLock(dir).synchronized {
      if (graceMs < 0) return 0 // disabled — matches StreamConfig.orphanGraceMs semantics
      if (!Files.isDirectory(dataDir)) return 0
      def refs(s: Snapshot): Iterable[String] = s.files.values.flatten ++ s.deltas.values.flatten
      val live = scala.collection.mutable.Set.empty[String]
      // METADATA READS ARE STRICT: a swallowed read failure here would
      // shrink the live set and turn repairable metadata corruption (a
      // bad checkpoint is re-derivable from an earlier one + diffs) into
      // data deletion — the sweep must abort loudly instead and retry a
      // later cadence. The ONLY tolerated failures are the two known
      // unreadable-by-design signals on versions BELOW a crashed-expiry
      // gap (no fold seed / expiry-raced missing file): those versions
      // are unreadable for every reader, so their refs are exactly the
      // orphan class this op collects.
      val versions = listSnapshotVersions
      val suffix = versions.foldLeft(List.empty[Long]) {
        case (prev :: rest, v) if v == prev + 1 => v :: prev :: rest
        case (_, v)                             => List(v)
      }.reverse.toSet
      versions.foreach { v =>
        if (suffix(v)) live ++= refs(snapshot(v)) // the readable-by-contract chain
        else try live ++= refs(snapshot(v)) catch {
          case _: IllegalStateException                 => // below the gap: no fold seed
          case e: Throwable if IceLite.missingFile(e)   => // expiry leftover raced away
        }
      }
      // checkpoint-only versions (their v-file expired but the checkpoint
      // still seeds reads) and staged audits are reachable too — strict;
      // note `audits` swallows read failures (a listing convenience), so
      // list the audit files directly here
      listCheckpointVersions.foreach(c => live ++= refs(readCheckpoint(cFile(c))))
      if (Files.isDirectory(auditsDir))
        listDir(auditsDir)(_.filter { p =>
          val n = p.getFileName.toString
          n.endsWith(".json") && !n.startsWith(".")
        }.toSeq).foreach(p => live ++= refs(readSnapshot(p)))
      val cutoff = System.currentTimeMillis() - graceMs
      var removed = 0
      // a concurrent writer renaming its temp files mid-walk surfaces as
      // a missing-file signal — skip that path (it is inside the grace
      // window by construction), never abort the maintenance op on it
      val files =
        try {
          val w = Files.walk(dataDir)
          try w.iterator.asScala.filter(Files.isRegularFile(_)).toSeq finally w.close()
        } catch { case e: Throwable if IceLite.missingFile(e) => Seq.empty[Path] }
      files.foreach { p =>
        val rel = Paths.get(dir).relativize(p).toString
        val name = p.getFileName.toString
        // a live file's checksum sibling (Hadoop local FS `.x.crc`) lives
        // with its owner
        val ownerLive = name.startsWith(".") && name.endsWith(".crc") &&
          live(Paths.get(dir).relativize(
            p.getParent.resolve(name.stripPrefix(".").stripSuffix(".crc"))).toString)
        val aged = scala.util.Try(Files.getLastModifiedTime(p).toMillis < cutoff)
          .getOrElse(false) // vanished mid-walk -> a writer owns it, skip
        if (!live(rel) && !ownerLive && aged) {
          Files.deleteIfExists(p)
          if (name.endsWith(".parquet")) removed += 1
        }
      }
      sweepEmptyCommitDirs()
      removed
    }

  /** Compact buckets that have accumulated more than `maxFilesPerBucket`
    * data files (append-mode fragmentation) into one sorted file each.
    * Returns the number of buckets compacted.
    *
    * Generational mode (`onlySmallerThan` < Long.MaxValue): only files
    * below the size threshold are folded — previously-compacted large
    * files are left in place untouched. An append-only event log adds
    * one-plus small files per bucket per epoch forever; whole-bucket
    * compaction re-reads O(history) each run, while the generational run
    * costs O(data appended since the last run) — the LSM size-tier
    * shape, amortized O(1) per epoch. The fold keeps per-bucket file
    * order (big survivors first, then the new merged file).
    */
  def compact(spark: SparkSession, maxFilesPerBucket: Int = 8,
              sortCols: Seq[String] = Seq("conv_id", "turn_idx"),
              onlySmallerThan: Long = Long.MaxValue): Int = {
    import org.apache.spark.sql.functions.col
    val cur = current
    def smallOf(fs: Seq[String]): Seq[String] =
      if (onlySmallerThan == Long.MaxValue) fs
      else fs.filter { rel =>
        val p = Paths.get(dir).resolve(rel)
        Files.exists(p) && Files.size(p) < onlySmallerThan
      }
    val targets: Map[Int, Seq[String]] = cur.files
      .map { case (b, fs) => b -> smallOf(fs) }
      .filter(_._2.size > maxFilesPerBucket)
    if (targets.isEmpty) return 0
    val stage = newStageDir()
    val sch = schema
    targets.foreach { case (b, small) =>
      val files = small.map(rel => Paths.get(dir).resolve(rel).toString)
      spark.read.schema(sch).parquet(files: _*)
        .coalesce(1)
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.mode("append")
        .option("compression", "zstd")
        .option("parquet.bloom.filter.enabled#conv_id", "true")
        .parquet(s"$stage/bucket=$b")
    }
    val staged = stagedFilesByBucket(stage)
    val snap =
      try commit { parent =>
        // replace a bucket only if no concurrent commit changed it since we
        // read `cur` — otherwise dropping the newer files would lose data
        val safe = staged.filter { case (b, _) => parent.files.get(b).contains(cur.files(b)) }
        parent.copy(
          files = parent.files ++ safe.map { case (b, merged) =>
            b -> ((cur.files(b).diff(targets(b))) ++ merged)
          },
          metrics = Map("bucketsCompacted" -> safe.size.toLong))
      } catch {
        case e: Throwable =>
          if (!stageCommitted(staged.values.flatten.toSet)) dropStageDir(stage)
          throw e
      }
    // the COMMITTED count — the race guard may have dropped buckets a
    // concurrent commit touched; their staged merge files are referenced
    // by no snapshot, so delete them now rather than leaving them to the
    // grace-aged removeOrphanFiles sweep
    dropUncommittedStaged(stage, staged, snap)
    snap.metrics("bucketsCompacted").toInt
  }

  /** Delete staged files the commit's race guard dropped (present in
    * `staged` but absent from the committed snapshot's file lists), then
    * tidy ONLY this stage dir (the global empty-dir sweep stays with
    * expiry/removeOrphanFiles — re-walking every historical commit dir
    * per compaction would be wasted IO on the maintenance cadence).
    */
  private def dropUncommittedStaged(
      stage: Path, staged: Map[Int, Seq[String]], snap: Snapshot): Unit = {
    val kept = (snap.files.values.flatten ++ snap.deltas.values.flatten).toSet
    staged.values.flatten.filterNot(kept).foreach { rel =>
      Files.deleteIfExists(Paths.get(dir).resolve(rel))
    }
    if (Files.isDirectory(stage)) {
      listDir(stage)(_.filter(Files.isDirectory(_)).toSeq)
        .foreach(bdir => if (listDir(bdir)(_.isEmpty)) Files.deleteIfExists(bdir))
      val anyData = listDir(stage)(_.exists(p =>
        Files.isDirectory(p) && listDir(p)(_.nonEmpty)))
      if (!anyData) dropStageDir(stage) // nothing committed into it
    }
  }

  /** Fold outstanding MOR delta files back into base files for buckets
    * holding more than `maxDeltasPerBucket` of them — the copy-on-write
    * moment, amortized (Iceberg's rewrite_data_files + delete-file
    * removal). Returns the number of buckets compacted.
    *
    * Bounded-work mode (`maxBuckets`): compact at most that many buckets
    * per call, most-backlogged first. Uniformly-filling buckets would
    * otherwise ALL cross the threshold at the same epoch and the ingest
    * path would pay one full-table rewrite inline (measured as a 7-9x
    * epoch stall); the budget caps each epoch's compaction work at a
    * fixed fraction while the backlog drains over the following epochs,
    * after which the drain schedule itself keeps bucket phases spread.
    * `stagger` additionally lowers each bucket's effective threshold by a
    * deterministic per-bucket offset in [0, stagger], de-synchronizing
    * the FIRST wave too.
    */
  def compactDeltas(
      spark: SparkSession,
      maxDeltasPerBucket: Int = 0,
      maxBuckets: Int = Int.MaxValue,
      stagger: Int = 0): Int = {
    import org.apache.spark.sql.functions.col
    val cur = current
    // stagger never halves a bucket's threshold (a small-threshold table
    // would otherwise degrade to compact-every-epoch for some buckets)
    val effStagger = math.min(stagger, maxDeltasPerBucket / 2)
    def thresholdFor(b: Int): Int =
      if (effStagger <= 0) maxDeltasPerBucket
      else maxDeltasPerBucket - ((b * 2654435761L) % (effStagger + 1)).toInt
    val targets = cur.deltas
      .filter { case (b, fs) => fs.size > thresholdFor(b) }
      .toSeq.sortBy { case (b, fs) => (-fs.size, b) }
      .take(math.max(0, maxBuckets))
      .map(_._1).toSet
    if (targets.isEmpty) return 0
    val sch = schemaOf(cur)
    val merged = MorRead.merged(spark, sch,
      readBase(spark, Some(targets)), resolve(cur.deltas, Some(targets)))
    val stage = newStageDir()
    merged
      .withColumn("bucket", IceLite.bucketOf(col("conv_id"), cur.numBuckets))
      .hint("rebalance", "bucket")
      .sortWithinPartitions("bucket", "conv_id", "turn_idx")
      .write.mode("overwrite")
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#conv_id", "true")
      .partitionBy("bucket")
      .parquet(stage.toString)
    val staged = stagedFilesByBucket(stage)
    Option(IceLite.testOnCompactStaged.getAndSet(null)).foreach(_.apply())
    val snap =
      try commit { parent =>
        // replace a bucket only if no concurrent commit changed it since we
        // read `cur` — otherwise we would drop newer base or delta files
        val safe = targets.filter { b =>
          parent.files.get(b) == cur.files.get(b) && parent.deltas.get(b) == cur.deltas.get(b)
        }
        parent.copy(
          files = (parent.files -- safe) ++ staged.filter(kv => safe(kv._1)),
          deltas = parent.deltas -- safe,
          metrics = Map("bucketsCompacted" -> safe.size.toLong))
      } catch {
        case e: Throwable =>
          if (!stageCommitted(staged.values.flatten.toSet)) dropStageDir(stage)
          throw e
      }
    // raced-out buckets' staged merges are referenced by no snapshot —
    // delete now instead of waiting for the grace-aged orphan sweep
    dropUncommittedStaged(stage, staged, snap)
    snap.metrics("bucketsCompacted").toInt
  }

  /** CAS commit: build the child snapshot from the freshly-read current
    * one, publish as version+1 via atomic create-if-absent. Retries on
    * losing a race (another writer published first).
    *
    * The published v-file is the DIFF against the parent — O(this
    * commit's changes). Every [[IceLite.CheckpointEvery]] commits a full
    * checkpoint is also written (best-effort: a crash before it costs
    * nothing — readers fold from the previous checkpoint).
    */
  def commit(build: Snapshot => Snapshot, maxRetries: Int = 5): Snapshot = {
    var attempt = 0
    while (true) {
      val parentV = currentVersion
      val parent = if (parentV == 0L) null else snapshot(parentV)
      val base = Option(parent).getOrElse(
        throw new IllegalStateException(s"table $dir has no snapshots — create() first"))
      val next0 = build(base).copy(version = parentV + 1, parentVersion = parentV)
      // normalize away empty bucket entries so the writer's in-memory view
      // is identical to what a reader reconstructs from the diff (fold
      // drops a bucket on `set: []`)
      val next = next0.copy(
        files = next0.files.filter(_._2.nonEmpty),
        deltas = next0.deltas.filter(_._2.nonEmpty))
      val target = vFile(next.version)
      val tmp = snapDir.resolve(s".tmp-${UUID.randomUUID()}.json")
      Files.writeString(tmp, diffJson(next, base))
      try {
        // link(2) is an atomic put-if-absent: fails iff target exists.
        // (rename(2)/ATOMIC_MOVE silently replaces on POSIX — not a CAS.)
        Files.createLink(target, tmp)
        // the commit is DURABLE from here — everything below is
        // best-effort bookkeeping and must not throw: a caller seeing
        // commit() fail may clean up its staged files, and a throw after
        // the link would make it delete files the committed snapshot
        // references (readers fold from the previous checkpoint either
        // way, per the scaladoc)
        try {
          Files.deleteIfExists(tmp)
          val c = stateCache
          if (c == null || next.version > c.version) stateCache = next
          if (next.version % CheckpointEvery == 0 && !Files.exists(cFile(next.version)))
            writeAtomically(cFile(next.version), toJson(next))
        } catch {
          case scala.util.control.NonFatal(e) => System.err.println(
            s"[graft] WARN post-commit bookkeeping on $dir v${next.version} failed " +
              s"(commit is durable; checkpoint deferred to a later commit): $e")
        }
        return next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          attempt += 1
          if (attempt > maxRetries)
            throw new IllegalStateException(s"commit contention on $dir after $maxRetries retries")
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object IceLite {

  /** True iff `e`'s cause chain carries a missing-file signal — the
    * concurrent-expiry race marker ([[IceLiteTable.snapshot]]'s retry and
    * [[MetaTables.snapshots]]'s drop-from-listing both key on it; any
    * OTHER failure, e.g. a corrupt v-file, must stay loud). The signal
    * may arrive wrapped (UncheckedIOException around a FileNotFound from
    * a stream), hence the bounded cause-chain walk.
    */
  private[graft] def missingFile(e: Throwable): Boolean = {
    var c = e; var depth = 0
    while (c != null && depth < 8) {
      if (c.isInstanceOf[java.nio.file.NoSuchFileException] ||
        c.isInstanceOf[java.io.FileNotFoundException]) return true
      c = c.getCause; depth += 1
    }
    false
  }

  /** JVM-wide ref/expiry mutual exclusion, keyed by canonical table dir
    * (IceLiteTable instances are cheap and callers create several per
    * dir — an instance-level lock would not serialize them). Closes the
    * tag-vs-expiry TOCTOU in-process: [[IceLiteTable.expireSnapshots]]
    * reads the tag set once to compute its keep window, so a tag of an
    * OLDER version landing between that read and the deletes would pin
    * nothing and point at a GC'd chain. Maintenance runs on an
    * in-process thread (CdcStream cadence), so the JVM-wide lock covers
    * the real deployment; cross-PROCESS expiry remains best-effort
    * (tag() re-validates after publishing the ref, shrinking that
    * window to the expiry's own delete loop).
    */
  private[table] def refLock(dir: String): Object =
    refLocks.computeIfAbsent(
      Paths.get(dir).toAbsolutePath.normalize.toString, _ => new Object)
  private val refLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Physical bucket of a conversation — the table's hash-distribution
    * layout (reference analogue: `PARTITION BY HASH` DDL,
    * `.../dialect/PostgreSqlDatabaseDialect.java:208-232`).
    */
  def bucketOf(convId: org.apache.spark.sql.Column, numBuckets: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    pmod(xxhash64(convId), lit(numBuckets.toLong)).cast("int")
  }

  /** One immutable snapshot of the table. `files` maps bucket id to
    * table-relative parquet paths; `properties` is free-form commit
    * bookkeeping (exactly-once epochs, applied offset ranges);
    * `metrics` are per-commit counters (rows written/deleted, buckets
    * rewritten) — the engine's lineage/metrics surface.
    *
    * `deltas` (merge-on-read) maps bucket id to net-action delta files
    * (Iceberg's equality-delete/MOR analogue): each MOR commit appends
    * O(changes) delta files instead of rewriting bucket state; readers
    * fold base ∪ deltas (see [[MorRead]]); compaction folds them back
    * into plain base files. Every row in a delta file carries the commit
    * sequence number `seq` (== the snapshot version that added it);
    * `lastDeltaSeq` is the high-water mark, enforced monotonic at commit
    * (a racing MOR commit with a stale seq fails the check and is
    * re-staged under a fresh seq by CdcApply's bounded retry).
    */
  final case class Snapshot(
      version: Long,
      parentVersion: Long,
      schemaJson: String,
      numBuckets: Int,
      files: Map[Int, Seq[String]],
      properties: Map[String, String],
      metrics: Map[String, Long],
      deltas: Map[Int, Seq[String]] = Map.empty,
      lastDeltaSeq: Long = 0L)

  /** Cadence of full-state checkpoint files. Between checkpoints each
    * commit stores only its diff, so a cold open folds at most this many
    * diffs; a warm (memoized) reader folds exactly one per commit.
    */
  val CheckpointEvery: Int = 32

  /** Test seam: runs once between rebucket's staging write and its commit
    * attempt — lets a spec deterministically land a concurrent commit in
    * the window the rebucket CAS guard exists for.
    */
  private[graft] val testOnRebucketStaged =
    new java.util.concurrent.atomic.AtomicReference[() => Unit]()

  /** Test seam: runs once between compactDeltas' staging write and its
    * commit attempt — lets a spec deterministically race a bucket out of
    * the compaction's safe set.
    */
  private[graft] val testOnCompactStaged =
    new java.util.concurrent.atomic.AtomicReference[() => Unit]()

  private val mapper = new ObjectMapper()

  /** Per-bucket file-list change: `set` replaces the bucket's list (empty
    * = remove the bucket), `add` appends. Exactly one is used per entry.
    */
  private[table] final case class BucketOp(set: Option[Seq[String]], add: Seq[String])

  /** The on-disk v-file payload: everything of a [[Snapshot]] except that
    * the (unboundedly growing) per-bucket file lists are stored as diffs
    * against the parent version.
    */
  private[table] final case class SnapshotDiff(
      version: Long,
      parentVersion: Long,
      schemaJson: String,
      numBuckets: Int,
      filesOps: Map[Int, BucketOp],
      deltasOps: Map[Int, BucketOp],
      properties: Map[String, String],
      metrics: Map[String, Long],
      lastDeltaSeq: Long)

  private def mapOps(parent: Map[Int, Seq[String]], child: Map[Int, Seq[String]]): Map[Int, BucketOp] =
    (parent.keySet ++ child.keySet).iterator.flatMap { b =>
      (parent.get(b), child.get(b)) match {
        case (p, c) if p == c => None
        case (Some(p), Some(c)) if c.size > p.size && c.startsWith(p) =>
          Some(b -> BucketOp(None, c.drop(p.size)))
        case (_, Some(c)) => Some(b -> BucketOp(Some(c), Nil))
        case (_, None)    => Some(b -> BucketOp(Some(Nil), Nil))
      }
    }.toMap

  private def applyOps(parent: Map[Int, Seq[String]], ops: Map[Int, BucketOp]): Map[Int, Seq[String]] =
    ops.foldLeft(parent) { case (m, (b, op)) =>
      op.set match {
        case Some(s) if s.isEmpty => m - b
        case Some(s)              => m.updated(b, s)
        case None                 => m.updated(b, m.getOrElse(b, Seq.empty) ++ op.add)
      }
    }

  private[table] def fold(parent: Snapshot, d: SnapshotDiff): Snapshot = {
    require(d.parentVersion == parent.version,
      s"diff v${d.version} folds onto v${d.parentVersion}, not v${parent.version}")
    Snapshot(
      version = d.version,
      parentVersion = d.parentVersion,
      schemaJson = d.schemaJson,
      numBuckets = d.numBuckets,
      files = applyOps(parent.files, d.filesOps),
      properties = d.properties,
      metrics = d.metrics,
      deltas = applyOps(parent.deltas, d.deltasOps),
      lastDeltaSeq = d.lastDeltaSeq)
  }

  private[table] def diffJson(child: Snapshot, parent: Snapshot): String = {
    val root = mapper.createObjectNode()
    root.put("version", child.version)
    root.put("parentVersion", child.parentVersion)
    root.put("schemaJson", child.schemaJson)
    root.put("numBuckets", child.numBuckets)
    root.put("lastDeltaSeq", child.lastDeltaSeq)
    def putOps(name: String, ops: Map[Int, BucketOp]): Unit = {
      val node = root.putObject(name)
      ops.toSeq.sortBy(_._1).foreach { case (b, op) =>
        val o = node.putObject(b.toString)
        op.set match {
          case Some(s) => val arr = o.putArray("set"); s.foreach(arr.add)
          case None    => val arr = o.putArray("add"); op.add.foreach(arr.add)
        }
      }
    }
    putOps("filesOps", mapOps(parent.files, child.files))
    putOps("deltasOps", mapOps(parent.deltas, child.deltas))
    val props = root.putObject("properties")
    child.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    val mets = root.putObject("metrics")
    child.metrics.toSeq.sortBy(_._1).foreach { case (k, v) => mets.put(k, v) }
    root.toPrettyString
  }

  private[table] def readDiff(path: Path): SnapshotDiff = {
    val root = mapper.readTree(Files.readString(path))
    def ops(name: String): Map[Int, BucketOp] = {
      val n = root.get(name).asInstanceOf[ObjectNode]
      n.fields().asScala.map { e =>
        val set = Option(e.getValue.get("set")).map(_.elements().asScala.map(_.asText()).toSeq)
        val add = Option(e.getValue.get("add")).map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
        e.getKey.toInt -> BucketOp(set, add)
      }.toMap
    }
    def strMap(name: String): Map[String, String] = {
      val n = root.get(name).asInstanceOf[ObjectNode]
      n.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }
    SnapshotDiff(
      version = root.get("version").asLong(),
      parentVersion = root.get("parentVersion").asLong(),
      schemaJson = root.get("schemaJson").asText(),
      numBuckets = root.get("numBuckets").asInt(),
      filesOps = ops("filesOps"),
      deltasOps = ops("deltasOps"),
      properties = strMap("properties"),
      metrics = {
        val n = root.get("metrics").asInstanceOf[ObjectNode]
        n.fields().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
      },
      lastDeltaSeq = root.get("lastDeltaSeq").asLong())
  }

  private[table] def readCheckpoint(path: Path): Snapshot = readSnapshot(path)

  /** The fold seed for a chain with no checkpoint: v1's diff is written
    * against this empty version-0 parent.
    */
  private[table] val emptySnapshot: Snapshot =
    Snapshot(0L, 0L, "", 0, Map.empty, Map.empty, Map.empty)

  /** Read a v-file as a diff, or — when it predates the diff format
    * (no `filesOps` key; pre-round-3 builds wrote full snapshots per
    * commit) — as the full snapshot it contains.
    */
  private[table] def readDiffOrFull(path: Path): Either[Snapshot, SnapshotDiff] = {
    val root = mapper.readTree(Files.readString(path))
    if (root.get("filesOps") != null) Right(readDiff(path)) else Left(readSnapshot(path))
  }

  private[table] def writeAtomically(target: Path, content: String): Unit = {
    val tmp = target.getParent.resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.writeString(tmp, content)
    try Files.createLink(target, tmp)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    finally Files.deleteIfExists(tmp)
  }

  /** Full-state (checkpoint) serialization. */
  def toJson(s: Snapshot): String = {
    val root = mapper.createObjectNode()
    root.put("version", s.version)
    root.put("parentVersion", s.parentVersion)
    root.put("schemaJson", s.schemaJson)
    root.put("numBuckets", s.numBuckets)
    val files = root.putObject("files")
    s.files.toSeq.sortBy(_._1).foreach { case (b, fs) =>
      val arr = files.putArray(b.toString)
      fs.foreach(arr.add)
    }
    val deltas = root.putObject("deltas")
    s.deltas.toSeq.sortBy(_._1).foreach { case (b, fs) =>
      val arr = deltas.putArray(b.toString)
      fs.foreach(arr.add)
    }
    root.put("lastDeltaSeq", s.lastDeltaSeq)
    val props = root.putObject("properties")
    s.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    val mets = root.putObject("metrics")
    s.metrics.toSeq.sortBy(_._1).foreach { case (k, v) => mets.put(k, v) }
    root.toPrettyString
  }

  def readSnapshot(path: Path): Snapshot = {
    val root = mapper.readTree(Files.readString(path))
    def objFields(name: String): Iterator[(String, com.fasterxml.jackson.databind.JsonNode)] = {
      val n = root.get(name).asInstanceOf[ObjectNode]
      n.fields().asScala.map(e => e.getKey -> e.getValue)
    }
    Snapshot(
      version = root.get("version").asLong(),
      parentVersion = root.get("parentVersion").asLong(),
      schemaJson = root.get("schemaJson").asText(),
      numBuckets = root.get("numBuckets").asInt(),
      files = objFields("files").map { case (k, v) =>
        k.toInt -> v.elements().asScala.map(_.asText()).toSeq
      }.toMap,
      properties = objFields("properties").map { case (k, v) => k -> v.asText() }.toMap,
      metrics = objFields("metrics").map { case (k, v) => k -> v.asLong() }.toMap,
      // absent in pre-MOR snapshots — default empty (backward-compatible)
      deltas =
        if (root.get("deltas") == null) Map.empty
        else objFields("deltas").map { case (k, v) =>
          k.toInt -> v.elements().asScala.map(_.asText()).toSeq
        }.toMap,
      lastDeltaSeq = Option(root.get("lastDeltaSeq")).map(_.asLong()).getOrElse(0L))
  }

  /** Create an empty table (snapshot v1, no files) with its base
    * checkpoint c1 (the fold anchor for every later diff).
    */
  def create(dir: String, schema: StructType, numBuckets: Int): IceLiteTable = {
    val snapDir = Paths.get(dir, "snap")
    Files.createDirectories(snapDir)
    Files.createDirectories(Paths.get(dir, "data"))
    val s = Snapshot(1L, 0L, schema.json, numBuckets, Map.empty, Map.empty, Map.empty)
    val empty = Snapshot(0L, 0L, s.schemaJson, numBuckets, Map.empty, Map.empty, Map.empty)
    val target = snapDir.resolve(f"v${1L}%010d.json")
    val tmp = snapDir.resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.writeString(tmp, diffJson(s, empty))
    Files.createLink(target, tmp)
    Files.deleteIfExists(tmp)
    writeAtomically(snapDir.resolve(f"c${1L}%010d.json"), toJson(s))
    new IceLiteTable(dir)
  }

  def load(dir: String): IceLiteTable = {
    val t = new IceLiteTable(dir)
    require(t.currentVersion > 0, s"no IceLite table at $dir")
    t
  }

  def exists(dir: String): Boolean =
    Files.isDirectory(Paths.get(dir, "snap")) && new IceLiteTable(dir).currentVersion > 0
}
