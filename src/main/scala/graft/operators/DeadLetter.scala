package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.MergeSpec
import graft.table.IceLiteTable

/** Dead-letter replay (B14) — the operational loop the reference's
  * errant-record-reporter semantics leave open: the connector reports
  * errant records and advances past them
  * (`/root/reference/src/test/java/io/confluent/connect/jdbc/sink/JdbcSinkTaskTest.java:324-492`),
  * and someone must eventually fix and re-deliver them. [[CdcApply]]
  * quarantines such rows to `rejectedDir` with the full envelope, the
  * rejection reason (`_error`) and the epoch that rejected them
  * (`_rejected_at_epoch`); this operator re-ingests them through a
  * caller-supplied correction, exactly-once:
  *
  *  1. read the store, snapshot the consumed epoch partitions, and PIN
  *     the replay to exactly that set (the apply's scan is lazy — without
  *     the pin, a reject partition landing between planning and execution
  *     could be applied but not archived, and a later replay would apply
  *     it a second time);
  *  2. apply the caller's `fix` (it sees `_error`, so corrections can
  *     route on the rejection reason);
  *  3. re-apply through the NORMAL [[CdcApply.applyBatch]] under the
  *     replay's own (streamId, epochId) — full validation runs again and
  *     rows the fix did not heal are re-quarantined to a SEPARATE
  *     `requeueDir` (never the source dir: epoch-partition overwrite in a
  *     shared dir would let a replay epoch number collide with an ingest
  *     epoch's partition). The consumed-partition set rides the SAME
  *     atomic commit as a `dlq:<streamId>` snapshot property;
  *  4. archive (delete) the consumed source partitions — only AFTER the
  *     commit. A crash between commit and archive re-runs as the usual
  *     exactly-once skip, and the skip-path archive is restricted to the
  *     partition set RECORDED by the committed replay — never the store's
  *     current contents, which may hold NEW rejects that landed after the
  *     commit and were never applied (archiving those would lose them).
  *     A skip with no matching recorded set (a stale re-delivery of an
  *     older replay epoch) archives nothing, loudly.
  *
  * Convergence note: a redelivery of the ORIGINAL ingest epoch re-creates
  * its quarantine partition (quarantine-before-commit is idempotent per
  * epoch), after which re-running the replay under a fresh epoch heals it
  * again — both loops are idempotent, so any interleaving converges.
  * Even the read↔archive race with such a redelivery is benign: an
  * epoch's quarantine partition is a deterministic function of its batch
  * (same events ⇒ same rejects), so a partition re-created mid-replay
  * holds exactly the rows the replay just consumed and the archive
  * deletes nothing new.
  *
  * Scale: the store is rejection-sized (quarantines are the exception
  * path), the consumed-partition listing is O(epochs with rejects), and
  * the re-apply is a normal O(changes) batch.
  *
  * Payload-extraction pipelines: extraction rebuilds `after` with the
  * extract columns appended BEFORE validation, so their quarantined rows
  * carry those (null) fields inside `after`. The fix must project `after`
  * back to the source shape — otherwise the re-apply's extraction hits
  * its own collision guard ("extract column names collide") loudly,
  * never silently double-extracting. Pinned by DeadLetterSpec.
  */
object DeadLetter {

  /** The dead-letter store as a DataFrame: one row per quarantined event,
    * envelope columns plus `_error` and `_rejected_at_epoch`. Missing or
    * still-empty stores read as None rather than failing (a healthy
    * pipeline has no dead letters; a fully-archived store is an existing
    * dir with no parquet left, which fails schema inference). ONLY those
    * two signals map to None — a corrupt store must fail loudly, never
    * read as "no dead letters".
    */
  def read(spark: SparkSession, dir: String): Option[DataFrame] =
    if (!Files.isDirectory(Paths.get(dir))) None
    else try Some(spark.read.parquet(dir)) catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "UNABLE_TO_INFER_SCHEMA" => None
    }

  final case class ReplayResult(
      batch: Option[CdcApply.BatchResult],
      consumed: Long,
      requeued: Long,
      archivedPartitions: Int) {
    def healed: Long = batch.map(b => if (b.skipped) 0L else consumed - b.rejected).getOrElse(0L)
  }

  /** Re-ingest the dead-letter store at `dir` into `table` through `fix`.
    *
    * @param epoch      the replay's OWN (streamId, epochId) — use a
    *                   dedicated stream id (e.g. "dlq") so replay markers
    *                   never collide with the ingest stream's
    * @param requeueDir where rows the fix did not heal are re-quarantined
    *                   (defaults to `<dir>.requeue`)
    * @param archive    delete the consumed source partitions after the
    *                   commit (set false to keep an immutable audit copy)
    * @param fix        correction applied to the quarantined rows; sees
    *                   `_error` and `_rejected_at_epoch`, both dropped
    *                   before the re-apply
    */
  def replay(
      spark: SparkSession,
      table: IceLiteTable,
      dir: String,
      epoch: (String, Long),
      spec: MergeSpec = MergeSpec(),
      requeueDir: Option[String] = None,
      archive: Boolean = true)(fix: DataFrame => DataFrame): ReplayResult = {
    // Reject a misconfigured requeueDir BEFORE the empty-store early
    // returns: with the guard below them, requeue == source silently
    // succeeded while the store was empty and only started failing once
    // rejects appeared — configuration errors must surface on first use.
    // Containment is rejected in BOTH directions (not just equality): a
    // requeueDir nested inside the source store writes parquet that a
    // later read(dir) partition-discovers as dead-letter rows (or that
    // the archive step deletes on a name collision), the same
    // silent-loss class as equality.
    val requeue = requeueDir.getOrElse(s"$dir.requeue")
    locally {
      def real(p: String): java.nio.file.Path = {
        val abs = Paths.get(p).toAbsolutePath.normalize
        try abs.toRealPath() catch { case _: java.io.IOException => abs }
      }
      val (rq, sd) = (real(requeue), real(dir))
      require(!rq.startsWith(sd) && !sd.startsWith(rq),
        s"requeueDir must differ from (and not contain or nest inside) the " +
          s"dead-letter source dir ($dir): an epoch-number collision would " +
          "archive freshly-requeued rows (or re-consume them as rejects)")
    }
    val src0 = read(spark, dir) match {
      case None     => return ReplayResult(None, 0L, 0L, 0)
      case Some(df) => df
    }
    val consumedParts = src0.select(col("_rejected_at_epoch").cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted
    // Pin the replay to the snapshot of partitions taken above: every
    // later scan of `src` (the count, the apply) is lazy and would
    // otherwise pick up reject partitions landing mid-replay — rows the
    // commit would apply but the archive (keyed on consumedParts) would
    // leave behind, to be applied AGAIN by the next replay.
    val src = src0.where(col("_rejected_at_epoch").cast("long").isin(consumedParts: _*))
    val consumed = src.count()
    if (consumed == 0L) return ReplayResult(None, 0L, 0L, 0)

    val fixed = fix(src).drop("_error", "_rejected_at_epoch")
    // the consumed set rides the atomic commit: on a crash-and-rerun the
    // skip path below archives exactly what the committed replay read
    val marker = s"dlq:${epoch._1}"
    val res = CdcApply.applyBatch(spark, table, fixed, spec,
      epoch = Some(epoch), rejectedDir = Some(requeue),
      extraProps = Map(marker -> s"${epoch._2}=${consumedParts.mkString(",")}"))

    val archiveParts: Seq[Long] =
      if (!res.skipped) consumedParts.toSeq
      else table.current.properties.get(marker).map(_.split("=", 2)) match {
        case Some(Array(bid, parts)) if bid.toLong == epoch._2 =>
          // this exact replay epoch committed before a crash — finish its
          // archive, scoped to what THAT commit recorded as consumed
          if (parts.isEmpty) Seq.empty else parts.split(",").toSeq.map(_.toLong)
        case _ =>
          // stale re-delivery of an older replay epoch (or a pre-marker
          // commit): the store's current contents were never applied under
          // THIS epoch — archiving them would lose rows, so keep them all
          System.err.println(s"[graft] WARN dead-letter replay epoch ${epoch._2} for " +
            s"stream '${epoch._1}' was skipped with no matching consumed-partition " +
            "record — archiving nothing; re-run under a fresh epoch to heal the store.")
          Seq.empty
      }
    val archived =
      if (!archive) 0
      else archiveParts.count { v =>
        val p = Paths.get(dir).resolve(s"_rejected_at_epoch=$v")
        if (!Files.isDirectory(p)) false
        else {
          // children first (parquet part files), then the partition dir
          val s = Files.list(p)
          try s.forEach(f => Files.deleteIfExists(f)) finally s.close()
          Files.deleteIfExists(p)
        }
      }
    ReplayResult(Some(res), consumed, res.rejected, archived)
  }
}
