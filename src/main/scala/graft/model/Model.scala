package graft.model

import java.sql.Timestamp

/** Core data model for the CDC / event-store engine.
  *
  * Mirrors the semantics (NOT the code) of the reference connector's
  * SinkRecord envelope (`/root/reference/src/main/java/io/confluent/connect/jdbc/sink/JdbcSinkTask.java:71-83`)
  * and its tombstone convention (`.../sink/BufferedRecords.java:93-100`):
  * a null value with a non-null key is a delete; otherwise the configured
  * insert mode decides insert/upsert/update.
  *
  * The target row shape is fixed by BASELINE.json `input_hint`:
  * transcripts(conv_id string, turn_idx int, role string, text string,
  * tool string, ts timestamp).
  */

/** One row of the target transcripts table. */
final case class TranscriptTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // nullable; also the schema-drift column (absent in v1 events)
    ts: Timestamp)

/** Event key. `turn_idx == null` on a tombstone means a SERIES delete:
  * all turns of the conversation (reference README.md:126-137 — delete
  * keys may be coarser than upsert keys).
  */
final case class TurnKey(conv_id: String, turn_idx: Option[Int])

/** A change event as it appears in the (Kafka stand-in) change log.
  *
  * - `partition`/`offset` are the log coordinates: offset is strictly
  *   increasing per partition and the replay-order authority (events are
  *   keyed by conv_id onto partitions, so per-key order holds within a
  *   partition — the Connect delivery contract).
  * - `op` ∈ insert | update | upsert | delete.
  * - `after == null` iff `op == delete` (tombstone).
  * - `schemaV` marks logical schema version (1 = no `tool` column).
  */
final case class ChangeEvent(
    partition: Int,
    offset: Long,
    ts: Timestamp,
    op: String,
    conv_id: String,
    turn_idx: Option[Int], // None only for series-delete tombstones
    after: Option[TranscriptTurn],
    schemaV: Int)

object Op {
  val Insert = "insert"
  val Update = "update"
  val Upsert = "upsert"
  val Delete = "delete"
  val all: Set[String] = Set(Insert, Update, Upsert, Delete)
}

/** One ingest-time extraction target: JSON `path` evaluated against the
  * payload column, landing as table column `name` typed `castTo` (Spark
  * DDL string; default "string"). Non-string types follow the reference's
  * sanctioned extract+Cast-SMT pattern (README.md:152-161): a record whose
  * raw extracted value is non-null but fails the cast is quarantined, not
  * silently nulled.
  */
final case class ExtractField(name: String, path: String, castTo: String = "string")

/** One named payload schema for multi-schema topics (reference
  * `value.converter.schema.names` + per-schema JSON match rules,
  * README.md:55-73): a record belongs to the FIRST configured schema whose
  * `matchPath` resolves non-null in its payload JSON, and that schema's
  * `extract` fields are applied to it. Records matching no schema are
  * quarantined (the reference throws a Connect exception; quarantine is
  * this engine's errant-record channel).
  */
final case class PayloadSchema(name: String, matchPath: String, extract: Seq[ExtractField])

/** Write-mode analogue of the reference's `insert.mode`
  * (`.../sink/JdbcSinkConfig.java:32-37`). In the engine the mode is
  * carried per-event in `op`, so `MergeSpec` only fixes the keys.
  *
  * @param upsertKeys key columns for insert/upsert/update matching
  *                   (reference `upsert.keys`; here (conv_id, turn_idx))
  * @param deleteKeys key columns for tombstone deletes — may be coarser
  *                   (reference `delete.keys`; here (conv_id) enables
  *                   series deletion)
  * @param numBuckets physical hash-bucket count of the table layout
  *                   (reference `partitions`, default 10,
  *                   `.../sink/JdbcSinkConfig.java:295-299`)
  * @param writeSalts skew strategy for the merge write. A hot conversation
  *                    (Zipf head) concentrates in one bucket and would make
  *                    that bucket a straggler writer task. 0 (default) =
  *                    AQE skew-aware rebalance: hot partitions split, small
  *                    ones coalesce, no extra files for cold buckets;
  *                    1 = one writer task per bucket (no skew handling);
  *                    k>1 = fixed salt fan-out (k files per bucket — only
  *                    for extreme known skew; costs small files)
  * @param deleteEnabled when false, tombstones are invalid input and are
  *                    quarantined (reference `delete.enabled` +
  *                    RecordValidator, `.../sink/RecordValidator.java:44-117`)
  * @param coordinates when true, the state table carries `_partition` and
  *                    `_offset` of each row's winning event (reference
  *                    `coordinates.enabled` kafka-coordinate columns,
  *                    `.../sink/JdbcSinkConfig.java:52-59`)
  */
final case class MergeSpec(
    upsertKeys: Seq[String] = Seq("conv_id", "turn_idx"),
    deleteKeys: Seq[String] = Seq("conv_id"),
    numBuckets: Int = 32,
    writeSalts: Int = 0,
    deleteEnabled: Boolean = true,
    /** Reference `auto.evolve` (`.../sink/JdbcSinkConfig.java:145-150`):
      * when false, a batch whose records would require an ALTER-ADD /
      * type-widen fails loudly instead of evolving the table — the
      * reference's DbStructure.amendIfNecessary throws rather than
      * amending. Type-compatibility violations reject either way.
      * DELIBERATE default divergence: the reference defaults auto.evolve
      * (and auto.create) to false; this engine defaults both to true for
      * back-compat with its own always-evolve behavior of earlier rounds
      * — the fail-loudly semantics when disabled are identical. */
    autoEvolve: Boolean = true,
    /** Reference `fields.whitelist`
      * (`.../sink/JdbcSinkConfig.java` fields.whitelist, applied in
      * `sink/metadata/FieldsMetadata.java:79-162`): when non-empty, only
      * these value fields of the after-struct land in the table. Key
      * columns ([[upsertKeys]] ∪ [[deleteKeys]]) always survive, as do
      * spec-referenced columns ([[extractSource]] while extraction or the
      * payload rename is configured) and extracted target columns (they
      * are explicit config). Applied at ingest BEFORE schema evolution,
      * so non-whitelisted drift columns never reach the table schema —
      * the PII-minimizing knob. Names not present in a batch are simply
      * inert (a whitelisted column may first appear via later drift). */
    fieldsWhitelist: Seq[String] = Nil,
    coordinates: Boolean = false,
    /** per-key fold plan: "window" (default) = single-sort window pass
      * (one exchange, ONE sort of the payload, row_number + full-frame
      * anchor max — netActionsViaWindow; measured −10/−22% fold-stage task
      * time and faster walls vs "agg" in interleaved 24M-event A/Bs,
      * r06); "agg" = single struct-valued aggregation (plans as
      * SortAggregate — struct buffers cannot hash-aggregate — so the
      * payload is sorted TWICE, map-side partial + reduce-side final, but
      * its map-side combine collapses duplicates pre-shuffle: prefer it
      * when re-delivery duplication is heavy, the same rule as
      * [[foldAlignment]]); "join" = all-primitive HashAggregate + one
      * deciding-row fetch join (payload never enters the agg shuffle, but
      * pays a second batch scan, a join and a distinct — measured slower;
      * kept as the escape hatch for payloads far wider than these) */
    foldStrategy: String = "window",
    /** which key the fold's payload exchange targets (MOR path only).
      *
      * "key" (default): the fold exchanges on the upsert key and the
      * delta write redistributes by bucket (AQE rebalance) — two payload
      * crossings, but every stage is narrow and AQE sizes the tasks.
      * Measured FASTER on a single socket: in interleaved same-window
      * A/Bs at local[32] "key" won every round (best 18.6s vs 35.9s for
      * "bucket" on the 24M-event replay; local[8] statistically even —
      * `BENCH/round4-runs.log`). The sandbox's shuffle is tmpfs (memcpy),
      * so eliminating an exchange buys ~nothing here, while the
      * bucket-pure alternative fuses exchange-read + sort + fold +
      * parquet encode into ≤numBuckets fat tasks whose stage tail
      * dominates once cores ≈ buckets/4.
      *
      * "bucket": the batch is exchanged once onto the table's bucket
      * key; the fold groups on (bucket, key) partition-locally and its
      * output is already laid out for the per-bucket delta write — ONE
      * payload crossing per epoch (PlanSpec pins the single-exchange
      * plan). The right alignment when shuffle crosses a real network
      * and numBuckets ≫ total cores (a 100 TB deployment: thousands of
      * buckets, each fold task still small): it halves cross-node
      * payload traffic per epoch.
      *
      * Applies to foldStrategy "window" and "agg" on the MOR path (both
      * accept the single bucket exchange — HashPartitioning(bucket)
      * satisfies the window's/agg's ClusteredDistribution); the "join"
      * fold always key-aligns (its shuffled fetch join re-exchanges on
      * the full join key regardless — see netActionsViaJoin). */
    foldAlignment: String = "key",
    /** how a batch's net actions reach the table.
      *
      * "cow" = copy-on-write: every affected bucket is rewritten per
      * batch. Reads are pure base-file scans, but write amplification is
      * O(table state) per batch once keys are spread across buckets —
      * the reference instead applies O(changes) row-level DML per batch
      * (`.../sink/BufferedRecords.java:294-336`).
      *
      * "mor" (default) = merge-on-read: the batch's net actions are
      * APPENDED as per-bucket delta files (O(changes) per commit, like
      * the reference) and folded into the base rows at read time; buckets
      * whose delta count crosses [[morCompactThreshold]] are compacted
      * back to plain base files (the copy-on-write moment, amortized).
      * This is Iceberg's equality-delete/merge-on-read shape. */
    mergeStrategy: String = "mor",
    /** MOR only: compact a bucket back to base files once it holds more
      * than this many delta files (bounds read-time merge work and makes
      * write amplification O(state/threshold) amortized, not O(state)). */
    morCompactThreshold: Int = 16,
    /** MOR only: compact at most this many buckets per epoch (most-
      * backlogged first). Uniformly-filling buckets all cross the
      * threshold at the same epoch; an unbudgeted compaction then
      * rewrites the whole table inline in the ingest path (measured 7-9x
      * epoch stall). 0 (default) = AUTO: ceil(numBuckets/threshold), the
      * steady-state sustainable rate — each epoch compacts ~1/threshold
      * of the table, the same amortized write amplification as bursty
      * whole-table compaction but spread evenly so no epoch stalls.
      * <0 = unbounded (strict counts<=threshold, bursty). */
    morCompactBudget: Int = 0,
    /** MOR only: de-synchronize the FIRST compaction wave by lowering
      * each bucket's effective threshold by a deterministic per-bucket
      * offset in [0, stagger] (0 = off). */
    morCompactStagger: Int = 4,
    /** Ingest-time payload-field extraction (reference README.md:97-102
      * "extracting schema fields": a JSON payload field is expanded into
      * named index columns at write time, not query time). Each
      * [[ExtractField]] is evaluated with `get_json_object` against
      * [[extractSource]], cast to its `castTo` type (cast failure ⇒
      * quarantine), and appended to the after-struct BEFORE schema
      * evolution, so extracted columns become real nullable table columns
      * (ALTER-ADD on first sight). Mutually exclusive with
      * [[payloadSchemas]]. */
    extractFields: Seq[ExtractField] = Nil,
    /** The payload column inside `after` that extraction paths are
      * evaluated against. */
    extractSource: String = "text",
    /** Target TABLE column name for the payload (reference
      * `value.converter.payload.field.name`, README.md:97-102: the event
      * payload lands in a configurable column). Empty (default) keeps the
      * event's own field name ([[extractSource]]); when set, the
      * [[extractSource]] field of the after-struct is RENAMED to this on
      * the state-merge path — extraction paths still read the event-side
      * name, the table carries the target name. */
    payloadTargetName: String = "",
    /** Multi-schema payload classification (reference
      * `value.converter.schema.names`, README.md:55-73): when non-empty,
      * each record is classified to the first schema whose matchPath is
      * present in its payload and gets THAT schema's extract columns; the
      * table carries the union of all schemas' extract columns (a record's
      * non-matching columns stay null). Unmatched records are quarantined.
      * Mutually exclusive with [[extractFields]]. */
    payloadSchemas: Seq[PayloadSchema] = Nil,
    /** Reference `value.converter.allownonindexed` (README.md:104-114):
      * when false (default, as in the reference), every payload schema
      * must extract the SAME target-column set, so each extracted column
      * is populated (indexable) for every schema; true permits per-schema
      * column sets. */
    allowNonIndexed: Boolean = false)

/** Per-turn net action produced by the in-batch fold (SURVEY.md §2.A
  * A5/A6): the single effect this batch has on one (conv_id, turn_idx)
  * key, replacing the reference's buffer/flush-ordering machinery
  * (`.../sink/BufferedRecords.java:84-234`) with an order-equivalent
  * declarative form.
  */
object NetAction {
  /** unconditional write (insert/upsert, or update on a row the batch itself created) */
  val Put = "put"
  /** unconditional delete */
  val Del = "del"
  /** update only if the key exists in the base table (reference UPDATE
    * mode: unmatched rows are dropped, `.../dialect/GenericDatabaseDialect.java:998-1019`) */
  val UpdateIfExists = "upd"
  /** series wipe marker (MOR delta files only): kills every row of the
    * conversation whose commit seq is LOWER than the wipe's; same-commit
    * actions already respect the wipe (netActions filters events at or
    * before it), so they carry the same seq and survive. */
  val Wipe = "wipe"
}
