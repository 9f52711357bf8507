package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, seeded change-event-log generator (the Kafka stand-in).
  *
  * Everything is a pure column expression over `spark.range(n)` — no UDFs,
  * no RNG state — so the same (seed, scale) always yields the same log,
  * event-by-event, at any parallelism. This is the engine's bench/test
  * input per BASELINE.json `input_hint` (transcript-shaped rows) and
  * FIXTURES.md §2 (envelope shape).
  *
  * Emits the full scenario mix of FIXTURES.md §3: hot-key skew, updates,
  * upserts, per-turn tombstones, series-delete tombstones (turn_idx null),
  * duplicate deliveries (same partition/offset re-emitted), and schema
  * drift (schema_v 1 rows carry no `tool` value).
  */
object ChangeLogGen {

  /** @param numEvents      base events (before duplicates)
    * @param numConvs       distinct conversations
    * @param maxTurns       turns per conversation (turn_idx in [0, maxTurns))
    * @param logPartitions  Kafka-stand-in partition count (conv-keyed)
    * @param seed           determinism root
    * @param hotMod         1/hotMod of events hit the single hot conv c0
    *                       (Zipf stand-in; 5 => 20% of all events)
    * @param dupFraction    extra duplicate deliveries, as fraction of base
    * @param driftAtFrac    offset fraction where schema v2 (tool column) starts
    * @param textRepeat     payload-size multiplier for the text column
    */
  final case class GenConfig(
      numEvents: Long = 100000L,
      numConvs: Int = 1000,
      maxTurns: Int = 50,
      logPartitions: Int = 8,
      seed: Long = 42L,
      hotMod: Int = 5,
      dupFraction: Double = 0.02,
      driftAtFrac: Double = 0.5,
      textRepeat: Int = 4)

  /** The change-event log as a DataFrame with columns
    * (partition int, offset long, ts timestamp, op string,
    *  conv_id string, turn_idx int?, after struct?, schema_v int).
    * Encodable as graft.model.ChangeEvent.
    */
  def events(spark: SparkSession, cfg: GenConfig): DataFrame = {
    val nDup = (cfg.numEvents * cfg.dupFraction).toLong
    // ids >= numEvents are duplicate deliveries of an earlier event.
    val base = spark
      .range(0, cfg.numEvents + nDup)
      .select(
        when(
          col("id") < cfg.numEvents, col("id")
        ).otherwise(pmod(xxhash64(col("id"), lit(cfg.seed + 7)), lit(cfg.numEvents)))
          .as("eid"))

    val h  = (salt: Long) => xxhash64(col("eid"), lit(cfg.seed + salt))
    val u  = (salt: Long) => pmod(h(salt), lit(1000000L)) // uniform in [0, 1e6)

    val convNum = when(pmod(h(1), lit(cfg.hotMod)) === 0, lit(0L))
      .otherwise(lit(1L) + pmod(h(2), lit((cfg.numConvs - 1).toLong)))
    val driftAt = (cfg.numEvents * cfg.driftAtFrac).toLong

    val withKey = base.select(
      col("eid").as("offset"),
      concat(lit("c"), lpad(convNum.cast("string"), 8, "0")).as("conv_id"),
      pmod(h(3), lit(cfg.maxTurns.toLong)).cast("int").as("turn_idx_raw"),
      // op mix: 62% insert, 15% update, 15% upsert, 7% turn-delete, 1% series-delete
      (u(4) / lit(10000L)).cast("int").as("pct"),
      (col("eid") >= driftAt).as("isV2"))

    val op = when(col("pct") < 62, lit("insert"))
      .when(col("pct") < 77, lit("update"))
      .when(col("pct") < 92, lit("upsert"))
      .otherwise(lit("delete"))
    val isSeriesDelete = col("pct") >= 99 // 1% of all events
    val turnIdx = when(isSeriesDelete, lit(null).cast("int")).otherwise(col("turn_idx_raw"))

    val role = element_at(
      array(lit("user"), lit("assistant"), lit("tool")),
      (pmod(xxhash64(col("conv_id"), col("turn_idx_raw"), lit(cfg.seed + 5)), lit(3)) + 1).cast("int"))
    val text = concat(
      lit("turn "), col("conv_id"), lit("/"), col("turn_idx_raw"),
      lit(" v"), col("offset"), lit(" "),
      repeat(concat(lit("payload-"), hex(xxhash64(col("offset"), lit(cfg.seed + 6))), lit(" ")), cfg.textRepeat))
    val tool = when(
      col("isV2") && role === "tool",
      concat(lit("tool_"), pmod(xxhash64(col("offset"), lit(cfg.seed + 8)), lit(12)).cast("string"))
    ).otherwise(lit(null).cast("string"))
    val ts = timestamp_seconds(lit(1700000000L) + col("offset"))

    withKey.select(
      pmod(xxhash64(col("conv_id"), lit(cfg.seed + 9)), lit(cfg.logPartitions.toLong)).cast("int").as("partition"),
      col("offset"),
      ts.as("ts"),
      op.as("op"),
      col("conv_id"),
      turnIdx.as("turn_idx"),
      when(
        op =!= "delete",
        struct(
          col("conv_id"),
          col("turn_idx_raw").as("turn_idx"),
          role.as("role"),
          text.as("text"),
          tool.as("tool"),
          ts.as("ts"))
      ).as("after"),
      when(col("isV2"), lit(2)).otherwise(lit(1)).as("schema_v"))
  }

  /** Persist the log as parquet under `dir`, laid out so the Structured
    * Streaming file source replays it: `chunk` splits the log into
    * offset-ordered slices (one streamed micro-batch granularity lever via
    * maxFilesPerTrigger). Files are sorted by (partition, offset) so
    * parquet min/max stats stay tight.
    */
  def writeLog(spark: SparkSession, cfg: GenConfig, dir: String, chunks: Int = 4): Unit = {
    val chunkSize = math.max(1L, (cfg.numEvents + (cfg.numEvents * cfg.dupFraction).toLong) / chunks + 1)
    // one file per (chunk, log partition): a batch scan gets logPartitions
    // parallel tasks — a single file per chunk would serialize the scan
    // and cap scaling at any core count (a Kafka topic has one stream per
    // partition for the same reason)
    events(spark, cfg)
      .withColumn("chunk", (col("offset") / chunkSize).cast("int"))
      .repartition(chunks * cfg.logPartitions, col("chunk"), col("partition"))
      .sortWithinPartitions("partition", "offset")
      .write
      .mode("overwrite")
      .partitionBy("chunk")
      .parquet(dir)
    // Spark's streaming file source admits files in modification-time
    // order; stagger mtimes by chunk so streamed delivery respects offset
    // order (the Kafka per-partition delivery contract this log stands in
    // for). Batch readers are unaffected.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    val base = java.nio.file.Files.getLastModifiedTime(root).toMillis
    java.nio.file.Files.list(root).iterator.asScala
      .filter(p => p.getFileName.toString.startsWith("chunk="))
      .foreach { cdir =>
        val c = cdir.getFileName.toString.stripPrefix("chunk=").toInt
        java.nio.file.Files.list(cdir).iterator.asScala.foreach { f =>
          java.nio.file.Files.setLastModifiedTime(
            f, java.nio.file.attribute.FileTime.fromMillis(base + c * 10000L))
        }
      }
  }
}
