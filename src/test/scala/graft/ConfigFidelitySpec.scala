package graft

import org.apache.spark.sql.functions._

import graft.model.{Envelopes, MergeSpec}
import graft.operators.CdcApply
import graft.table.IceLite

/** Config-fidelity features mirrored from the reference connector:
  * ingest-time payload-field extraction (README.md:97-102) and primitive
  * record keys (FieldsMetadata.java:237-330).
  */
class ConfigFidelitySpec extends SparkSuite {
  import TestHelpers._

  test("ingest-time payload-field extraction: JSON paths become real table columns") {
    val dir = tmpDir("extract")
    val table = IceLite.create(s"$dir/t", turnSchema, 4)
    val evs = Seq(
      ins(0L, "c1", 0, """{"lang":"en","score":3,"note":"hi"}"""),
      ins(1L, "c1", 1, """{"lang":"no","score":7}"""),
      ins(2L, "c2", 0, "not json at all"),
      del(3L, "c2", Some(0)))
    val spec = MergeSpec(
      extractFields = Seq("lang" -> "$.lang", "score" -> "$.score"),
      extractSource = "text")
    CdcApply.applyBatch(spark, table, eventsDF(spark, evs).withColumnRenamed("schemaV", "schema_v"), spec)

    val schema = org.apache.spark.sql.types.DataType
      .fromJson(table.current.schemaJson).asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fieldNames.takeRight(2).toSeq == Seq("lang", "score"))

    val rows = table.read(spark)
      .select("conv_id", "turn_idx", "lang", "score")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(rows == Seq(
      ("c1", 0, "en", "3"),
      ("c1", 1, "no", "7")))
  }

  test("extraction composes with upsert: last value wins per key") {
    val dir = tmpDir("extract-upsert")
    val table = IceLite.create(s"$dir/t", turnSchema, 4)
    val spec = MergeSpec(extractFields = Seq("lang" -> "$.lang"))
    val b1 = Seq(ins(0L, "c1", 0, """{"lang":"en"}"""))
    val b2 = Seq(ups(1L, "c1", 0, """{"lang":"de"}"""))
    CdcApply.applyBatch(spark, table, eventsDF(spark, b1).withColumnRenamed("schemaV", "schema_v"), spec)
    CdcApply.applyBatch(spark, table, eventsDF(spark, b2).withColumnRenamed("schemaV", "schema_v"), spec)
    val langs = table.read(spark).select("lang").collect().map(_.getString(0)).toSeq
    assert(langs == Seq("de"))
  }

  test("primitive record key: key column maps to conv_id; tombstone is a series delete") {
    val dir = tmpDir("prim-key")
    val table = IceLite.create(s"$dir/t", turnSchema, 4)
    val evs = Seq(
      ins(0L, "cX", 0, "x0"), ins(1L, "cX", 1, "x1"),
      ins(2L, "cY", 0, "y0"),
      del(3L, "cX", None)) // primitive-key tombstone → series delete of cX
    // reshape to a primitive-key log: single `key` column, no explicit
    // conv_id/turn_idx envelope fields
    val primitiveLog = eventsDF(spark, evs)
      .withColumnRenamed("schemaV", "schema_v")
      .select(col("partition"), col("offset"), col("ts"), col("op"),
        col("conv_id").as("key"), col("after"), col("schema_v"))

    val env = Envelopes.fromPrimitiveKey(primitiveLog)
    CdcApply.applyBatch(spark, table, env)

    val got = readTable(spark, table).map(t => (t.conv_id, t.turn_idx, t.text))
    assert(got == Seq(("cY", 0, "y0")))
  }
}
