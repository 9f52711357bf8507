package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.table.SchemaEvolution

/** Pure property tests of the ALTER-ADD schema-evolution rules
  * (no SparkSession needed — StructType algebra only).
  */
class SchemaEvolutionSpec extends AnyFunSuite {

  private val nameGen = Gen.oneOf("a", "b", "c", "d", "e", "tool", "Text", "TS")
  private val typeGen: Gen[DataType] =
    Gen.oneOf(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType, StringType, TimestampType)
  private val fieldGen = for {
    n <- nameGen; t <- typeGen; nullable <- Gen.oneOf(true, true, true, false)
  } yield StructField(n, t, nullable)
  private val schemaGen: Gen[StructType] = Gen.listOfN(4, fieldGen)
    .map(fs => StructType(fs.groupBy(_.name.toLowerCase).map(_._2.head).toSeq))

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: $r")
  }

  test("merging a schema with itself is identity") {
    check("self-merge", Prop.forAll(schemaGen) { s =>
      SchemaEvolution.merge(s, s) == Right(s)
    })
  }

  test("merge is monotone: table fields are never dropped or reordered") {
    check("monotone", Prop.forAll(schemaGen, schemaGen) { (t, in) =>
      SchemaEvolution.merge(t, in) match {
        case Right(out) => out.fieldNames.toSeq.startsWith(t.fieldNames.toSeq)
        case Left(_)    => true
      }
    })
  }

  test("merge is idempotent: applying the same incoming schema twice changes nothing") {
    check("idempotent", Prop.forAll(schemaGen, schemaGen) { (t, in) =>
      SchemaEvolution.merge(t, in) match {
        case Right(once) => SchemaEvolution.merge(once, in) == Right(once)
        case Left(_)     => true
      }
    })
  }

  test("added fields are always nullable in the result") {
    check("nullable-adds", Prop.forAll(schemaGen, schemaGen) { (t, in) =>
      SchemaEvolution.merge(t, in) match {
        case Right(out) =>
          val existing = t.fieldNames.map(_.toLowerCase).toSet
          out.fields.filter(f => !existing.contains(f.name.toLowerCase)).forall(_.nullable)
        case Left(_) => true
      }
    })
  }

  test("numeric widening: int incoming over long table keeps long; reverse widens") {
    val tLong = StructType(Seq(StructField("x", LongType)))
    val tInt = StructType(Seq(StructField("x", IntegerType)))
    assert(SchemaEvolution.merge(tLong, tInt) == Right(tLong))
    assert(SchemaEvolution.merge(tInt, StructType(Seq(StructField("x", LongType)))).toOption.get
      .fields.head.dataType == LongType)
    assert(SchemaEvolution.merge(tInt, StructType(Seq(StructField("x", StringType)))).isLeft)
  }

  test("case-insensitive matching: Tool matches tool without adding a column") {
    val t = StructType(Seq(StructField("tool", StringType)))
    val in = StructType(Seq(StructField("Tool", StringType)))
    assert(SchemaEvolution.merge(t, in) == Right(t))
  }
}
