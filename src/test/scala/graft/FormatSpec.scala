package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source-format coverage: JSONL ingest quarantine semantics and ORC
  * round-trip fidelity (the oracle checks losslessness; these lock the
  * error-path behavior and the explicit-schema contract).
  */
class FormatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("JSONL permissive read quarantines corrupt lines, keeps good rows") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fmt_spec/jsonl"
    Seq(
      """{"id": 1, "v": "a"}""",
      """{"id": 2, "v": "b"}""",
      """{"id": broken""").toDF("line")
      .coalesce(1).write.mode("overwrite").text(path)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val read = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    read.cache()
    assert(read.where($"_corrupt_record".isNotNull).count() == 1)
    val good = read.where($"_corrupt_record".isNull)
      .select($"id", $"v").orderBy("id").as[(Long, String)].collect().toSeq
    assert(good == Seq((1L, "a"), (2L, "b")))
    read.unpersist()
  }

  test("corrupt rows carry the raw line for the quarantine side-channel") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fmt_spec/raw"
    Seq("""{"id": 1}""", """garbage""").toDF("line")
      .coalesce(1).write.mode("overwrite").text(path)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("_corrupt_record", StringType)))
    val read = spark.read.schema(schema)
      .option("columnNameOfCorruptRecord", "_corrupt_record").json(path)
    read.cache()
    val raw = read.where($"_corrupt_record".isNotNull)
      .select($"_corrupt_record").as[String].collect().toSeq
    assert(raw == Seq("garbage"), "quarantine must preserve the raw line")
    read.unpersist()
  }

  test("ORC round-trip preserves types bit-exactly") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fmt_spec/orc"
    val src = Seq((1L, 2, 3.5, "x"), (4L, 5, 6.25, "y"))
      .toDF("a", "b", "c", "d")
    src.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    // read-back schema is nullable-relaxed; names and types must hold
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("a").collect().toSeq ==
      src.orderBy("a").collect().toSeq)
  }

  test("Avro bridge round-trips every supported type incl. nulls and binary") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fmt_spec/avro"
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("f", FloatType, nullable = true),
      StructField("b", BooleanType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("bin", BinaryType, nullable = true)))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, 7, 2.5, 1.5f, true, "hej", Array[Byte](1, 2, 3)),
      org.apache.spark.sql.Row(2L, null, null, null, null, null, null),
      org.apache.spark.sql.Row(3L, -1, -0.125, 0f, false, "", Array.empty[Byte]))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    graft.sources.AvroBridge.write(src, path)
    val back = graft.sources.AvroBridge.read(spark, path, schema)
      .orderBy("id").collect()
    assert(back.length == 3)
    val want = rows.sortBy(_.getLong(0))
    back.zip(want).foreach { case (g, w) =>
      (0 until schema.length).foreach { i =>
        (g.get(i), w.get(i)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b))
          case (a, b) => assert(a == b, s"col $i: $a != $b")
        }
      }
    }
    // unsupported column types must fail loudly at schema derivation
    intercept[IllegalArgumentException] {
      graft.sources.AvroBridge.avroSchemaJson(
        StructType(Seq(StructField("t", TimestampType))), "r")
    }
    // non-Avro column names must hit OUR message, not Schema.Parser's —
    // including Unicode letters (Character.isLetter would admit them)
    for (bad <- Seq("café", "日本", "with space", "a\"b", "9lead", ""))
      intercept[IllegalArgumentException] {
        graft.sources.AvroBridge.avroSchemaJson(
          StructType(Seq(StructField(bad, LongType))), "r")
      }
  }
}
