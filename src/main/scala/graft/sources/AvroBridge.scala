package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file source/sink built directly on the BUNDLED avro +
  * avro-mapred jars (Spark's external `spark-avro` datasource module does
  * not ship in this image, and nothing else resolves offline) — the
  * production-shaped bridge for the remaining common row-major ingest
  * format after parquet/ORC/JSONL/CSV:
  *
  *  - [[write]] goes through `saveAsNewAPIHadoopFile` +
  *    [[AvroKeyOutputFormat]] — the schema ships in the job conf
  *    (`avro.schema.output.key`, parsed once per task from its JSON
  *    form; Avro `Schema` objects are not serializable), each task
  *    writes its own `part-r-*.avro` through the normal Hadoop output
  *    committer, so the sink is distributed, atomic-per-job and
  *    speculative-execution-safe on a real cluster, not a driver loop.
  *  - [[read]] goes through `newAPIHadoopFile` + [[AvroKeyInputFormat]]:
  *    files split and decode in parallel per block; records convert to
  *    [[Row]]s immediately inside the same map (Hadoop record readers
  *    REUSE the key object — referencing it past the iterator step is
  *    the classic corruption bug this bridge must not have).
  *
  * Type bridge (both directions): long/int/double/float/boolean/string/
  * binary, with Spark nullability mapping to `union(null, T)` — the
  * subset the roundtrip query exercises; extending it is adding a case
  * to each converter. Timestamps travel as formatted strings by caller
  * convention (same rule as the ORC roundtrip's dump: engines disagree
  * on dumped temporal physical types, not values).
  */
object AvroBridge {

  /** Avro record schema (JSON form) for a Spark struct type. */
  def avroSchemaJson(schema: StructType, recordName: String): String = {
    def fieldType(dt: DataType): String = dt match {
      case LongType => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case BooleanType => "\"boolean\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case other => throw new IllegalArgumentException(
        s"AvroBridge: unsupported column type $other")
    }
    // Avro names are constrained to [A-Za-z_][A-Za-z0-9_]* — enforce it
    // up front so a quote/backslash in a column name fails with a clear
    // error instead of emitting schema JSON Avro's parser rejects.
    def checkName(n: String): String = {
      // explicit ASCII ranges, not Character.isLetter: Avro names are
      // ASCII-only, and a Unicode-letter column like "café" must hit
      // THIS message, not Schema.Parser's raw exception downstream
      def alpha(c: Char) =
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_'
      def alnum(c: Char) = alpha(c) || (c >= '0' && c <= '9')
      require(n.nonEmpty && alpha(n.head) && n.forall(alnum),
        s"AvroBridge: '$n' is not a valid Avro name " +
          "([A-Za-z_][A-Za-z0-9_]*); alias the column before writing")
      n
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null", ${fieldType(f.dataType)}]"""
              else fieldType(f.dataType)
      s"""{"name": "${checkName(f.name)}", "type": $t${
        if (f.nullable) ", \"default\": null" else ""}}"""
    }
    s"""{"type": "record", "name": "${checkName(recordName)}",
       |"fields": [${fields.mkString(", ")}]}""".stripMargin
  }

  /** Write `df` as Avro container files under `path` (one file per
    * partition, Hadoop committer semantics). */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema, "graft_row")
    val conf = df.sparkSession.sessionState.newHadoopConf()
    conf.set("avro.schema.output.key", json)
    // mapreduce output dirs must not pre-exist; roundtrip scratch dirs are
    // process-unique (FormatQueries.tmp), so a leftover is a prior run's.
    // The recursive delete is destructive, so it only fires for paths
    // under the JVM scratch root — anywhere else the caller must hand us
    // a non-existent dir (Hadoop's committer then fails loudly instead of
    // this sink silently wiping a real dataset).
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    // Path-boundary-aware compare: "/tmpdata/gold" must NOT match a
    // "/tmp" scratch root, and the "file:"/"file://" URI spellings must
    // normalize to the same local path before comparing.
    val scratchRoot = System.getProperty("java.io.tmpdir").stripSuffix("/")
    val localPath = path.replaceFirst("^file:(//)?", "")
    if (localPath == scratchRoot || localPath.startsWith(scratchRoot + "/"))
      fs.delete(p, true)
    df.rdd.mapPartitions { rows =>
      // parse once per task, not per row
      val schema = new Schema.Parser().parse(json)
      rows.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < row.length) {
          rec.put(i, if (row.isNullAt(i)) null else row.get(i) match {
            case s: String => new org.apache.avro.util.Utf8(s)
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case v => v
          })
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], conf)
  }

  /** Read Avro container files under `path` into a DataFrame with the
    * given expected Spark schema (names resolve by position against the
    * writer schema — the bridge's files are its own). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val fields = schema.fields
    val rows = spark.sparkContext.newAPIHadoopFile(
        s"$path/part-*.avro",
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable], conf)
      .map { case (k, _) =>
        val rec = k.datum()
        val vals = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) {
          val v = rec.get(i)
          vals(i) = (v, fields(i).dataType) match {
            case (null, _) => null
            case (u: org.apache.avro.util.Utf8, StringType) => u.toString
            case (s: CharSequence, StringType) => s.toString
            case (b: java.nio.ByteBuffer, BinaryType) =>
              val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
            case (x, _) => x
          }
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    spark.createDataFrame(rows, schema)
  }
}
