package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with a typed metadata struct; decode/feature-extraction runs
  * per-partition over the bytes.
  *
  * The DECODE STEP IS A STUB: real image/audio codecs are not available in
  * this container, so [[decodeFeaturesStub]] derives a deterministic fake
  * feature vector from the leading payload bytes. Everything around it —
  * the binary column, metadata schema, typed Dataset hop, per-partition
  * batch shape, and fixed-width output schema — is the real plumbing a
  * production decode (JNI codec / ONNX runtime per partition) would use.
  */
object Multimodal {

  /** Payload + typed metadata. In production the payload would come off a
    * binary-file source (`spark.read.format("binaryFile")`) or a bytes
    * column in parquet; here text bytes stand in. */
  def packMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      col(textCol).cast("binary").as("payload"),
      struct(
        length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        when(col(idCol) % 3 === 0, "png")
          .when(col(idCol) % 3 === 1, "jpeg")
          .otherwise("wav").as("format"),
        (col(idCol) % 640).cast("int").as("width"),
        (col(idCol) % 480).cast("int").as("height")).as("meta"))

  val FeatureDim = 4

  /** STUB decode → fixed-width feature vector. Deterministic: feature i is
    * payload byte i scaled to [0,1) (0.0 past the end). Runs as a typed
    * per-partition map — the same execution shape as a real batched codec
    * call — and returns (id, f0..f3). */
  def decodeFeaturesStub(media: DataFrame, idCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col(idCol), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // One iterator pass per partition: a real decoder would batch
        // `bytes` through the codec here.
        it.map { case (id, bytes) =>
          val f = Array.tabulate(FeatureDim) { i =>
            if (bytes != null && i < bytes.length) (bytes(i) & 0xFF) / 255.0 else 0.0
          }
          (id, f(0), f(1), f(2), f(3))
        }
      }
    out.toDF(idCol, "f0", "f1", "f2", "f3")
  }

  /** Frame sampling analog: every `stride`-th byte of the payload as a
    * 1-byte "frame", capped at `maxFrames` — the partitioning/expression
    * shape of video frame extraction, minus the codec. */
  def sampleFrames(payload: Column, stride: Int, maxFrames: Int): Column = {
    val n = least(floor(length(payload) / stride), lit(maxFrames)).cast("int")
    when(n >= 1,
      transform(sequence(lit(0), n - 1), i => payload.substr(i * stride + 1, lit(1))))
      .otherwise(array().cast("array<binary>"))
  }
}
