package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's Tableau-grade CSV I/O contract (S4/S5/S6/S7):
  * tab-delimited, QUOTE_ALL, UTF-8 with BOM, nulls as empty-quoted fields,
  * timestamps `yyyy-MM-dd HH:mm:ssxx` (`%z` offset, no colon), `\n`
  * terminator, backslash escape (run_exports_query.py:75-89;
  * merge_all_lenders.py:34-49,63-77).
  */
object Csv {

  /** Write the reference per-lender/consolidated CSV shape. `singleFile`
    * mirrors the reference's one-file-per-output contract (S7) via
    * coalesce(1); leave false to keep one file per partition at scale.
    * Spark cannot emit a BOM natively, so [[prependBom]] runs as a
    * post-pass over the part files (driver-side, via Hadoop FileSystem, so
    * it works on distributed filesystems too).
    */
  def writeTabCsv(df: DataFrame, path: String, singleFile: Boolean = false,
                  bom: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write
      .option("sep", "\t")
      .option("header", true)
      .option("quoteAll", true)
      .option("nullValue", "")
      .option("emptyValue", "\"\"")
      .option("escape", "\\")
      .option("lineSep", "\n")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ssxx")
      // NTZ columns (parquet timestamps without UTC adjustment) take the
      // same human shape minus the meaningless offset.
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
      .mode("overwrite")
      .csv(path)
    if (bom) prependBom(df.sparkSession, path)
  }

  private val Bom: Array[Byte] = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)

  /** Prepend the UTF-8 BOM to every part file under `path`. */
  def prependBom(spark: SparkSession, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).filter(_.getPath.getName.startsWith("part-")).foreach { st =>
      val src = st.getPath
      val tmp = new org.apache.hadoop.fs.Path(src.getParent, src.getName + ".bom")
      val in = fs.open(src)
      val outS = fs.create(tmp, true)
      try {
        outS.write(Bom)
        org.apache.hadoop.io.IOUtils.copyBytes(in, outS, 65536, false)
      } finally { in.close(); outS.close() }
      fs.delete(src, false)
      fs.rename(tmp, src)
    }
  }

  /** S6: read a glob of CSVs with an all-string schema (pandas
    * `dtype=str`): no inference, empty fields → null. */
  def readTabCsvAllString(spark: SparkSession, glob: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", true)
      .option("inferSchema", false)
      .option("escape", "\\")
      .csv(glob)

  /** S5: the reference's write-then-re-read validation — header equality
    * and first-row arity (run_exports_query.py:91-104). Returns the list of
    * problems, empty when valid. */
  def validateWritten(spark: SparkSession, path: String,
                      expectedColumns: Seq[String]): Seq[String] = {
    val back = readTabCsvAllString(spark, path)
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    if (back.columns.toSeq != expectedColumns)
      problems += s"header mismatch: ${back.columns.toSeq} != $expectedColumns"
    if (back.head(1).exists(_.length != expectedColumns.length))
      problems += "first-row arity mismatch"
    problems.toSeq
  }
}

/** O2: the merge job's union semantics (merge_all_lenders.py:55) — align by
  * column NAME, missing columns become null; positional `union` would
  * silently misalign drifted files. */
object UnionByName {
  def all(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
}
