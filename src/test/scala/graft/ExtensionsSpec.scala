package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** `spark.sql.extensions` is a STATIC conf read at SparkContext creation,
  * so a config-injected session cannot be built inside the shared test JVM
  * (its context already exists). Covered here instead: the extensions
  * class wires cleanly, and vec_dot resolves from SQL text via the
  * runtime registration path.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("GraftExtensions applies its injections without error") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }

  test("media functions resolve from SQL text after runtime registration") {
    graft.functions.MediaFunctions.register(spark)
    val got = spark.sql(
      "SELECT media_decode(wav_encode(array(100, -200, 300), 8000)).sum_val " +
        "AS s, media_dhash(bmp_encode(array(1,2,3,4,5,6,7), 7)) AS h")
      .collect().head
    assert(got.getLong(0) == 200L)
    assert(!got.isNullAt(1))
  }

  test("vec_dot resolves from SQL text after runtime registration") {
    VectorFunctions.register(spark)
    val got = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(got == 11.0)
  }

  test("round-8 functions resolve from SQL; wrong arity raises the usage message") {
    VectorFunctions.register(spark)
    graft.functions.MediaFunctions.register(spark)
    val got = spark.sql(
      "SELECT vec_sqdist(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "media_decode(pgm_encode(array(9, 8, 7), 3)).format AS f, " +
        "size(media_reel_dhash(concat(bmp_encode(array(1,2,3,4,5,6,7), 7), " +
        "bmp_encode(array(7,6,5,4,3,2,1), 7)))) AS n")
      .collect().head
    assert(got.getDouble(0) == 8.0) // (1-3)^2 + (2-4)^2
    assert(got.getString(1) == "pgm")
    assert(got.getInt(2) == 2)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_sqdist(array(CAST(1.0 AS FLOAT))) AS d").collect()
    }
    assert(e.getMessage.contains("expected 2 arguments"), e.getMessage)
  }
}
