package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.data.Similarity
import graft.functions.VectorFunctions

/** The codegen'd FloatVecDot must be bit-identical to the composable
  * HOF left-fold form on arbitrary float vectors. */
class VectorExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vec_dot equals HOF aggregate-zip_with fold bit-for-bit (100 random pairs)") {
    VectorFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    def vec(n: Int) = List.fill(n)(rnd.nextFloat() * 4f - 2f)
    val pairs = (1 to 100).map { i => (vec(1 + i % 64), vec(1 + i % 64)) }
    val got = pairs.toDF("a", "b").select(
      VectorFunctions.vec_dot(col("a"), col("b")).as("fast"),
      Similarity.dot(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    got.foreach { case (fast, hof) =>
      assert(java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(hof), s"$fast != $hof")
    }
  }

  test("vec_dot null and empty semantics") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Some(List(1.0f, 2.0f)), Some(List(3.0f, 4.0f))),
      (None, Some(List(1.0f))),
      (Some(List.empty[Float]), Some(List.empty[Float]))
    ).toDF("a", "b")
    val got = df.select(VectorFunctions.vec_dot(col("a"), col("b")))
      .as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(11.0), None, Some(0.0)))
  }

  test("vec_sqdist equals HOF fold bit-for-bit, incl. float-vs-double sides") {
    VectorFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    def vec(n: Int) = List.fill(n)(rnd.nextFloat() * 4f - 2f)
    val pairs = (1 to 100).map { i => (vec(1 + i % 64), vec(1 + i % 64)) }
    val got = pairs.toDF("a", "b").select(
      VectorFunctions.vec_sqdist(col("a"), col("b")).as("fast"),
      Similarity.sqDist(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    got.foreach { case (fast, hof) =>
      assert(java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(hof), s"$fast != $hof")
    }
    // mixed element widths: float column vs double centroid literal —
    // the assignCellsBroadcast shape
    val cent = Seq(0.5, -1.25, 2.0)
    val mixed = pairs.map(_._1).filter(_.size >= 3).take(20).map(_.take(3))
      .toDF("a").select(
      VectorFunctions.vec_sqdist(col("a"),
        array(cent.map(lit): _*)).as("fast"),
      Similarity.sqDist(col("a"), array(cent.map(lit): _*)).as("hof"))
      .as[(Double, Double)].collect()
    mixed.foreach { case (fast, hof) =>
      assert(java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(hof), s"$fast != $hof")
    }
    // null propagation matches BinaryExpression null intolerance
    val nulls = Seq((Option.empty[List[Float]], Some(List(1.0f))))
      .toDF("a", "b")
      .select(VectorFunctions.vec_sqdist(col("a"), col("b")))
      .as[Option[Double]].collect().toSeq
    assert(nulls == Seq(None))
    // a NULL ELEMENT nulls the distance, like the HOF's zip_with
    // arithmetic (element-nullable schema - the parquet read shape)
    val elemNull = Seq(
      (List(Some(1.0f), None), List(Some(1.0f), Some(2.0f))),
      (List(Some(1.0f), Some(3.0f)), List(Some(1.0f), Some(2.0f))))
      .toDF("a", "b")
      .select(VectorFunctions.vec_sqdist(col("a"), col("b")).as("fast"),
        Similarity.sqDist(col("a"), col("b")).as("hof"))
      .as[(Option[Double], Option[Double])].collect().toSeq
    assert(elemNull == Seq((None, None), (Some(1.0), Some(1.0))))
  }

  test("arr_eq_count matches the zip_with/filter HOF on adversarial arrays") {
    graft.functions.ArrEqCountFunctions.register(spark)
    import graft.functions.ArrEqCountFunctions.arr_eq_count
    // length mismatches, null elements on either side, empty arrays,
    // full agreement, zero agreement
    val rows = Seq(
      (Seq[Option[String]](Some("a"), Some("b"), Some("c")),
        Seq[Option[String]](Some("a"), Some("x"), Some("c"))),
      (Seq[Option[String]](Some("a"), Some("b")),
        Seq[Option[String]](Some("a"), Some("b"), Some("c"))),
      (Seq[Option[String]](Some("a"), None, Some("c")),
        Seq[Option[String]](Some("a"), None, Some("c"))),
      (Seq[Option[String]](), Seq[Option[String]](Some("a"))),
      (Seq[Option[String]](Some("x")), Seq[Option[String]](Some("y"))),
      (Seq[Option[String]](Some("s"), Some("s")),
        Seq[Option[String]](Some("s"), Some("s"))))
      .toDF("a", "b")
    val got = rows.select(
        arr_eq_count(col("a"), col("b")).as("fast"),
        size(filter(zip_with(col("a"), col("b"), (x, y) => x === y),
          x => x)).cast("long").as("hof"))
      .as[(Long, Long)].collect().toSeq
    got.foreach { case (fast, hof) => assert(fast == hof, s"$fast != $hof") }
    assert(got.map(_._1) == Seq(2L, 2L, 2L, 0L, 0L, 2L))
    // null ARRAY propagates (BinaryExpression null intolerance)
    val n = Seq((Option.empty[Seq[String]], Some(Seq("a"))))
      .toDF("a", "b")
      .select(arr_eq_count(col("a"), col("b")))
      .as[Option[Long]].collect().toSeq
    assert(n == Seq(None))
  }
}
