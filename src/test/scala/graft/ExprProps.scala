package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.data.TextAnalysis

/** Property-based parity for the round-6 compiled expressions: whatever
  * the random input, [[graft.functions.NgramStats]] must agree with an
  * in-memory reference count, and [[graft.functions.WinnowSelect]] /
  * [[graft.functions.WinnowFingerprint]] must agree with the composable
  * HOF definitions. Small alphabets force heavy duplication and ties —
  * the cases where a wrong tie rule or an off-by-one window silently
  * diverges.
  */
object ExprProps extends Properties("Round6Exprs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tok = Gen.oneOf("a", "b", "c")
  private val doc = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tok))

  property("NgramStats equals an in-memory gram count for any doc") =
    forAll(doc, Gen.choose(1, 4)) { (ws, n) =>
      graft.functions.NgramFunctions.register(spark)
      import graft.functions.NgramFunctions.ngram_stats
      val got = Seq(Tuple1(ws)).toDF("toks")
        .select(ngram_stats($"toks", n).as("s"))
        .select($"s.total", $"s.dup", $"s.top")
        .as[(Long, Long, Long)].head()
      val grams = if (ws.length < n) Seq.empty
        else ws.sliding(n).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).values.map(_.size.toLong).toSeq
      val expected = (grams.size.toLong,
        counts.filter(_ >= 2).sum,
        if (counts.isEmpty) 0L else counts.max)
      Prop(got == expected) :| s"ws=$ws n=$n got=$got expected=$expected"
    }

  private val utfTok = Gen.oneOf("a", "bb", "ü", "日本", "x9")
  private val utfText = Gen.choose(0, 15)
    .flatMap(n => Gen.listOfN(n, utfTok)).map(_.mkString(" "))

  property("HashedWeightSum equals the HOF accumulation on any text") =
    forAll(utfText, Gen.oneOf(7, 64, 101)) { (text, buckets) =>
      val df = Seq(Tuple1(text)).toDF("text")
      def run(cols: Seq[(String, org.apache.spark.sql.Column)]) =
        df.select(cols.map { case (n, c) => c.as(n) }: _*)
          .select($"n_tokens", $"score_sum", $"score", $"label_positive")
          .as[(Long, Long, Double, Boolean)].head()
      val fast = run(TextAnalysis.linearScoreColumns($"text", buckets))
      val hof = run(TextAnalysis.linearScoreColumnsHof($"text", buckets))
      Prop(fast == hof) :| s"text='$text' buckets=$buckets fast=$fast hof=$hof"
    }

  // tiny hash alphabet -> constant ties inside windows
  private val hash = Gen.oneOf("0", "1", "2")
  private val hashes = Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, hash))

  property("WinnowSelect equals the HOF winnow for any hashes and window") =
    forAll(hashes, Gen.choose(1, 6)) { (hs, w) =>
      graft.functions.WinnowFunctions.register(spark)
      import graft.functions.WinnowFunctions.winnow_select
      val df = Seq(Tuple1(hs)).toDF("h")
      val fast = df.select(winnow_select($"h", w)).as[Seq[Long]].head()
      val hof = df.select(TextAnalysis.winnowPositions($"h", w))
        .as[Seq[Long]].head()
      Prop(fast == hof) :| s"hs=$hs w=$w fast=$fast hof=$hof"
    }

  property("WinnowFingerprint equals the composable md5+select+rollup") =
    forAll(doc.map(_.sliding(2).map(_.mkString(" ")).toSeq), Gen.choose(1, 5)) {
      (sh, w) =>
        graft.functions.WinnowFunctions.register(spark)
        import graft.functions.WinnowFunctions.winnow_fingerprint
        val df = Seq(Tuple1(sh)).toDF("sh")
        val fused = df.select(winnow_fingerprint($"sh", w).as("s"))
          .select($"s.n_grams", $"s.n_fingerprints", $"s.fp_md5")
          .as[(Long, Long, String)].head()
        val composed = df
          .select(transform($"sh", s => md5(s)).as("h"))
          .select($"h", TextAnalysis.winnowPositions($"h", w).as("sel"))
          .select(size($"h").cast("long"),
            size($"sel").cast("long"),
            md5(array_join(transform($"sel", p =>
              concat(p.cast("string"), lit(":"),
                element_at($"h", (p + 1).cast("int")))), ",")))
          .as[(Long, Long, String)].head()
        Prop(fused == composed) :| s"sh=$sh w=$w fused=$fused composed=$composed"
    }
}
