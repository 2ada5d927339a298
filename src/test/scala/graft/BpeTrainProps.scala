package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Differential properties of the iterative BPE trainer: for ANY small
  * word-frequency table, [[TrainQueries.trainMergeRounds]] (DataFrame
  * pair counts + argmax + the mergeApply fold) must agree merge-for-merge
  * and symbol-for-symbol with an independent in-memory reference trainer
  * (mutable maps, explicit left-to-right merge loop) — the two share no
  * code, so agreement pins the tie-break total order, the non-overlap
  * rule, and the round accounting at once.
  */
object BpeTrainProps extends Properties("BpeTrain") {
  lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val Rounds = 4

  // tight alphabet + short words → dense pair collisions, live tie-breaks
  private val ch = Gen.oneOf('a', 'b')
  private val word = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, ch))
    .map(_.mkString)
  private val corpus: Gen[Map[String, Long]] = Gen.choose(1, 8)
    .flatMap(k => Gen.listOfN(k, Gen.zip(word, Gen.choose(1L, 5L))))
    .map(_.groupBy(_._1).map { case (w, fs) => w -> fs.map(_._2).sum })

  /** Reference trainer: same contract, no Spark, no shared code. */
  private def refTrain(words: Map[String, Long], rounds: Int)
      : (Map[String, Vector[String]], Seq[(String, String, Long)]) = {
    var tbl: Map[String, (Long, Vector[String])] =
      words.map { case (w, f) => w -> (f, w.map(_.toString).toVector) }
    val merges = Seq.newBuilder[(String, String, Long)]
    def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { s =>
        if (out.nonEmpty && out.last == a && s == b) out(out.length - 1) = a + b
        else out += s
      }
      out.toVector
    }
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.values.foreach { case (f, syms) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq
          .minBy { case ((x, y), n) => (-n, x, y) }
        merges += ((a, b, c))
        tbl = tbl.map { case (w, (f, syms)) => w -> (f, applyMerge(syms, a, b)) }
      }
    }
    (tbl.map { case (w, (_, syms)) => w -> syms }, merges.result())
  }

  property("DataFrame trainer == in-memory reference (merges AND encodings)") =
    forAll(corpus) { words =>
      import spark.implicits._
      val wordsDf = words.toSeq.toDF("word", "freq")
      val (wf, merges) = TrainQueries.trainMergeRounds(wordsDf, Rounds)
      val gotSyms = wf.select($"word", $"syms")
        .as[(String, Seq[String])].collect().toMap
      wf.unpersist()
      val (wantSyms, wantMerges) = refTrain(words, Rounds)
      val mergesMatch =
        merges.map(m => (m.lhs, m.rhs, m.cnt)) == wantMerges
      val symsMatch = gotSyms.view.mapValues(_.toVector).toMap == wantSyms
      if (!mergesMatch || !symsMatch)
        println(s"corpus=$words\n got=$merges vs $wantMerges\n " +
          s"gotSyms=$gotSyms vs $wantSyms")
      mergesMatch && symsMatch
    }

  // arbitrary printable-ish strings, biased toward the characters the
  // pretokenizer treats specially (apostrophes, spaces, contraction
  // letters, punctuation)
  private val pretokText: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaLowerChar, 2 -> Gen.numChar, 2 -> Gen.const(' '),
    1 -> Gen.const('\''), 1 -> Gen.const('\n'), 1 -> Gen.const('\t'),
    // vertical tab (0x0B) is the Java-vs-RE2 whitespace divergence the
    // explicit class exists for: it must land in the punct class
    1 -> Gen.oneOf('\u000B', '\f', '\r'),
    1 -> Gen.oneOf('.', ',', '!', '-', '<', '|', '>'),
    1 -> Gen.oneOf('A', 'Z'), 1 -> Gen.oneOf('s', 't', 'm', 'd')
  )).map(_.mkString)

  property("pretokenizer is LOSSLESS: concat of pretokens == lower(text)") =
    forAll(pretokText) { text =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val row = Seq(Tuple1(text)).toDF("text")
        .select(
          array_join(graft.data.TextAnalysis.bpePretokens($"text"), "")
            .as("joined"),
          lower($"text").as("want"))
        .head()
      row.getString(0) == row.getString(1)
    }

  // arbitrary UNICODE strings — CJK, emoji (surrogate pairs), accents,
  // control bytes: the inputs a char-level alphabet mishandles and the
  // byte-level trainer exists for
  private val unicodeText: Gen[String] = Gen.listOf(Gen.frequency[String](
    4 -> Gen.alphaLowerChar.map(_.toString),
    2 -> Gen.const(" "),
    2 -> Gen.oneOf("\u00e9", "\u00fc", "\u00df", "\u00f1"),
    2 -> Gen.oneOf("\u4e2d", "\u6587", "\u65e5", "\u672c"),
    1 -> Gen.oneOf("\ud83d\ude00", "\ud83c\udf89"),
    1 -> Gen.oneOf("\u0000", "\u0007", "\u001b")
  )).map(_.mkString)

  property("byteSyms is LOSSLESS on arbitrary Unicode: every symbol is a " +
      "known atom and the inverse map recovers the exact UTF-8 bytes") =
    forAll(unicodeText) { text =>
      import spark.implicits._
      val T = graft.data.TextAnalysis
      val syms = Seq(Tuple1(text)).toDF("word")
        .select(T.byteSyms($"word").as("s")).as[Seq[String]].head()
      val inverse = T.ByteUnicode.zipWithIndex.toMap
      val allKnown = syms.forall(inverse.contains)
      val recovered = syms.map(inverse(_).toByte).toArray
      allKnown &&
        syms.length == text.getBytes("UTF-8").length &&
        java.util.Arrays.equals(recovered, text.getBytes("UTF-8"))
    }

  property("byte-level training on Unicode words equals the reference " +
      "trainer over byte-mapped symbols") =
    forAll(Gen.choose(1, 5).flatMap(k => Gen.listOfN(k,
        Gen.zip(unicodeText.suchThat(_.nonEmpty), Gen.choose(1L, 5L))))
      .map(_.groupBy(_._1).map { case (w, fs) => w -> fs.map(_._2).sum })) {
      words =>
        import spark.implicits._
        val T = graft.data.TextAnalysis
        val wordsDf = words.toSeq.toDF("word", "freq")
        val (wf, merges) =
          TrainQueries.trainMergeRounds(wordsDf, Rounds, split = T.byteSyms)
        val gotSyms = wf.select($"word", $"syms")
          .as[(String, Seq[String])].collect().toMap
        wf.unpersist()
        // reference: byte-map each word first, then the same refTrain
        // loop over pre-split symbols
        def byteMap(w: String): Vector[String] =
          w.getBytes("UTF-8").toVector.map(b => T.ByteUnicode(b & 0xFF))
        var tbl: Map[String, (Long, Vector[String])] =
          words.map { case (w, f) => w -> (f, byteMap(w)) }
        val wantMerges = Seq.newBuilder[(String, String, Long)]
        def applyMerge(syms: Vector[String], a: String, b: String) = {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { s =>
            if (out.nonEmpty && out.last == a && s == b)
              out(out.length - 1) = a + b
            else out += s
          }
          out.toVector
        }
        for (_ <- 1 to Rounds) {
          val counts =
            scala.collection.mutable.Map.empty[(String, String), Long]
          tbl.values.foreach { case (f, syms) =>
            syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
              counts(p) = counts.getOrElse(p, 0L) + f
            }
          }
          if (counts.nonEmpty) {
            val ((a, b), c) = counts.toSeq
              .minBy { case ((x, y), n) => (-n, x, y) }
            wantMerges += ((a, b, c))
            tbl = tbl.map { case (w, (f, s)) => w -> (f, applyMerge(s, a, b)) }
          }
        }
        merges.map(m => (m.lhs, m.rhs, m.cnt)) == wantMerges.result() &&
          gotSyms.view.mapValues(_.toVector).toMap ==
            tbl.map { case (w, (_, s)) => w -> s }
    }

  property("special token stays atomic through pretok training") =
    forAll(corpus) { words =>
      import spark.implicits._
      // splice the special token in as a pretoken of every-word frequency:
      // it must end training as ONE symbol, and no learned merge may
      // contain any fragment of it
      val special = TrainQueries.BpeSpecialToken
      // frequency far above anything the tiny corpus can produce: were
      // the special char-split, its internal pairs would win EVERY round
      val wordsDf = (words + (special -> 9999L)).toSeq.toDF("word", "freq")
      val (wf, merges) =
        TrainQueries.trainMergeRounds(wordsDf, Rounds, Seq(special))
      val specialSyms = wf.where($"word" === special)
        .select($"syms").as[Seq[String]].head()
      wf.unpersist()
      specialSyms == Seq(special) &&
        merges.forall(m => !m.lhs.contains("<") && !m.rhs.contains("<") &&
          !m.lhs.contains("|") && !m.rhs.contains("|"))
    }
}
