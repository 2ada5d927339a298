package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.BpeApply

/** Properties of the greedy subword encoder: for ANY word and ANY
  * vocabulary, the segmentation concatenates back to the word (lossless),
  * and each emitted unit is either a vocabulary token chosen
  * longest-first or a single-character fallback that no vocabulary token
  * could have covered. */
object BpeProps extends Properties("BpeApply") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val ch = Gen.oneOf('a', 'b', 'c')
  private val word = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, ch))
    .map(_.mkString)
  private val vocab = Gen.choose(0, 8).flatMap(k =>
    Gen.listOfN(k, Gen.choose(2, 4).flatMap(n => Gen.listOfN(n, ch))
      .map(_.mkString)))

  private def encode(w: String, v: Seq[String]): Seq[String] = {
    val e = BpeApply(Literal(UTF8String.fromString(w),
      org.apache.spark.sql.types.StringType), v)
    val out = e.encode(UTF8String.fromString(w))
    (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
  }

  property("segmentation is lossless: concat == word") =
    forAll(word, vocab) { (w, v) =>
      encode(w, v).mkString == w
    }

  property("every unit is a vocab token or an uncovered single char") =
    forAll(word, vocab) { (w, v) =>
      val vs = v.toSet
      val units = encode(w, v)
      units.forall(u => vs.contains(u) || u.length == 1)
    }

  property("greedy: no vocab token extends a chosen unit at its position") =
    forAll(word, vocab) { (w, v) =>
      val units = encode(w, v)
      val starts = units.scanLeft(0)(_ + _.length).init
      units.zip(starts).forall { case (u, pos) =>
        // no strictly-longer vocab token also matches here
        !v.exists(t => t.length > u.length && w.startsWith(t, pos))
      }
    }
}
