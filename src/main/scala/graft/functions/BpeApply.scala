package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization of one word against a FIXED
  * vocabulary — the "apply the tokenizer" step of a training pipeline
  * (the WordPiece/BPE-inference rule: at each position emit the longest
  * vocabulary token that prefixes the remainder, falling back to a
  * single character), compiled into one JVM loop per word.
  *
  * The vocabulary is a bounded model artifact (top-K corpus tokens)
  * carried as literals — the broadcast-weights-into-the-expression
  * pattern of [[HashedWeightSum]] and the k-means centroid folds: model
  * application costs one map-only scan, no join, no UDF. Deterministic
  * by construction: the longest matching prefix of a fixed string is
  * unique, and the single-char fallback consumes exactly one character.
  * Matching is CHARACTER-based (like SQL `substr`), so a SQL oracle
  * replays the exact same cuts.
  *
  * Per-word cost is O(len × |vocab with same first char|) via a
  * first-character index over the vocabulary.
  */
case class BpeApply(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  // vocabulary indexed by first char, longest-first in CODEPOINTS —
  // the oracle's `ORDER BY length(token) DESC` counts codepoints, and a
  // 2-codepoint/4-UTF-16-char supplementary-plane token must not outrank
  // a 3-codepoint/3-char one (ties at equal codepoint length are broken
  // lexicographically; two distinct tokens that both prefix one position
  // differ in length, so the tie-break never decides a match)
  @transient private lazy val byFirst: Map[Char, Array[String]] =
    vocab.filter(_.nonEmpty).distinct
      .groupBy(_.charAt(0))
      .map { case (c, ts) =>
        c -> ts.sortBy(t => (-t.codePointCount(0, t.length), t)).toArray
      }

  /** Greedy encode; called from both eval and generated code. */
  def encode(word: UTF8String): GenericArrayData = {
    val s = word.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < s.length) {
      val cands = byFirst.getOrElse(s.charAt(i), null)
      var matched: String = null
      if (cands != null) {
        var j = 0
        while (matched == null && j < cands.length) {
          if (s.startsWith(cands(j), i)) matched = cands(j)
          j += 1
        }
      }
      if (matched != null) {
        out += UTF8String.fromString(matched)
        i += matched.length
      } else {
        // fallback consumes one CODE POINT (SQL substr is code-point
        // based; splitting a surrogate pair would emit invalid strings
        // and diverge from the oracle). Vocab matches keep i on
        // code-point boundaries, since vocab fragments come from SQL
        // substrings and are themselves well-formed.
        val step = Character.charCount(s.codePointAt(i))
        out += UTF8String.fromString(s.substring(i, i + step))
        i += step
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this, classOf[BpeApply].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}
