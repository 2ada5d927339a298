package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based checks for the round-5 corpus primitives: the Morton
  * interleave is a bijection (so Z-ranges genuinely partition the plane),
  * and chunk-level dedup reassembly never invents or reorders content.
  */
object CorpusProps extends Properties("CorpusOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = Gen.choose(0L, 1023L)

  property("Morton interleave is bijective over 10-bit pairs") =
    forAll(dim, dim) { (a, b) =>
      val z = (0 until 10).map { i =>
        (((a >> i) & 1) << (2 * i + 1)) + (((b >> i) & 1) << (2 * i))
      }.sum
      val aBack = (0 until 10).map(i => ((z >> (2 * i + 1)) & 1) << i).sum
      val bBack = (0 until 10).map(i => ((z >> (2 * i)) & 1) << i).sum
      Prop(aBack == a && bBack == b && z >= 0 && z < (1 << 20)) :|
        s"z=$z decoded=($aBack,$bBack)"
    }

  private val words = Gen.listOfN(40, Gen.oneOf("u", "v", "w", "x", "y"))

  property("chunk dedup: kept text is the in-order concat of kept cells") =
    forAll(Gen.listOfN(4, words)) { docs =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val C = 16
      // mirror the operator: non-overlapping C-word cells, keeper = min
      // (doc_id, chunk_id) per distinct cell, reassemble in chunk order
      val cells = docs.zipWithIndex.flatMap { case (ws, d) =>
        ws.grouped(C).zipWithIndex.map { case (cell, c) =>
          (d.toLong, c.toLong, cell.mkString(" "))
        }
      }
      val keeper = cells.groupBy(_._3).map { case (txt, occ) =>
        txt -> occ.map(o => (o._1, o._2)).min
      }
      val expected = cells
        .filter(c => keeper(c._3) == ((c._1, c._2)))
        .groupBy(_._1).map { case (d, ks) =>
          d -> ks.sortBy(_._2).map(_._3).mkString(" ")
        }
      val got = graft.data.Dedup.chunkDedup(df, "doc_id", "text", C)
        .select($"doc_id", $"kept_text").as[(Long, String)]
        .collect().toMap
      Prop(docs.indices.forall { d =>
        got(d.toLong) == expected.getOrElse(d.toLong, "")
      }) :| s"got=$got expected=$expected"
    }
}
