package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeOps

/** BPE training cross-checked against an INDEPENDENT single-threaded
  * implementation (the DtwAlign discipline for operators without a
  * SQL oracle): the distributed trainer's merge list must equal the
  * local reference's merge-for-merge on the same word counts. */
class BpeSpec extends AnyFunSuite {
  import TestSession._

  /** Plain-Scala reference BPE on a word-count map — no Spark, no
    * shared code with the operator beyond the segment definition. */
  private def localBpe(words: Map[String, Long],
      nMerges: Int): List[(String, String, Long)] = {
    var segs: Map[Vector[String], Long] =
      words.groupMapReduce(w => w._1.map(_.toString).toVector)(_._2)(_ + _)
    var out = List.empty[(String, String, Long)]
    var continue = true
    while (out.length < nMerges && continue) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out :+= (l, r, c)
        segs = segs.groupMapReduce { case (syms, _) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          b.result()
        }(_._2)(_ + _)
      }
    }
    out
  }

  test("distributed merges equal the local reference, merge for merge") {
    val docs = Tables(spark, sfDir).documents
    val wc = BpeOps.wordCounts(docs, "text")
    val wordMap = wc.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = BpeOps.train(wc, nMerges = 15)
      .map(m => (m.left, m.right, m.pair_count))
    val want = localBpe(wordMap, 15)
    assert(got == want,
      s"merge lists diverge:\n got=$got\nwant=$want")
    // counts must be non-increasing in rank (greedy argmax property)
    assert(got.map(_._3).sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true
    })
  }

  test("applyBpe compresses: words <= subwords <= chars, exact totals") {
    val docs = Tables(spark, sfDir).documents
    val merges = BpeOps.train(BpeOps.wordCounts(docs, "text"), 10)
    val stats = BpeOps.applyBpe(docs, "text", merges).collect()
    assert(stats.length == docs.count())
    stats.foreach { r =>
      val w = r.getAs[Int]("n_words"); val s = r.getAs[Int]("n_subwords")
      val c = r.getAs[Int]("n_chars")
      assert(w <= s && s <= c,
        s"doc ${r.getLong(0)}: words=$w subwords=$s chars=$c")
    }
    // zero merges degenerates to characters exactly
    val charStats = BpeOps.applyBpe(docs, "text", Seq.empty).collect()
    charStats.foreach { r =>
      assert(r.getAs[Int]("n_subwords") == r.getAs[Int]("n_chars"))
    }
  }
}
