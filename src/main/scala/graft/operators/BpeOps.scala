package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" —
  * the standard LLM tokenizer-training algorithm, public).
  *
  * Scale shape — the part that matters at 100 TB: BPE trains on the
  * DISTINCT-WORD FREQUENCY table, not the corpus. ONE corpus pass
  * builds (word, count); every merge round then runs on the
  * vocab-sized table (segment each word under the merges learned so
  * far — a per-row fold against the BROADCAST merge list — explode
  * weighted adjacent pairs, one hash aggregate, 1-row argmax). Round
  * cost is independent of corpus volume; the corpus is touched
  * exactly once. The driver holds only the merge list (model state,
  * like k-means centroids) — never rows.
  *
  * Determinism: the argmax breaks count ties lexicographically on
  * (left, right), so the learned vocabulary is a pure function of
  * the word-count table on any engine, any partitioning.
  */
object BpeOps {

  /** One learned merge, in rank order. */
  case class Merge(rank: Int, left: String, right: String,
      pair_count: Long)

  /** Segment `word` under `merges` applied in rank order,
    * left-to-right within the word (the canonical BPE apply). */
  def segment(word: String,
      merges: Seq[(String, String)]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    for ((l, r) <- merges if syms.length > 1) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  /** The (word, count) table: one corpus pass, the only big shuffle. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(graft.functions.TextFunctions
        .regexTokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** One left-to-right pass replacing adjacent (l, r) with l+r —
    * segment()'s inner loop, applied to an already-segmented word. */
  private def applyMerge(syms: Array[String], l: String,
      r: String): Array[String] = {
    if (syms.length < 2) return syms
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn `nMerges` merges from the word-count table. */
  def train(wordCnt: DataFrame, nMerges: Int): Seq[Merge] = {
    val spark = wordCnt.sparkSession
    import spark.implicits._
    // Carry the SEGMENTED symbols forward between rounds: segment()
    // applies merges as a left-to-right fold in rank order, so
    // applying only the NEWEST merge to the previous round's
    // segmentation is bit-identical to re-segmenting every word from
    // scratch — O(1) merge passes per round instead of O(round)
    // (O(nMerges) total passes over the vocab instead of
    // O(nMerges^2)). Each round's state materializes eagerly with
    // truncated lineage (otherwise the lazy map chain re-runs every
    // earlier round's merge pass per action).
    var seg = wordCnt.select(col("word"), col("cnt").cast("long"))
      .as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString).toArray, c) }
      .localCheckpoint(true)
    var merges = Vector.empty[Merge]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      // weighted adjacent pairs -> codegen'd hash aggregate with
      // map-side combine; deterministic argmax (max count,
      // lexicographic tie-break)
      val best = seg.flatMap { case (syms, c) =>
        (0 until syms.length - 1).map(i =>
          (syms(i), syms(i + 1), c))
      }
        .toDF("l", "r", "c0")
        .groupBy(col("l"), col("r"))
        .agg(sum(col("c0")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      best.headOption match {
        case Some(row) =>
          val (l, r) = (row.getString(0), row.getString(1))
          merges :+= Merge(round + 1, l, r, row.getLong(2))
          round += 1
          if (round < nMerges)
            seg = seg.map { case (syms, c) => (applyMerge(syms, l, r), c) }
              .localCheckpoint(true)
        case None => exhausted = true // every word fully merged
      }
    }
    merges
  }

  /** Tokenize the corpus under learned merges: per-doc subword count
    * + compression vs character count (per-row fold against the
    * broadcast merge list; no shuffle beyond the final aggregate). */
  def applyBpe(docs: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cur: Seq[(String, String)] = merges.map(m => (m.left, m.right))
    docs.select(col("doc_id").cast("long"),
        graft.functions.TextFunctions.regexTokens(col(textCol)).as("tk"))
      .as[(Long, Seq[String])]
      .map { case (id, tk) =>
        val sub = tk.iterator.map(w => segment(w, cur).length).sum
        val chars = tk.iterator.map(_.length).sum
        (id, tk.length, sub, chars)
      }
      .toDF("doc_id", "n_words", "n_subwords", "n_chars")
  }
}
