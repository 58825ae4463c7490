package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Near-duplicate detection operators for training-data pipelines.
  *
  * Scale design (SURVEY.md §4): every variant turns the quadratic
  * all-pairs problem into a shuffle on a compact candidate key
  * (minhash band signature, simhash chunk, length block), generates
  * pairs only inside buckets, then verifies candidates exactly.
  * Bucket keys are hashes → uniform → no skew; nothing touches the
  * driver.
  */
object DedupOps {

  /** MinHash signatures (k hashes) over each doc's distinct token set.
    * Universal-hash family (a_i * h + b_i mod p) over an
    * engine-portable polynomial token hash (graft_fingerprint), so the
    * whole pipeline is replicable by the SQL oracle bit-for-bit.
    */
  def minhashSignature(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    graft.plans.TextExpressions.register(docs.sparkSession)
    docs
      .withColumn("_toks", TextFunctions.tokenSet(col(textCol)))
      .withColumn("_th", expr(
        "transform(_toks, s -> pmod(graft_fingerprint(s), 2147483647L))"))
      // native one-loop signature: arithmetic identical to
      //   transform(sequence(0,k-1), i -> array_min(transform(_th,
      //     h -> pmod((1000003+i*7919)*h + (12345+i*271), 2147483647))))
      // but without k*|tokens| interpreted lambda evaluations
      .withColumn("_mh", expr(s"graft_minhash(_th, $k)"))
      .drop("_th")
  }

  /** LSH candidate pairs: docs sharing any band of `rows` consecutive
    * minhashes. Returns (doc_a, doc_b) with doc_a < doc_b.
    *
    * Buckets larger than `maxBucket` are dropped before pair
    * generation: an over-popular band signature carries no similarity
    * signal and would blow the candidate set up quadratically (the
    * standard bounded-bucket LSH guard — essential at corpus scale).
    */
  def minhashCandidates(
      sigs: DataFrame, idCol: String, k: Int, bands: Int,
      maxBucket: Int = 50): DataFrame = {
    val rows = k / bands
    val banded = sigs.select(col(idCol).as("_id"), posexplode(expr(
      s"transform(sequence(0, ${bands - 1}), b -> slice(_mh, b * $rows + 1, $rows))"))
      .as(Seq("_band", "_sig")))
    val smallBuckets = banded.groupBy(col("_band"), col("_sig"))
      .agg(count(lit(1)).as("_bc"))
      .where(col("_bc") <= maxBucket)
      .drop("_bc")
    val pruned = banded.join(smallBuckets, Seq("_band", "_sig"))
    val a = pruned.select(col("_band"), col("_sig"), col("_id").as("doc_a"))
    val b = pruned.select(col("_band"), col("_sig"), col("_id").as("doc_b"))
    a.join(b, Seq("_band", "_sig"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Exact token-set Jaccard for candidate verification. */
  def verifyJaccard(
      candidates: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("_vid"),
      TextFunctions.tokenSet(col(textCol)).as("_vtoks"))
    candidates
      .join(toks.withColumnRenamed("_vid", "doc_a")
        .withColumnRenamed("_vtoks", "_ta"), Seq("doc_a"))
      .join(toks.withColumnRenamed("_vid", "doc_b")
        .withColumnRenamed("_vtoks", "_tb"), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("_ta"), col("_tb"))).cast("double")
          / size(array_union(col("_ta"), col("_tb"))).cast("double"))
      .drop("_ta", "_tb")
  }

  /** 64-bit SimHash over the distinct token set: per-bit vote of token
    * hashes. Computed as a flat explode -> two partial-aggregated
    * groupBys rather than a higher-order array fold: higher-order
    * lambdas run interpreted, while this shape stays entirely inside
    * whole-stage codegen with map-side combine. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.plans.TextExpressions.register(docs.sparkSession)
    // Native per-row bit votes (graft.plans.Simhash64): integer
    // arithmetic identical to the explode -> two-groupBy formulation
    // (and the SQL oracle), with zero shuffled rows instead of
    // |tokens| * 64 per doc.
    docs.select(col(idCol),
      TextFunctions.tokenSet(col(textCol)).as("_ts"))
      .select(col(idCol), expr("graft_simhash64(_ts)").as("simhash"))
  }

  /** SimHash near-dup candidates: pairs sharing any 16-bit chunk
    * (pigeonhole guarantee for hamming <= 3; heuristic recall above),
    * verified by exact hamming distance <= maxHamming.
    *
    * Chunk buckets larger than `maxBucket` are dropped before pair
    * generation — on low-entropy corpora the signature bits correlate
    * and popular chunks would otherwise degenerate to all-pairs.
    */
  def simhashPairs(
      hashed: DataFrame, idCol: String, maxHamming: Int,
      maxBucket: Int = 50): DataFrame = {
    val chunked = hashed.select(col(idCol).as("_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535L)"))
        .as(Seq("_chunk_id", "_chunk")))
    val smallBuckets = chunked.groupBy(col("_chunk_id"), col("_chunk"))
      .agg(count(lit(1)).as("_bc"))
      .where(col("_bc") <= maxBucket)
      .drop("_bc")
    val pruned = chunked.join(smallBuckets, Seq("_chunk_id", "_chunk"))
    val a = pruned.select(col("_chunk_id"), col("_chunk"),
      col("_id").as("doc_a"), col("simhash").as("_ha"))
    val b = pruned.select(col("_chunk_id"), col("_chunk"),
      col("_id").as("doc_b"), col("simhash").as("_hb"))
    a.join(b, Seq("_chunk_id", "_chunk"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("_ha"), col("_hb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("_ha").bitwiseXOR(col("_hb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Connected components over a near-duplicate pair graph: assigns
    * every node the MINIMUM node id reachable from it, turning pairwise
    * near-dup hits into whole dedup clusters (keep comp, drop rest).
    *
    * Algorithm: min-label propagation with POINTER JUMPING — each round
    * every node takes the min of (its label, its neighbors' labels, its
    * label's label). The neighbor step moves labels one hop; the jump
    * step halves label-chain depth, so convergence is O(log diameter)
    * rounds even on long chains (the shuffled-word dup corpus produces
    * exactly those), each round a constant number of shuffles on the
    * node id.
    *
    * Two scale essentials learned the hard way (both measured as
    * exponential per-round blowups at sf0.1):
    *  - each round's labels are rebuilt from the computed RDD
    *    (createDataFrame(rdd, schema)), which truncates BOTH the
    *    logical lineage (the round plan references labels twice, so an
    *    untruncated plan doubles per round) AND the size-in-bytes
    *    statistic — localCheckpoint is NOT enough, because it copies
    *    the source plan's stats into the LogicalRDD, join estimation
    *    multiplies them, and after ~12 rounds the optimizer was
    *    spending a minute per round multiplying million-digit
    *    BigIntegers;
    *  - convergence is a count() per round (an aggregate, never a
    *    collect), and the cap is a safety net, not the exit.
    *
    * Input: edges (srcCol, dstCol), undirected (symmetrized here).
    * Output: (node, comp) for every node appearing in an edge.
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    val sym = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionAll(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .persist()
    def barrier(df: DataFrame): DataFrame = {
      val out = spark.createDataFrame(df.rdd, df.schema).persist()
      out.count()
      out
    }
    // one propagation hop: min(own, neighbors', label-of-label)
    def step(lbl: DataFrame): DataFrame = {
      val nbr = sym
        .join(lbl.select(col("node").as("v"), col("comp").as("_vc")),
          Seq("v"))
        .groupBy(col("u").as("node"))
        .agg(min(col("_vc")).as("_nmin"))
      // pointer jump: comp(comp(node)) — labels' comps are node ids by
      // construction (mins over node ids), so the self-join resolves
      val jump = lbl.select(col("comp").as("_jfrom"), col("node"))
        .join(lbl.select(col("node").as("_jfrom"),
          col("comp").as("_jc")), Seq("_jfrom"))
        .select(col("node"), col("_jc"))
      lbl.join(nbr, Seq("node"), "left")
        .join(jump, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("_nmin"), col("comp")),
            coalesce(col("_jc"), col("comp"))).as("comp"))
    }
    var labels = barrier(sym.select(col("u").as("node")).distinct()
      .withColumn("comp", col("node")))
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      // two hops per barrier: the barrier/action overhead dominates on
      // small label frames, and the doubled plan is still constant-size
      // (labels is a LogicalRDD leaf)
      val next = barrier(step(step(labels)))
      val changed = next.select(col("node"), col("comp").as("_c"))
        .join(labels, Seq("node"))
        .where(col("_c") =!= col("comp"))
        .count() // both sides cached and tiny
      labels.unpersist()
      labels = next
      converged = changed == 0
      it += 1
    }
    sym.unpersist()
    labels
  }
}
