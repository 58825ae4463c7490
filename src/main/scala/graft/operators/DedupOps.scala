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

  /** CROSS-corpus LSH candidate pairs (incremental ingestion: a NEW
    * shard deduped against the EXISTING cleaned corpus — candidates
    * only ACROSS the two sides, never within a side): both sides band
    * with the same hash family, the per-(band, sig) cap applies to
    * the COMBINED bucket population, and a new-side banded row joins
    * only old-side rows. At 100 TB the old side's banded signatures
    * are a build-once artifact (metadata-scale next to the corpus)
    * and each incoming shard joins against them — the per-shard cost
    * scales with the SHARD, not the accumulated corpus. */
  def crossMinhashCandidates(
      newSigs: DataFrame, oldSigs: DataFrame, idCol: String,
      k: Int, bands: Int, maxBucket: Int = 50): DataFrame = {
    val rows = k / bands
    def banded(sigs: DataFrame, as: String): DataFrame =
      sigs.select(col(idCol).as(as), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), " +
          s"b -> slice(_mh, b * $rows + 1, $rows))"))
        .as(Seq("_band", "_sig")))
    val bn = banded(newSigs, "doc_new")
    val bo = banded(oldSigs, "doc_old")
    val smallBuckets = bn.select(col("_band"), col("_sig"))
      .unionAll(bo.select(col("_band"), col("_sig")))
      .groupBy(col("_band"), col("_sig"))
      .agg(count(lit(1)).as("_bc"))
      .where(col("_bc") <= maxBucket)
      .drop("_bc")
    bn.join(smallBuckets, Seq("_band", "_sig"))
      .join(bo, Seq("_band", "_sig"))
      .select(col("doc_new"), col("doc_old"))
      .distinct()
  }

  /** The persisted OLD-side artifact for cross-corpus dedup: one row
    * per already-cleaned document carrying its minhash signature AND
    * its distinct token set — everything [[crossDedupAgainstStore]]
    * needs for both candidate generation and exact verification, so
    * an incoming shard never re-reads the accumulated corpus. Same
    * build-once/append discipline as the inverted index
    * (TextSearchOps.buildIndex / appendToIndex). */
  def signatureFrame(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    minhashSignature(docs, textCol, k)
      .select(col(idCol), col("_toks"), col("_mh"))

  /** Build the signature store at `path` (overwrite). */
  def buildSignatureStore(docs: DataFrame, idCol: String,
      textCol: String, k: Int, path: String): Unit =
    signatureFrame(docs, idCol, textCol, k)
      .write.mode("overwrite").parquet(path)

  /** Append a newly cleaned shard's signatures to the store — the
    * incremental-ingestion maintenance op: O(shard) work, the stored
    * rows are untouched (parquet append writes new files only).
    * Append-then-read equals rebuild-from-scratch row-for-row
    * (SignatureStoreSpec pins it). */
  def appendSignatureStore(docs: DataFrame, idCol: String,
      textCol: String, k: Int, path: String): Unit =
    signatureFrame(docs, idCol, textCol, k)
      .write.mode("append").parquet(path)

  /** Cross-corpus near-dup of a NEW shard against the persisted
    * signature store: candidates across sides only (combined bucket
    * cap), exact Jaccard verification on the stored token sets — the
    * old corpus is NEVER re-scanned; per-shard cost is O(shard +
    * matched candidates). Returns (doc_new, doc_old, jaccard) at
    * jaccard >= tNum/tDen. */
  def crossDedupAgainstStore(spark: org.apache.spark.sql.SparkSession,
      newDocs: DataFrame, storePath: String, idCol: String,
      textCol: String, k: Int, bands: Int,
      tNum: Int, tDen: Int): DataFrame = {
    // dedupe BOTH sides by id (the direct lane's hardening): a doc
    // repeated in the shard, or a shard appended twice to the store,
    // must not emit the same verified pair multiple times
    val newSigs = CacheScope.scoped(
      signatureFrame(newDocs, idCol, textCol, k).dropDuplicates(idCol))
    val store = spark.read.parquet(storePath).dropDuplicates(idCol)
    val cands = crossMinhashCandidates(newSigs, store, idCol, k, bands)
    cands
      .join(newSigs.select(col(idCol).as("doc_new"),
        col("_toks").as("_ta")), Seq("doc_new"))
      .join(store.select(col(idCol).as("doc_old"),
        col("_toks").as("_tb")), Seq("doc_old"))
      .withColumn("jaccard",
        size(array_intersect(col("_ta"), col("_tb"))).cast("double")
          / size(array_union(col("_ta"), col("_tb"))).cast("double"))
      // double threshold, matching the direct (q438) lane's filter so
      // store-backed and direct runs return identical pairs
      .where(col("jaccard") >= lit(tNum.toDouble / tDen.toDouble))
      .select(col("doc_new"), col("doc_old"), col("jaccard"))
  }

  /** LSH-blocked embedding-cosine candidate pairs: each vector hashes
    * to ONE random-hyperplane bucket (VectorFunctions.hyperplaneBucket,
    * portable arithmetic — the SQL oracle replicates it bit-for-bit),
    * pairs are generated only inside (label, bucket) blocks, and
    * blocks larger than `maxBucket` are dropped before pair
    * generation — the same bounded-bucket guard as minhashCandidates.
    * Without the bucket, a within-label join is quadratic in the
    * label's corpus share; with it, cost is sum over blocks of
    * |block|^2 with |block| <= maxBucket.
    *
    * Returns (label, vec_a, vec_b, cos) with vec_a < vec_b and
    * cos >= threshold. Caller must have registered VectorExpressions.
    */
  /** The near-dup graph, MATERIALIZED once per corpus — the 100-TB
    * contract every graph analytic (PageRank, LPA, HITS, k-core,
    * triangles, DBSCAN, ...) actually runs under: nobody rebuilds an
    * LSH edge list per metric. Same build-once discipline as the
    * inverted index (TextSearchOps.buildIndex): the cache key is the
    * CONTENT fingerprint of embeddings.parquet (Hadoop FileSystem
    * listing — works for HDFS/S3 corpora, not just driver-local
    * disk) plus every pair parameter plus the CacheFs.AlgoVersion
    * salt (so a code change to pair generation can never silently
    * serve edges computed by the old algorithm). Root, publication,
    * and race discipline are CacheFs's: `spark.graft.cacheRoot` conf
    * (default under the warehouse dir — a SHARED filesystem on a
    * real cluster, unlike java.io.tmpdir), stage + rename, losers
    * read the winner's copy, and a genuine publish failure surfaces
    * instead of masquerading as a lost race. Rows are byte-identical
    * to a fresh [[cosineCandidatePairs]] run (EdgeCacheSpec proves
    * equality).
    */
  def materializedCosinePairs(spark: org.apache.spark.sql.SparkSession,
      dir: String, planes: Int, threshold: Double,
      maxBucket: Int = 500): DataFrame = {
    import graft.sources.CacheFs
    val fp = CacheFs.fingerprint(spark, s"$dir/embeddings.parquet")
    val tag = f"edges_${CacheFs.AlgoVersion}_${fp}_p${planes}" +
      f"_t${(threshold * 1000).round}%d_b$maxBucket"
    val published = CacheFs.getOrBuild(spark, tag) { stage =>
      graft.plans.VectorExpressions.register(spark)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      cosineCandidatePairs(emb, planes, threshold, maxBucket)
        .write.mode("overwrite").parquet(stage)
    }
    spark.read.parquet(published)
  }

  def cosineCandidatePairs(
      embeddings: DataFrame, planes: Int, threshold: Double,
      maxBucket: Int = 500): DataFrame = {
    val bucketed = embeddings.select(
      col("label"), col("vec_id"), col("embedding"),
      graft.functions.VectorFunctions
        .hyperplaneBucket(col("embedding"), planes).as("_bkt"))
    val small = bucketed.groupBy(col("label"), col("_bkt"))
      .agg(count(lit(1)).as("_bc"))
      .where(col("_bc") <= maxBucket)
      .drop("_bc")
    val pruned = bucketed.join(small, Seq("label", "_bkt"))
    val a = pruned.select(col("label"), col("_bkt"),
      col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = pruned.select(col("label"), col("_bkt"),
      col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, Seq("label", "_bkt"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", expr("graft_cosine(ea, eb)"))
      .where(col("cos") >= threshold)
      .select(col("label"), col("vec_a"), col("vec_b"), col("cos"))
  }

  /** Prefix-filtered EXACT set-similarity self-join (PPJoin-style,
    * Xiao et al., "Efficient Similarity Joins for Near Duplicate
    * Detection", WWW'08 — public algorithm). Returns every pair of
    * docs whose bigram-shingle-set Jaccard is >= tNum/tDen, with NO
    * false negatives — unlike the minhash/simhash paths, this one is
    * exact, so its oracle is brute-force all-pairs Jaccard.
    *
    * Scale design: elements are ordered by ascending global document
    * frequency (rarest first; ties by value — any canonical total
    * order works). A pair with Jaccard >= t must share an element in
    * each side's first |x| - ceil(t*|x|) + 1 elements (the prefix
    * lemma: overlap >= t*|union| >= t*|x|, so the overlap cannot fit
    * entirely in the last ceil(t*|x|) - 1 positions). Candidates are
    * generated by an inverted-index self-join on PREFIX postings only
    * — under a Zipfian vocabulary the rare-element prefixes have
    * short posting lists, so the candidate set is near-linear where
    * all-pairs is quadratic. A size filter (t*|x| <= |y| <= |x|/t,
    * also necessary for Jaccard >= t) prunes before dedup; survivors
    * are verified exactly.
    *
    * The threshold is a RATIONAL tNum/tDen so prefix length and size
    * bounds are exact integer arithmetic — a double ceil(0.8*n) can
    * round UP spuriously and shorten the prefix, silently breaking
    * the no-false-negative guarantee.
    *
    * Shuffle audit: one explode+groupBy for df, one groupBy to
    * rebuild ordered arrays, one equi-join on the posting element,
    * one distinct, two hash joins for verify — every stage keyed,
    * nothing quadratic outside bucket-bounded posting lists, nothing
    * on the driver.
    */
  def prefixJaccardJoin(
      docs: DataFrame, idCol: String, textCol: String,
      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    graft.plans.TextExpressions.register(docs.sparkSession)
    val d = docs.select(col(idCol).as("_id"),
      array_distinct(expr(s"graft_shingle_hashes($textCol, 2)")).as("_bg"))
    // global document frequency per element (the canonical order key)
    val post0 = d.select(col("_id"), explode(col("_bg")).as("_h"))
    val dfreq = post0.groupBy(col("_h")).agg(count(lit(1)).as("_df"))
    // per-doc element array sorted by (df asc, value asc) + its prefix;
    // prefix length |x| - ceil(t|x|) + 1 via integer ceil div.
    val ordered = post0.join(dfreq, Seq("_h"))
      .groupBy(col("_id"))
      .agg(sort_array(collect_list(struct(col("_df"), col("_h"))))
        .as("_ord"))
      .select(col("_id"),
        expr("transform(_ord, x -> x._h)").as("_arr"))
      .withColumn("_n", size(col("_arr")))
      .withColumn("_pref", expr(
        s"slice(_arr, 1, _n - ((_n * $tNum + $tDen - 1) div $tDen) + 1)"))
    CacheScope.scoped(ordered) // postings + verify both read this
    // postings carry the element's 1-based POSITION in the ordered
    // array (prefix = head, so prefix position == array position)
    val posts = ordered.select(col("_id"), col("_n"),
      posexplode(col("_pref")).as(Seq("_p0", "_h")))
      .withColumn("_p", col("_p0") + 1).drop("_p0")
    // PPJoin positional filter: for a pair's FIRST common element at
    // positions (pa, pb), overlap <= 1 + min(na-pa, nb-pb) — every
    // common element is at-or-after it in the canonical order. A
    // qualifying pair needs overlap >= ceil(t(na+nb)/(1+t)) (from
    // jac >= t), so join rows whose positional bound can't reach the
    // required overlap are pruned. Later-element rows of a pair may
    // be over-pruned, but the first-element row always survives for
    // a qualifying pair, and distinct() needs only one — exactness
    // holds. Integer arithmetic throughout (t = tNum/tDen).
    val cands = posts.alias("a")
      .join(posts.alias("b"),
        col("a._h") === col("b._h") && col("a._id") < col("b._id") &&
          // size filter: t*na <= nb and t*nb <= na
          col("b._n") * tDen >= col("a._n") * tNum &&
          col("a._n") * tDen >= col("b._n") * tNum &&
          (least(col("a._n") - col("a._p"), col("b._n") - col("b._p"))
            + 1) * (tNum + tDen) >=
            (col("a._n") + col("b._n")) * tNum)
      .select(col("a._id").as("doc_a"), col("b._id").as("doc_b"))
      .distinct()
    // verify on VALUE-sorted copies with the native merge-intersect
    // (single codegen'd loop; array_intersect builds a hash set per
    // row)
    val sets = ordered.select(col("_id"),
      sort_array(col("_arr")).as("_arr"), col("_n"))
    cands
      .join(sets.select(col("_id").as("doc_a"), col("_arr").as("_sa"),
        col("_n").as("_na")), Seq("doc_a"))
      .join(sets.select(col("_id").as("doc_b"), col("_arr").as("_sb"),
        col("_n").as("_nb")), Seq("doc_b"))
      .withColumn("_inter",
        expr("graft_sorted_intersect_count(_sa, _sb)").cast("long"))
      .withColumn("_union", col("_na") + col("_nb") - col("_inter"))
      // threshold test in exact integer arithmetic (inter/union >= t
      // <=> inter*tDen >= union*tNum) — no double-boundary divergence
      .where(col("_inter") * tDen >= col("_union") * tNum)
      .withColumn("jaccard",
        col("_inter").cast("double") / col("_union").cast("double"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
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
    * Algorithm: graph CONTRACTION with per-partition union-find.
    * Symmetrizing the edge list and hash-partitioning by `u` gives
    * every node its full adjacency inside one "home" partition; a local
    * min-rooted union-find there collapses each partition-local
    * component to its minimum, emitting one (node -> local min) mapping
    * row per home node. Mapping both endpoints through that contraction
    * leaves only the BRIDGE edges between partition-local components —
    * the graph shrinks by roughly the average local-component size per
    * level, so a few levels (vs O(diameter) label-propagation rounds)
    * finish even the long chains the shuffled-word dup corpus produces.
    * The final labels compose the per-level mappings outermost-last;
    * since unions always root the minimum and contraction preserves
    * connectivity, the lone surviving root per component is its global
    * min. Each level costs one repartition + mapPartitions + two
    * mapping joins — constant shuffles on the node id, no driver-side
    * graph state (the per-partition union-find is bounded by partition
    * size, the 100-TB knob being the partition count).
    *
    * Scale essential learned the hard way (measured as an exponential
    * per-level blowup at sf0.1): each level's frames are rebuilt from
    * the computed RDD (createDataFrame(rdd, schema)), which truncates
    * BOTH the logical lineage AND the size-in-bytes statistic —
    * localCheckpoint is NOT enough, because it copies the source plan's
    * stats into the LogicalRDD and join estimation multiplies them into
    * million-digit BigIntegers after ~12 levels.
    *
    * Input: edges (srcCol, dstCol), undirected (symmetrized here);
    * node ids must be integral (cast to long).
    * Output: (node, comp) for every node appearing in an edge.
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // barrier: materialize + cache, truncating lineage and stats; the
    // count doubles as this level's convergence probe.
    def barrier(df: DataFrame): (DataFrame, Long) = {
      val out = spark.createDataFrame(df.rdd, df.schema).persist()
      (out, out.count())
    }
    def symmetrize(df: DataFrame): DataFrame =
      df.unionAll(df.select(col("v").as("u"), col("u").as("v")))
        .where(col("u") =!= col("v")).distinct()
    val e0 = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    var (cur, nEdges) = barrier(symmetrize(e0))
    var mappings = List.empty[DataFrame] // innermost level first
    var it = 0
    while (nEdges > 0 && it < maxIter) {
      val t0 = System.nanoTime()
      // home partition = hash(u); emit (node -> local component min)
      // for home nodes only (a node is u-side in exactly one partition,
      // so the mapping is total and single-valued).
      val (mapping, _) = barrier(
        cur.repartition(col("u")).as[(Long, Long)].mapPartitions { rows =>
          val parent = new java.util.HashMap[Long, Long]()
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrDefault(r, r) != r) r = parent.get(r)
            var c = x // path compression
            while (parent.getOrDefault(c, c) != r) {
              val nxt = parent.get(c); parent.put(c, r); c = nxt
            }
            r
          }
          val homes = new java.util.HashSet[Long]()
          rows.foreach { case (u, v) =>
            homes.add(u)
            val ru = find(u); val rv = find(v)
            if (ru < rv) parent.put(rv, ru)
            else if (rv < ru) parent.put(ru, rv)
          }
          val out = Iterator.newBuilder[(Long, Long)]
          homes.forEach(n => out += ((n, find(n))))
          out.result()
        }.toDF("node", "comp"))
      mappings ::= mapping
      // contract: bridge edges between distinct local components
      val contracted = cur
        .join(mapping.select(col("node").as("u"), col("comp").as("mu")),
          Seq("u"))
        .join(mapping.select(col("node").as("v"), col("comp").as("mv")),
          Seq("v"))
        .select(col("mu").as("u"), col("mv").as("v"))
      val (next, n) = barrier(symmetrize(contracted))
      cur.unpersist()
      cur = next; nEdges = n; it += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(f"[cc] level $it edges=$n%d " +
          f"${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    cur.unpersist()
    require(nEdges == 0, s"connectedComponents: $nEdges edges after $it levels")
    // the per-level mappings feed the returned lazy composition — scope
    // their caches to the caller's consuming action (registered AFTER
    // the loop's internal counts so they survive until then)
    mappings.foreach(CacheScope.scoped)
    // compose innermost-first: final(x) = m_k(... m_1(x)); roots with no
    // entry in an outer level are fixpoints (left join + coalesce).
    mappings.reverse match {
      case Nil => spark.emptyDataset[(Long, Long)].toDF("node", "comp")
      case m1 :: rest =>
        rest.foldLeft(m1) { (acc, mi) =>
          acc.join(mi.select(col("node").as("_from"), col("comp").as("_c")),
            acc("comp") === col("_from"), "left")
            .select(acc("node"),
              coalesce(col("_c"), acc("comp")).as("comp"))
        }
    }
  }
  /** Asymmetric containment join C(A→B) = |A∩B| / |A| over word
    * k-gram shingles (k=3 default: trigrams keep posting lists
    * selective even under a small vocabulary, where bigram df is so
    * uniform no prefix can prune) at rational threshold num/den:
    * detects documents (near-) contained in another — templates /
    * subset duplication. Candidate
    * generation is the containment PREFIX filter (Chaudhuri et al.
    * 2006, SSJoin): if B holds ≥ (num/den)|A| of A's shingles then at
    * most |A| - ⌈num|A|/den⌉ are missing, so A must share one of its
    * (|A| - ⌈num|A|/den⌉ + 1) lowest-df shingles with B — only those
    * postings index the A side (B indexes fully). The df ordering
    * minimizes candidates, but ANY prefix of that size is correct
    * (pigeonhole), so results are exact and ordering-independent.
    * Verification is the native sorted-merge intersect on numerically
    * sorted arrays; the θ test itself is integer-exact
    * (inter·den ≥ n_a·num). Candidates ship scalar postings, never
    * array pairs; zero-candidate pairs never materialize.
    * Output: a_id, b_id, n_a, inter, containment — pairs with
    * n_a ≥ minShingles only. */
  def containmentJoin(docs: DataFrame, idCol: String, textCol: String,
      num: Int, den: Int, minShingles: Int = 5, k: Int = 3): DataFrame = {
    require(num > 0 && den >= num, s"threshold $num/$den not in (0,1]")
    val spark = docs.sparkSession
    graft.plans.TextExpressions.register(spark)
    val d = CacheScope.scoped(docs.select(
      col(idCol).as("doc_id"),
      array_distinct(expr(s"graft_shingle_hashes($textCol, $k)")).as("sh")))
    val dfc = d.select(explode(col("sh")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    val ordered = CacheScope.scoped(
      d.select(col("doc_id"), explode(col("sh")).as("h"))
        .join(dfc, "h")
        .groupBy(col("doc_id"))
        .agg(transform(
            array_sort(collect_list(struct(col("df"), col("h")))),
            p => p.getField("h")).as("pref_order"),
          count(lit(1)).as("n")))
    val numSorted = d.select(col("doc_id"),
      array_sort(col("sh")).as("shs"), size(col("sh")).as("n"))
    // prefix length |A| - ceil(num*|A|/den) + 1, integer-exact; only
    // docs that can appear in the output (n >= minShingles) index
    val aPref = ordered
      .where(col("n") >= minShingles)
      .select(col("doc_id").as("a_id"), col("n").as("n_a"),
        expr(s"($num * n + $den - 1) DIV $den").as("req"),
        posexplode(slice(col("pref_order"), lit(1), expr(
          s"CAST(n - (($num * n + $den - 1) DIV $den) + 1 AS INT)")))
          .as(Seq("ai", "h")))
    val bAll = ordered.select(col("doc_id").as("b_id"),
      col("n").as("n_b"), posexplode(col("pref_order")).as(Seq("bi", "h")))
    // positional filter (PPJoin, Xiao et al. WWW'08, containment
    // form): both arrays share the (df, h) total order, so for the
    // MINIMAL common element at 0-based positions ai/bi every other
    // common element lies after it on both sides —
    // overlap <= 1 + min(n_a-ai-1, n_b-bi-1). The minimal common
    // element is always one of the generated matches (the prefix is
    // downward-closed in the order), so keeping pairs where ANY match
    // passes the bound loses no true result; common shingles sort
    // LATE under ascending df, making the b-side slack small exactly
    // where posting lists are long. Subsumes the |B| >= req size
    // filter (bi=0 case).
    val cand = aPref.join(bAll, "h")
      .where(col("a_id") =!= col("b_id") &&
        lit(1) + least(col("n_a") - col("ai") - 1,
          col("n_b") - col("bi") - 1) >= col("req"))
      .select(col("a_id"), col("b_id")).distinct()
    cand
      .join(numSorted.select(col("doc_id").as("a_id"),
        col("shs").as("a_sh"), col("n").as("n_a")), "a_id")
      .join(numSorted.select(col("doc_id").as("b_id"),
        col("shs").as("b_sh")), "b_id")
      .withColumn("inter",
        expr("graft_sorted_intersect_count(a_sh, b_sh)").cast("int"))
      .where(col("n_a") >= minShingles &&
        col("inter") * lit(den) >= col("n_a") * lit(num))
      .select(col("a_id"), col("b_id"), col("n_a").cast("int").as("n_a"),
        col("inter"),
        round(col("inter").cast("double") / col("n_a").cast("double"), 6)
          .as("containment"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
