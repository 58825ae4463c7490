package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search"): the embedding space splits into M
  * orthogonal subspaces, each sub-vector is replaced by the id of its
  * nearest codeword in a per-subspace codebook, and search scores
  * compressed codes with asymmetric distance (ADC) — the query stays
  * exact, the corpus is M small ints per vector.
  *
  * Scale story (the reason PQ exists): the scored corpus shrinks from
  * d floats to M codes (64 dims × 4B → 4 codes ≈ 64× smaller state at
  * M=4/ks=16 before code packing), so the candidate scan is bandwidth-
  * bound on codes, not vectors; candidate generation is a bounded
  * `graft_topk_by` funnel (map-side partial top-k, no ranking window,
  * no per-query sort), and only the ≤`nCandidates` survivors per query
  * are re-ranked against true vectors. Codebooks are deterministic
  * (sub-vectors of the first `ks` corpus rows — the same convention as
  * q101's coarse centroids) so the DuckDB oracle can replicate
  * encode/score bit-for-bit; a production build swaps in k-means
  * codebooks (graft.operators.MLOps.kmeans) without touching the
  * search plan.
  *
  * ADC here uses the identity dist_adc(q, code) = dist(q, recon) where
  * recon is the PQ reconstruction (concat of the M codewords): the
  * decode step materializes `recon` once at encode time, which keeps
  * the scoring expression a single codegen'd `graft_dist_sq` and the
  * fold order identical to the oracle's list_sum.
  *
  * Reference analogue: sclera's CLASSIFIED/CLUSTERED external-analytics
  * staging (modules/core/src/main/scala/analytics) — model built once,
  * applied relationally.
  */
object PqOps {

  /** Per-subspace codebooks from the first `ks` corpus vectors,
    * sliced: (c_id, sub_0 .. sub_{M-1}). Tiny (ks rows) — broadcast. */
  def codebooks(embeddings: DataFrame, m: Int, ks: Int, dim: Int): DataFrame = {
    val sub = dim / m
    require(sub * m == dim, s"dim $dim must divide into $m subspaces")
    val slices = (0 until m).map { i =>
      transform(slice(col("embedding"), i * sub + 1, sub),
        v => v.cast("double")).as(s"sub_$i")
    }
    embeddings.where(col("vec_id") < ks)
      .select(col("vec_id").cast("int").as("c_id") +: slices: _*)
  }

  /** Encode every vector: per-subspace nearest codeword (tie-break by
    * codeword id) + the PQ reconstruction for ADC scoring. ONE shuffle
    * (the per-vector argmin aggregation); the codebook side is
    * broadcast. Output: vec_id, code_0..code_{M-1}, recon. */
  def encode(embeddings: DataFrame, m: Int, ks: Int, dim: Int): DataFrame = {
    val spark = embeddings.sparkSession
    graft.plans.VectorExpressions.register(spark)
    val sub = dim / m
    val cb = codebooks(embeddings, m, ks, dim)
    val joined = embeddings.crossJoin(broadcast(cb))
    val dists = (0 until m).map { i =>
      expr(s"graft_dist_sq(slice(embedding, ${i * sub + 1}, $sub), sub_$i)")
        .as(s"d_$i")
    }
    val withD = joined.select(
      (col("vec_id") +: col("c_id") +: (0 until m).map(i => col(s"sub_$i"))
        ) ++ dists: _*)
    val aggs = (0 until m).flatMap { i =>
      Seq(
        min_by(col("c_id"), struct(col(s"d_$i"), col("c_id")))
          .as(s"code_$i"),
        min_by(col(s"sub_$i"), struct(col(s"d_$i"), col("c_id")))
          .as(s"cw_$i"))
    }
    withD.groupBy(col("vec_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id") +:
        (0 until m).map(i => col(s"code_$i")) :+
        concat((0 until m).map(i => col(s"cw_$i")): _*).as("recon"): _*)
  }

  /** ADC search: queries = the first `nQueries` corpus vectors; ADC
    * candidate funnel of `nCandidates` per query over the compressed
    * corpus, exact-cosine re-rank to final top `k`. Self-match
    * excluded. Output: q_id, vec_id, cos, rk. */
  def search(embeddings: DataFrame, m: Int, ks: Int, dim: Int,
      nQueries: Int, nCandidates: Int, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    graft.plans.VectorExpressions.register(spark)
    graft.plans.TopKBy.register(spark)
    val coded = encode(embeddings, m, ks, dim)
    // qe (double) drives ADC against the double recon; qf (raw float)
    // drives the exact re-rank (graft_cosine is monomorphic per type)
    val queries = embeddings.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"),
        transform(col("embedding"), v => v.cast("double")).as("qe"),
        col("embedding").as("qf"))
    // ADC over compressed codes: corpus × queries, bounded top-k funnel
    val cand = coded.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("adc", expr("graft_dist_sq(qe, recon)"))
      .groupBy(col("q_id"))
      .agg(expr(s"graft_topk_by(-adc, vec_id, vec_id, $nCandidates)")
        .as("top"))
      .select(col("q_id"), explode(col("top.tie")).as("vec_id"))
    // exact re-rank: only nQueries*nCandidates survivors fetch vectors
    cand.join(embeddings.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(queries), "q_id")
      .withColumn("cos", expr("graft_cosine(embedding, qf)"))
      .groupBy(col("q_id"))
      .agg(expr(s"graft_topk_by(cos, vec_id, vec_id, $k)").as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.tie").as("vec_id"),
        round(col("col.score"), 6).as("cos"),
        (col("pos") + 1).cast("int").as("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
}
