package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scaling probe (not part of the driver contract): stages a
  * K-fold self-union of an sf dir into /tmp and times a panel of
  * headline queries at 1x vs Kx to check the §4 claim that the plans
  * scale ~linearly in input volume (no super-linear shuffle blowup).
  * Ids are re-keyed per copy so key cardinality scales with volume
  * (a pure duplicate corpus would distort dedup/pair operators).
  *
  * usage: sbt "runMain graft.tools.ScaleProbe [K]"
  */
object ScaleProbe {
  private val panel = Seq(
    "q01_pricing_summary", "q03_join_agg", "q16_sort_limit",
    "q48_dedup_exact", "q49_dedup_minhash", "q70_pipeline_e2e",
    "q219_bm25", "q205_basket_lift", "q112_heavy_hitters",
    "q35_seq_match", "q47_sessionize", "q30_window_funcs",
    "q218_item_cf", "q225_dsir_weights",
    // round-6 additions: indexed search (build amortized away by the
    // best-of-two, so the Kx point shows PER-QUERY cost independent of
    // corpus volume), capped-basket pair generation, real BMP decode
    "q222_bm25_indexed", "q60_multimodal",
    // round-6b additions: media codecs (partition-parallel decode),
    // compressed-domain ANN, corpus LM scoring + distributed ntile,
    // prefix-filtered containment, LPA communities, one-pass PCA
    "q239_audio_decode", "q244_video_decode", "q240_ann_pq",
    "q241_perplexity_buckets", "q243_containment", "q245_communities",
    "q242_pca",
    // round-6c additions: density clustering, true next-fit packing,
    // filter-cascade funnel, calendar-bounded ACF
    "q251_dbscan", "q252_seq_pack", "q248_filter_funnel", "q250_acf",
    // round-6d additions: binned drift/ROC stats (bounded summary
    // frames), graph BFS with lineage barriers, leave-fold-out CV,
    // bigram LM scoring, DoReMi reweighting, bounded TOPK statement
    "q253_ks_drift", "q254_roc_auc", "q258_bfs", "q266_cv_centroid",
    "q267_bigram_ppl", "q264_doremi_weights", "q261_topk_sql",
    // round-6e additions: fixed-point ALS (two joins + two hash
    // aggregates per half-step over the ratings fact), dictionary-
    // scale phonetic linkage, perceptual image hashing (partition-
    // wise decode + one hash aggregate), weighted multi-source
    // Bellman-Ford, bounded-frame rolling correlation, Mann-Whitney
    "q275_als", "q272_phonetic_link", "q278_image_ahash",
    "q276_shortest_path", "q279_rolling_corr", "q274_mann_whitney",
    // round-6f additions: bounded-frame rank stats, clustering
    // validity, per-(key,label) sequential patterns, one-pass Poisson
    // bootstrap, HLL sketch algebra, cubic-capped triples, compaction
    "q287_spearman", "q290_davies_bouldin", "q291_seq_patterns",
    "q294_bootstrap_ci", "q296_hll_overlap", "q300_basket_triples",
    "q299_compact",
    // round-6g additions: parity-blocked edit-distance linkage (the
    // contiguous-half blocking was quadratic in the shared-prefix
    // block), driver-held-model k-means (zero-shuffle scalar assign),
    // logistic GD (one flat gradient aggregate per round)
    "q206_fuzzy_link", "q39_kmeans", "q238_logistic_quality",
    // round-6h additions: offline changepoint + isotonic calibration
    // (both reduce the fact to a calendar-bounded daily frame — the
    // Kx point should show the daily aggregate's cost only)
    "q308_binseg", "q309_isotonic", "q310_logrank",
    "q311_theil_sen", "q312_mann_kendall",
    // round-6i additions: control charts / whiteness / decomposition
    // (calendar-bounded daily or monthly frames — volume-invariant
    // tails), quantized-embedding drift (fact fan-out to a 10x64
    // frame), HITS (bounded LSH edge list), CUPED (per-user frame),
    // conformal + Kendall (monthly frame)
    "q320_ewma_chart", "q321_ljung_box", "q322_durbin_watson",
    "q327_seasonal_decomp", "q328_embed_drift", "q324_hits",
    "q325_cuped", "q330_conformal", "q331_kendall_tau",
    // round-6j additions: value-domain two-sample distances, the
    // bloom point lookup (metadata-scale candidate prune), gain
    // deciles (distributed ntile), vocab coverage (count-of-counts),
    // threshold sweep (bounded pair fan-out), Haar cascade
    "q347_energy_distance", "q351_cvm", "q333_bloom_lookup",
    "q344_gain_deciles", "q350_vocab_coverage",
    "q349_dedup_thresholds", "q348_haar_wavelet",
    // round-7 additions: the SMOOTH statement family (calendar-
    // bounded folds — the Kx point is the daily-aggregate cost only),
    // the ALS-backed recommender statement, LPA modularity (bounded
    // LSH edge list), federated pushdown (dimension-scale remote
    // work, volume-invariant), layered plot planning (one scan + one
    // aggregate at any volume)
    "q332_ewma_sql", "q305_smooth_sql", "q306_smooth_hw_sql",
    "q280_recommender_sql", "q340_modularity",
    "q357_fed_agg_pushdown", "q358_fed_join_pushdown",
    "q360_plot_layers")

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft_scale_x$k"
    val spark = graft.Engine.session()
    spark.sparkContext.setLogLevel("ERROR")

    // Shift key columns per copy so CARDINALITY scales with volume —
    // including the entity key (user_id): the 100-TB corpus model is
    // more users/orders/docs, not 1000x-longer per-entity histories,
    // so per-key ordered streams stay bounded while keys multiply.
    val keyCols = Map(
      "lineitem" -> Seq("l_orderkey"),
      "orders" -> Seq("o_orderkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dst/_done"))) {
      for (t <- graft.Tables.names) {
        val base = spark.read.parquet(s"$src/$t.parquet")
        val out = keyCols.get(t) match {
          case Some(keys) =>
            val copies = (0 until k).map { i =>
              keys.foldLeft(base) { (df, key) =>
                df.withColumn(key, col(key) + lit(i.toLong * 100000000L))
              }
            }
            copies.reduce(_ unionAll _)
          case None => base // dims stay as-is
        }
        out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
      java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$dst/_done"))
    }

    def time(dir: String, name: String): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"${"query"}%-22s ${"1x"}%8s ${s"${k}x"}%8s ratio")
    for (q <- panel) {
      val t1 = math.min(time(src, q), time(src, q))
      val tk = math.min(time(dst, q), time(dst, q))
      println(f"$q%-22s $t1%8.2f $tk%8.2f ${tk / t1}%5.1f")
    }
    spark.stop()
  }
}
