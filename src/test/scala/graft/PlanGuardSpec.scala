package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the properties that make these
  * operators scale must survive future edits — pushdown reaching the
  * scan, dimensions broadcast, and no accidental cartesian products
  * anywhere in the registry. */
class PlanGuardSpec extends AnyFunSuite {
  import TestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("filter and projection push to the parquet scan (q02)") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters") && p.contains("l_quantity"))
    assert(!p.contains("l_returnflag"), "pruned column read back in")
  }

  test("dimension joins broadcast (q03, q10)") {
    assert("BroadcastHashJoin".r.findAllIn(plan("q03_join_agg")).size == 2)
    assert("BroadcastHashJoin".r.findAllIn(plan("q10_star_join")).size == 5)
  }

  test("rollup/cube run as one Expand + one aggregation, not a union") {
    val p = plan("q71_rollup")
    assert("Expand".r.findAllIn(p).size == 1)
    assert(!p.contains("Union"))
  }

  test("tfidf top-k uses WindowGroupLimit and broadcasts the idf side") {
    val p = plan("q76_tfidf")
    assert(p.contains("WindowGroupLimit"), "top-k not pushed down")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("decontamination streams the train side, broadcasts benchmark") {
    val p = plan("q82_contamination")
    assert(p.contains("BroadcastHashJoin"))
    // the Inner join against the corpus must build the (tiny) bench side
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("Inner")))
  }

  test("custom as-of exec plans one exchange+sort per side, no more") {
    val p = plan("q100_asof_exec")
    assert(p.contains("AsOfJoin"), "custom exec not planned")
    // two shuffles (one per side) feed the merge; the final orderBy
    // adds its own range exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
  }

  test("IVF ANN broadcasts the centroids and the probe set") {
    val p = plan("q101_ann_ivf")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
  }

  test("gen source narrows the generated range via pushdown (q105)") {
    val p = plan("q105_gen_source")
    assert(p.contains("graft_gen[1000,60000)"), p)
  }

  test("doc chunking fans out without any shuffle before the sort") {
    val p = plan("q121_doc_chunking")
    // sequence+posexplode run inside the scan partition; the only
    // exchange allowed is the final presentation orderBy
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty, p)
    assert(p.contains("Generate"), p)
  }

  test("naive Bayes scores with broadcast model joins only") {
    val p = plan("q126_naive_bayes")
    assert(!p.contains("SortMergeJoin"),
      s"model join fell back to a shuffle join:\n$p")
  }

  test("partitioned source prunes partitions at planning time (q128)") {
    val p = plan("q128_partitioned_source")
    assert(p.contains("PartitionFilters") && p.contains("lang"), p)
    // only the lang=en partition directory survives pruning
    assert(!p.contains("lang=es"), p)
  }

  test("histogram min/max is a broadcast 1-row aggregate (q120)") {
    val p = plan("q120_histogram")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    // the bucket count itself must be a hash aggregate, not a sort
    assert(p.contains("HashAggregate"), p)
  }

  test("band join exec plans one exchange per side (q153)") {
    val p = plan("q153_band_join")
    assert(p.contains("BandJoin"), "custom exec not planned")
    // one hash exchange per side; the presentation orderBy adds a
    // range exchange of its own
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
  }

  test("oov rate broadcasts the rare vocab onto the token stream") {
    val p = plan("q149_oov_rate")
    assert(!p.contains("SortMergeJoin"),
      s"vocab join fell back to a shuffle join:\n$p")
  }

  test("bigram PMI broadcasts the unigram tables and the total") {
    val p = plan("q154_bigram_pmi")
    assert(!p.contains("SortMergeJoin"),
      s"unigram join fell back to a shuffle join:\n$p")
  }

  test("share-of-total broadcasts every dimension (q160)") {
    val p = plan("q160_share_of_total")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("rolling DAU runs the bucket expansion, not a nested loop (q167)") {
    val p = plan("q167_rolling_dau")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a nested loop:\n$p")
  }

  test("pagerank keeps the node count broadcast each round (q163)") {
    val p = plan("q163_pagerank")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ANN/kNN top-k funnels are bounded aggregates, not windows") {
    // the anti-pattern: row_number().over(Window.partitionBy(q_id))
    // shuffles every candidate row into ONE task per query; the fix is
    // graft_topk_by (k rows of state per key, map-side combined)
    for (q <- Seq("q54_ann_lsh", "q101_ann_ivf", "q179_knn_classify",
        "q196_bruteforce_topk")) {
      val p = plan(q)
      assert(p.contains("graft_topk_by"),
        s"$q lost the bounded top-k aggregate")
      assert(!p.contains("row_number"),
        s"$q reintroduced a per-query window funnel:\n$p")
    }
  }

  test("kNN never broadcasts or crossJoins a corpus fold (q179)") {
    val p = plan("q179_knn_classify")
    // the only nested-loop joins allowed are the two 16-row centroid
    // cross joins; the train-fold x test-fold product must not exist
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p)
    assert("graft_topk_by".r.findAllIn(p).size >= 2, p)
  }

  test("type inference reads its table exactly once (q41)") {
    val p = plan("q41_typeinfer")
    assert("Scan ".r.findAllIn(p).size == 1,
      s"inferTypes re-scans the table per column:\n$p")
  }

  test("decay attribution routes through the band-join sweep (q212)") {
    val p = plan("q212_decay_attribution")
    assert(p.contains("BandJoin"),
      s"touch-purchase pairing lost the sweep exec:\n$p")
  }

  test("column profiler reads its table exactly once (q213)") {
    val p = plan("q213_profile")
    assert("Scan ".r.findAllIn(p).size == 1,
      s"profiler re-scans the table per column:\n$p")
  }

  test("corpus datasheet is one scan + one Expand, not three GROUP BYs") {
    val p = plan("q198_corpus_datasheet")
    assert("Scan ".r.findAllIn(p).size == 1,
      s"datasheet re-scans the corpus per grain:\n$p")
    assert("Expand".r.findAllIn(p).size == 1)
    assert(!p.contains("Union"))
  }

  test("k-per-group sample is a bounded aggregate, not a window") {
    val p = plan("q203_group_sample")
    assert(!p.contains("Window"),
      s"group sample fell back to a per-group ranking window:\n$p")
    assert(p.contains("ObjectHashAggregate"))
  }

  test("item-CF joins its count tables by broadcast, never SMJ (q218)") {
    val p = plan("q218_item_cf")
    assert(!p.contains("SortMergeJoin"),
      s"per-item count join fell back to a shuffle join:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("basket lift joins its count tables by broadcast, never SMJ (q205)") {
    val p = plan("q205_basket_lift")
    assert(!p.contains("SortMergeJoin"),
      s"per-brand count join fell back to a shuffle join:\n$p")
  }

  test("bm25 never shuffles the token stream (q219)") {
    // the only exchanges allowed are the 1-row stats aggregate and
    // the global bounded top-k funnel — both SinglePartition; a
    // hash-partitioned exchange means the explode+groupBy shape of
    // doc-length/tf counting crept back in
    val p = plan("q219_bm25")
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"token-level shuffle in bm25:\n$p")
  }

  test("query likelihood never shuffles the token stream (q317)") {
    // same contract as q219: the only exchanges are the 1-row stats
    // aggregate and the bounded top-k funnel (both SinglePartition)
    val p = plan("q317_query_likelihood")
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"token-level shuffle in query likelihood:\n$p")
  }

  test("indexed bm25 reads only the query terms' postings (q222)") {
    val p = plan("q222_bm25_indexed")
    // the term filter must reach the postings parquet scan, and the
    // term-prefix partition filter must prune the directory layout
    assert(p.contains("PushedFilters") && p.contains("term"), p)
    assert(p.contains("PartitionFilters") && p.contains("tp"), p)
  }

  test("no partition-less window over unbounded input in the registry") {
    // a global Window.orderBy funnels EVERY input row into one task.
    // Allowed only where the input is provably bounded: a ranking over
    // an already-aggregated group table, a calendar spine, a k-row
    // model — named and justified here, everything else fails.
    val boundedInput: Set[String] = Set(
      // q159: running-max over the groupBy(price) DISTINCT-price
      // table (the skyline frontier is a sequential scan of the
      // sorted distinct domain, not of the fact)
      "q159_skyline",
      // q174: cumulative sum over the 31-row calendar spine
      "q174_cumulative_users",
      // q211: Kaplan-Meier cumulative windows over the per-day
      // aggregate (bounded by the observation span in days)
      "q211_kaplan_meier",
      // q250: row numbers over the daily order-count series —
      // calendar-bounded (≤ #days rows) whatever the fact volume
      "q250_acf",
      // q253/q270: global cumulative over the bounded bin histogram
      "q253_ks_drift", "q270_drift_sql",
      // q254: ROC cumulative over the <=65-row score-bin table
      "q254_roc_auc",
      // q256: row numbers over the calendar-bounded daily series
      "q256_trend",
      // q262: moving sums over the calendar-bounded monthly series
      "q262_seasonal",
      // q268: hazard prefix sums over the per-day lifetime aggregate
      "q268_nelson_aalen",
      // q269: LLR random walk over the calendar-bounded daily frame
      "q269_sprt",
      // q263/q271: split-candidate cumulative over the 64-bin table
      // (q271's side windows ARE partitioned; the root pass is not)
      "q263_decision_stump", "q271_tree2",
      // q274: cumulative totals over the distinct-length value frame
      // (bounded by the value domain, not the corpus)
      "q274_mann_whitney",
      // q279: rolling sums over the calendar-bounded daily series
      "q279_rolling_corr",
      // q281: lag frame over the calendar-bounded daily order-count
      // series (≤ #days rows regardless of fact volume, like q250)
      "q281_ar2",
      // q284: midrank prefix sums over the distinct-n_chars totals
      // frame — bounded by the value domain, not the corpus (q274's
      // k-group completion, same bounded shape)
      "q284_kruskal_wallis",
      // q293: row numbers over the calendar-bounded daily spine
      // (≤ #days rows regardless of fact volume, like q250/q281)
      "q293_ccf",
      // q301: q250's spine row numbers (calendar-bounded)
      "q301_pacf",
      // q310: at-risk suffix sums over the per-day survival frame —
      // bounded by the observation span in days (q268's shape)
      "q310_logrank",
      // q320/q321/q327: EWMA chart, Ljung-Box lag spine, MA-7
      // decomposition — all over the calendar-bounded daily series
      // (≤ #days rows regardless of fact volume, like q250)
      "q320_ewma_chart", "q321_ljung_box", "q327_seasonal_decomp",
      // q322/q330/q331: OLS residual lags, conformal residual ranks,
      // Kendall pair spine — over the ~80-row monthly series
      "q322_durbin_watson", "q330_conformal", "q331_kendall_tau",
      // q335: grand-median cumulative over the distinct-length
      // histogram — bounded by the value domain (q274's shape)
      "q335_mood_median",
      // q341/q343: lag/lead frames over the calendar-bounded daily
      // series; q342: monthly pairing + midranks over the
      // distinct-|d| histogram (value-domain-bounded)
      "q341_turning_points", "q342_signed_rank", "q343_mase",
      // q344: cumulative gains over the 10-row decile frame (the
      // fact-scale ranking runs through the distributed ntile);
      // q345: month spines of the unrolled ESD rounds
      "q344_gain_deciles", "q345_esd",
      // q346: q327's MA-7 windows over the calendar-bounded daily
      // series; q337: the monthly spine row numbers (q322's shape)
      "q346_seasonal_strength", "q337_partial_corr",
      // q347: prefix sums over the distinct-length histogram —
      // bounded by the value domain (q274's shape)
      "q347_energy_distance",
      // q348: the 1024-day spine row numbers (q250's shape)
      "q348_haar_wavelet",
      // q350: cumulative over the count-of-counts histogram —
      // bounded by the frequency-value domain (q274's shape);
      // q351: the distinct-length histogram cumulative (q347's shape)
      "q350_vocab_coverage", "q351_cvm",
      // q353: q343's lag frames over the calendar-bounded daily series
      "q353_diebold_mariano",
      // q382: the daily-spine row numbers (q250's shape)
      "q382_newey_west")
    val offenders = for {
      (name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
      if !boundedInput(name)
      if fn(spark, sfDir).queryExecution.optimizedPlan.collectFirst {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }.nonEmpty
    } yield name
    assert(offenders.isEmpty,
      s"partition-less Window (single-task sort) in: $offenders")
  }

  test("phonetic link broadcasts the clean roster into the block join") {
    val p = plan("q272_phonetic_link")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("ALS plans as equi-joins + map-side-combinable hash aggregates") {
    val p = plan("q275_als")
    // three half-steps = three ratings joins, each feeding a partial
    // (map-side) aggregate before the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 6, "missing partials")
    assert(!p.contains("CartesianProduct"))
  }

  test("image aHash is a shuffle-free map + one hash aggregate") {
    val p = plan("q278_image_ahash")
    // exactly two exchanges: the final aggregate's + the orderBy range
    assert("Exchange".r.findAllIn(p).size <= 3, p.take(2000))
  }

  test("no cartesian products in any registered query") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val p = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }

  test("nested-loop joins appear only where the build side is tiny") {
    // A BroadcastNestedLoopJoin is the scale cliff UNLESS its build
    // side is a bounded model/parameter relation (centroids, probe
    // sets, percentile rows, calendar spines — O(k) rows independent
    // of the corpus). Every query allowed to plan one is listed with
    // its bounded build side; anything new must justify itself here.
    val bounded = Set(
      "q101_ann_ivf", // sqrt(N) centroid rows + 10-query probe set
      "q179_knn_classify", // 16 centroid rows + held-out probe set
      "q196_bruteforce_topk", // 10-query probe set (documented one-off)
      "q54_ann_lsh", // multi-probe bucket spec per query row
      "q39_kmeans", "q177_cluster_sql", "q185_clusterer_sql", // k rows
      "q12_scalar_subquery", // 1-row scalar broadcast
      "q120_histogram", "q135_zipf_slope", // 1-row min/max bounds
      "q147_equidepth_hist", // #partitions-row offset table
      "q152_winsorize", // 5 percentile rows
      "q156_date_spine", "q174_cumulative_users", // calendar spine
      "q165_quality_bins", // quartile boundary rows
      "q170_quantile_norm", // per-rank reference distribution
      "q171_ols_residuals", // 1-row moment sums
      "q148_zscore_outliers", // 1-row global stats
      "q197_plot_sql", // 1-row x-range bounds
      "q08_cross_join", // deliberate tiny-dim cross (region x nation)
      "q98_lateral", // 1-row-per-key lateral spec
      "q17_values", "q61_sql_interface", "q68_pg_catalog",
      "q80_pg_attribute", // inline VALUES / catalog fixtures
      "q92_random_gen", "q94_approx_stats", // 1-row seeds/params
      "q117_cms_sketch", // 1-row aggregated sketch broadcast
      "q126_naive_bayes", "q181_model_sql", "q40_classify", // model rows
      "q434_impute_bayes_sql", // q126's 1-row total/vocab broadcasts
      "q137_chi_square", "q172_welch_t", // 1-2 row group stats
      "q209_ab_ztest", // 20-row per-source summary pair cross
      "q205_basket_lift", // 1-row basket total broadcast
      "q211_kaplan_meier", // 1-row corpus-end timestamp broadcast
      "q144_resample", // bounded time-grid spine
      "q154_bigram_pmi", "q175_unigram_surprisal", // vocab-sized tables
      "q162_psi_drift", // bin boundary rows
      "q163_pagerank", // 1-row node count per round
      "q173_benford", "q191_domain_mix", // 1-row corpus totals
      "q192_any_all", "q63_any_all", // 1-row ANY/ALL bounds
      "q53_cosine_topk", // single query vector
      "q220_hybrid_rrf", // 1-row query token-set + 1-row query embedding
      "q219_bm25", "q221_search_sql", // 1-row corpus stats broadcast
      "q317_query_likelihood", // 1-row corpus stats broadcast (q219 shape)
      "q222_bm25_indexed", // 1-row corpus stats broadcast
      // the drained-index BM25 search is q222's exact final plan
      // (1-row corpus stats broadcast over the pruned postings)
      "q403_stream_indexed_bm25",
      "q224_semdedup", // k centroid rows (the Lloyd loop's model)
      "q225_dsir_weights", // 1-row dense log-ratio array broadcast
      "q233_temperature_mix", // 1-row corpus total + weight normalizer
      "q240_ann_pq", // 1-row codebook broadcast + bounded query probe set
      // 1-row corpus token total + #partitions-row ntile offset table
      "q241_perplexity_buckets", "q247_perplexity_sql",
      "q242_pca", // d-row component loadings x 1-row trace
      "q250_acf", // 1-row global moment sums over a calendar-bounded series
      "q253_ks_drift", // 1-row min/max bounds + 1-row corpus total
      "q254_roc_auc", // 1-row P/N totals + 1-row AUC numerator
      "q256_trend", // calendar-bounded daily series non-equi self-join
      "q258_bfs", // 1-row BFS source broadcast
      "q263_decision_stump", // 1-row totals + 64-row exact-rational argmin
      "q264_doremi_weights", // 1-row corpus totals + 1-row normalizer
      "q267_bigram_ppl", // 1-row vocabulary-size broadcast
      "q268_nelson_aalen", // 1-row corpus-end timestamp broadcast
      "q310_logrank", // 1-row corpus-end timestamp broadcast (q268's shape)
      "q318_calibration", // 1-row test-half totals broadcast
      // 64-row bucket spine + 1-row-per-source dense completion —
      // feature-space-sized, independent of corpus volume
      "q319_js_divergence",
      "q269_sprt", // 1-row first-crossing day broadcast
      "q270_drift_sql", // 1-row bin-bounds + corpus-total broadcasts
      "q271_tree2", // 65-row exact-rational argmin anti-joins
      "q274_mann_whitney", // 1-row corpus total broadcast
      "q280_recommender_sql", // 1-row user factor broadcast
      "q284_kruskal_wallis", // 1-row rank-sum fold x 1-row tie correction
      "q289_cramers_v", // 1-row margin-total broadcast
      // 8x8 non-equi centroid pairs + 1-row index broadcast
      "q290_davies_bouldin",
      "q291_seq_patterns", "q295_seqpat_sql", // 1-row user total
      // the drained emissions collapse through q291's support
      // derivation — same 1-row user-total broadcast
      "q399_stream_seqpat_final",
      "q293_ccf", // 1-row global moment sums over the daily spine
      // 1-row global moment sums over the daily spine (q250's shape)
      "q382_newey_west",
      "q296_hll_overlap", // 5-row sketch frame non-equi self-join
      "q368_theta_setops", // 5-row sketch frame non-equi self-join
      "q372_reach_sql", // 5-row sketch frame non-equi self-join
      // calendar-bounded day-spine non-equi joins (24-row broadcast
      // onto the daily sketch frame / distinct user-day pairs)
      "q370_theta_rolling",
      // 10-row depth spine non-equi join over two 10-row rankings +
      // 1-row RBO broadcast
      "q374_rank_agreement",
      "q297_bandit_posterior", // 1-row trial-total broadcast
      // 1-row population-total + 1-row ATE broadcasts onto the
      // |strata|-row frame
      "q376_strat_ate",
      // 1-row totals/Rbar/variance broadcasts onto the |groups| frame
      "q380_jackknife",
      // 1-row moment/shrinkage broadcasts onto the |groups| frame
      "q381_james_stein",
      "q298_mutual_info", // 1-row total + 1-row entropy folds
      "q300_basket_triples", // 1-row order-total broadcast
      "q301_pacf", // 1-row moment sums + 1-row ACF pivot
      "q321_ljung_box", // 1-row moment sums over the daily spine
      "q324_hits", // 1-row L1-normalizing total per half-step (q163's shape)
      // 1-row edge-count + 1-row modularity-fold broadcasts over the
      // bounded community frame
      "q340_modularity",
      "q322_durbin_watson", // 1-row moment sums over the monthly spine
      "q325_cuped", // 1-row covariance moment sums broadcast
      "q327_seasonal_decomp", // 1-row centering-mean broadcast
      // 1-row totals/train-moments/quantile broadcasts over the
      // monthly spine
      "q330_conformal",
      // ~80-row monthly spine non-equi self-join (pairs are quadratic
      // only in the calendar-bounded frame, never the fact)
      "q331_kendall_tau",
      // 1-row grand-median + column-total broadcasts; the cumulative
      // runs on the value-domain histogram
      "q335_mood_median",
      // 20-row per-source summary non-equi pair join (q172's shape)
      "q336_effect_size",
      // 1-row month-count broadcast onto the bounded monthly spine
      "q342_signed_rank",
      // 1-row totals broadcast onto the 10-row decile frame (plus
      // the ntile offset table, q241's justified shape)
      "q344_gain_deciles",
      // 1-row moment/argmax broadcasts per unrolled ESD round
      "q345_esd",
      // q327's 1-row centering-mean broadcast reused
      "q346_seasonal_strength",
      // 1-row histogram-totals broadcast onto the value-domain frame
      "q347_energy_distance",
      // 1-row corpus-count broadcast onto the 6-row threshold frame
      "q349_dedup_thresholds",
      // 1-row token-total broadcast + the 3-row target non-equi join
      // onto the value-domain cumulative frame
      "q350_vocab_coverage",
      // 1-row sample-size broadcast onto the value-domain frame
      "q351_cvm",
      // 1-row global min/max broadcast onto the fact for the shared
      // bin grid (the q197 binSeries shape; layered/faceted planning
      // keeps the same single bounded crossJoin)
      "q360_plot_layers", "q361_plot_facets",
      // same 1-row min/max bin-grid broadcast for the box/ribbon
      // distribution geoms
      "q384_plot_box_sql", "q385_plot_ribbon_sql",
      // the 2D histogram's 1-row four-bound broadcast (binSeries'
      // justified shape, both axes at once)
      "q419_plot_heatmap_sql",
      // the same q197 1-row min/max bin-grid broadcast — POSITION
      // STACK reuses the binSeries planning frame verbatim
      "q444_plot_stack_sql",
      // the same 1-row min/max broadcast — the aesthetics lane adds
      // avg columns to the SAME aggregate (PlotRenderSpec pins the
      // single-aggregate shape)
      "q454_plot_aes_sql",
      // 1-row index-listing row x 1-row lookup-count aggregate — the
      // catalog-surface crossJoin is bounded by construction
      "q426_create_index_sql"
    )
    val offenders = for {
      (name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
      if !bounded(name)
      if fn(spark, sfDir).queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin")
    } yield name
    assert(offenders.isEmpty,
      s"unjustified BroadcastNestedLoopJoin in: ${offenders.mkString(", ")}")
  }
}
