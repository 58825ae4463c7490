package graft

import java.util.Locale

/** Benchmark entrypoint (driver contract).
  *
  * Prints ONE short JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * All `SparkEntry.queries` are timed; `value` sums ONLY queries that
  * ran successfully — a query that throws is recorded in `n_err` (and
  * by name in target/bench_full.json), never as a fake fast timing.
  * The per-query `queries` map reports only the HEADLINE subset below:
  * the driver captures just a 2000-char tail of the build output, so
  * the full per-query map would push the line start out of the capture
  * window (rounds 1-2 "parsed": null).
  */
object Bench {
  /** Representative queries across the operator categories.
    *
    * HARD SIZE BUDGET: the driver captures only a ~2000-char tail of
    * the build output; the round-6 headline set (116 entries) pushed
    * the contract line past the window and the official artifact
    * parsed as null. ~27 chars/entry + ~140 chars of fixed fields
    * means the set must stay UNDER 60 entries (enforced below). Full
    * per-query timings always land in target/bench_full.json. */
  private val headline: Set[String] = Set(
    "q01_pricing_summary", "q03_join_agg", "q10_star_join",
    "q30_window_funcs", "q33_align_asof", "q35_seq_match",
    "q39_kmeans", "q47_sessionize", "q48_dedup_exact",
    "q49_dedup_minhash", "q50_dedup_simhash", "q51_ngram_jaccard",
    "q53_cosine_topk", "q54_ann_lsh", "q60_multimodal",
    "q70_pipeline_e2e", "q76_tfidf", "q99_dedup_clusters",
    "q101_ann_ivf", "q112_heavy_hitters", "q118_bloom_prune",
    "q126_naive_bayes", "q145_funnel", "q151_session_window",
    "q153_band_join", "q163_pagerank", "q164_federated_join",
    "q199_ppjoin", "q205_basket_lift", "q218_item_cf",
    "q219_bm25", "q222_bm25_indexed", "q224_semdedup",
    "q228_dtw_align", "q231_jdbc_federated", "q240_ann_pq",
    "q242_pca", "q243_containment", "q245_communities",
    "q248_filter_funnel", "q251_dbscan", "q258_bfs",
    "q275_als", "q276_shortest_path", "q290_davies_bouldin",
    "q303_kalman", "q304_holt_winters", "q305_smooth_sql",
    "q308_binseg", "q314_manifest_scan", "q320_ewma_chart",
    "q324_hits", "q332_ewma_sql", "q333_bloom_lookup",
    "q340_modularity", "q347_energy_distance",
    "q357_fed_agg_pushdown", "q358_fed_join_pushdown",
    "q368_theta_setops", "q369_fed_writeback", "q371_rec_eval",
    "q374_rank_agreement")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.session(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    // warm up the session (codegen, parquet reader, shuffle machinery)
    // so the first measured query isn't charged the ~3s JVM/session
    // init; then time queries in stable name order.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try SparkEntry.queries.head._2(spark, sfDir).count()
    catch { case _: Throwable => () }
    val benchStart = System.nanoTime()
    var nSinceGc = 0
    def elapsed: Double = (System.nanoTime() - benchStart) / 1e9
    /** Some(seconds) on success, None if the query threw. */
    def timeOne(fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): Option[Double] = {
      // Queries persist() shared subtrees internally; drop cached
      // blocks between queries so storage memory doesn't accumulate
      // across the run and inflate late queries (untimed).
      spark.catalog.clearCache()
      // untimed GC so the ContextCleaner can unpersist dead broadcast
      // blocks from PRIOR queries — otherwise ~100 queries in, every
      // run hits an accumulated-memory stall that charges a random
      // query 10-30s (observed; never reproduces in isolation)
      nSinceGc += 1
      if (nSinceGc >= 8) { System.gc(); nSinceGc = 0 }
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case _: Throwable => None }
    }
    // SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the run — the dev-loop
    // scale-probe hook (time a new operator at two sfs without paying
    // for the whole registry). Unset = the full registry, the
    // driver's configuration.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Calibration sentinel against MACHINE WEATHER: the official
    // artifact has repeatedly recorded contended-box noise as engine
    // timings (r8/r9 verdicts: 2-5x inflated heavy-tail entries that
    // never reproduce). A fixed cheap query (q01) re-timed every
    // SentinelEvery measurements detects the contention window: if
    // the sentinel drifts past 2x its quiet-start baseline, every
    // query measured since the previous check is flagged and gets a
    // retry at the end (budget permitting). `flagged_stale` reports
    // how many survived without a clean re-measure.
    val sentinelName = "q01_pricing_summary"
    val sentinelFn = SparkEntry.queries.get(sentinelName)
    def sentinelSec(): Double = sentinelFn.map { fn =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => 0.0 }
    }.getOrElse(0.0)
    val sentinelBase = {
      val a = sentinelSec(); val b = sentinelSec()
      math.max(math.min(a, b), 1e-3)
    }
    val SentinelEvery = 30
    val flagged = scala.collection.mutable.Set.empty[String]
    var window = List.empty[String]
    var contendedChecks = 0
    // a contended flush flags every query the window measured; a
    // CLEAN flush clears its members' earlier flags (a clean re-
    // measure in a later pass supersedes a contended one) — queries
    // left in an unflushed window keep whatever flag they carry
    def sentinelTick(name: String): Unit = {
      window = name :: window
      if (window.length >= SentinelEvery) {
        if (sentinelSec() > 2.0 * sentinelBase) {
          flagged ++= window
          contendedChecks += 1
        } else flagged --= window
        window = Nil
      }
    }
    val pass1 = ordered.map { case (name, fn) =>
      val t = timeOne(fn); sentinelTick(name); name -> t
    }
    // Second pass, best-of-two: a 200-query run in one JVM hits
    // stop-the-world GC / codegen-compilation pauses on RANDOM queries
    // (observed 2-30x spikes that never reproduce in isolation); the
    // min of two runs measures the operator, not the pause. Bounded by
    // a wall-clock budget so the driver's harness never waits on a
    // doubled run. Queries that FAILED pass 1 are not retried (their
    // failure is the result).
    System.gc()
    // Budget scales with what pass 1 actually cost: a fixed default
    // (780 in r8, 1600 in r10) has repeatedly fallen behind registry
    // growth + box contention, leaving the official artifact with
    // single-pass cold-run noise in its heavy tail (r10: two_pass=419
    // of 449). The second pass needs roughly sum(pass1) again; 1.3x
    // headroom + 120s slack absorbs GC pauses and the targeted third
    // pass. Floor 1600 keeps quiet-box behavior unchanged; cap 3600
    // bounds the harness wait. SPARK_GRAFT_BENCH_BUDGET_S overrides.
    val pass1Times = pass1.collect { case (_, Some(v)) => v }
    val budget = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_S").map(_.toDouble)
      .getOrElse(math.min(3600.0,
        math.max(1600.0, elapsed + pass1Times.sum * 1.3 + 120.0)))
    // Record how many passes each query actually got: best-of-two
    // stops when the wall budget runs out, and a report mixing 1- and
    // 2-pass timings must say which is which (methodology field).
    // Retry order = SLOWEST pass-1 first: with ~300 queries the budget
    // no longer covers a full second pass, and a GC/codegen pause adds
    // seconds to a slow query but only milliseconds to a fast one —
    // spending the remaining budget on the worst offenders first
    // removes the most noise per second of budget.
    val retryOrder = ordered.zip(pass1).collect {
      case ((name, _), (_, Some(v1))) => name -> v1
    }.sortBy(-_._2).map(_._1).zipWithIndex.toMap
    val pass2 = ordered.zip(pass1)
      .sortBy { case ((name, _), _) =>
        retryOrder.getOrElse(name, Int.MaxValue)
      }
      .map { case ((name, fn), (_, t1)) =>
        t1 match {
          case None => (name, None: Option[Double], 0)
          case Some(v1) if elapsed < budget =>
            timeOne(fn) match {
              case Some(v2) =>
                sentinelTick(name) // clean flushes clear member flags
                (name, Some(math.min(v1, v2)), 2)
              case None => (name, Some(v1), 1) // flaky 2nd run: keep pass 1
            }
          case Some(v1) => (name, Some(v1), 1)
        }
      }
    // Third targeted pass: queries whose every measurement fell in a
    // contended window get one more attempt in (presumably) quieter
    // end-of-run conditions; whatever remains flagged is reported.
    val results = pass2
      .map { case (name, t, p) =>
        if (t.isDefined && flagged.contains(name) && elapsed < budget) {
          val fn = SparkEntry.queries(name)
          timeOne(fn) match {
            case Some(v3) if sentinelSec() <= 2.0 * sentinelBase =>
              flagged -= name
              (name, Some(math.min(t.get, v3)), p + 1)
            case Some(v3) => (name, Some(math.min(t.get, v3)), p + 1)
            case None => (name, t, p)
          }
        } else (name, t, p)
      }
      .sortBy(_._1)
    // Locale.ROOT: a comma-decimal default locale would emit 0,348
    // and break the driver's JSON parse.
    def f3(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))
    val ok = results.collect { case (n, Some(v), p) => (n, v, p) }
    val errs = results.collect { case (n, None, _) => n }
    val total = ok.map(_._2).sum
    val twoPass = ok.count(_._3 == 2)
    // A budget-cut run must SELF-DESCRIBE which timings are single-pass
    // (cold-run noise candidates): name them in the contract line so a
    // reader never has to guess which tail entries to distrust. Capped
    // at 12 names (+ count) to protect the 2000-char capture window.
    val singlePass = ok.collect { case (n, _, 1) => n }
    val singlePassField =
      if (singlePass.isEmpty) ""
      else {
        val shown = singlePass.take(12).map("\"" + _ + "\"").mkString(",")
        s""","n_single_pass":${singlePass.size},"single_pass":[$shown]"""
      }
    def mkLine(entries: Seq[String]): String = {
      val qs = entries.mkString("{", ",", "}")
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${ok.size},"n_err":${errs.size},"two_pass":$twoPass,"contended_windows":$contendedChecks,"flagged_stale":${flagged.size}$singlePassField,"queries":$qs,"sf":"$sfDir"}"""
    }
    // Enforce the driver's ~2000-char tail capture: if the headline
    // map would push the line past it, drop trailing entries until it
    // fits — a shorter queries map beats an unparseable artifact.
    var qsEntries = ok
      .filter(r => if (only.isDefined) true else headline(r._1))
      .map { case (k, v, _) => "\"" + k + "\":" + f3(v) }
    var line = mkLine(qsEntries)
    while (line.length > 1900 && qsEntries.nonEmpty) {
      qsEntries = qsEntries.init
      line = mkLine(qsEntries)
    }
    // Full per-query timings + pass counts + failures for the local
    // perf loop (file, not stdout: the stdout line must stay inside
    // the driver's capture window).
    val full = results
      .map {
        case (k, Some(v), p) =>
          "\"" + k + "\":{\"sec\":" + f3(v) + ",\"passes\":" + p + "}"
        case (k, None, _) => "\"" + k + "\":{\"err\":true}"
      }
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_full.json"), full)
    // The contract line also lands in target/bench.json so the driver
    // (or anyone) can read it without scraping build output.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench.json"), line + "\n")
    // Print the contract line LAST, after spark.stop() — nothing
    // (shutdown WARNs included) lands between it and the end of the
    // build output, keeping the driver's tail capture clean.
    spark.stop()
    println(line)
  }
}
