package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-loop scale probe: build a 10x (sf1-equivalent) corpus from
  * sf0.1 and time the suite's tail queries on both, printing the
  * scaling ratio per query.
  *
  * The 10x corpus is C key-shifted copies with PER-COPY-DISJOINT
  * vocabularies — the scaling semantics of "10 more shards of similar
  * data", NOT "every row cloned 10 times" (clones would make every
  * near-dup/similarity query quadratically denser by construction of
  * the data, which measures nothing about the engine):
  *   - lineitem: l_orderkey and l_partkey shifted per copy (same
  *     per-basket structure, 10x baskets, 10x item vocabulary);
  *   - documents: doc_id shifted, every token prefixed with the copy
  *     tag (cross-copy Jaccard 0, within-copy pair density as sf0.1);
  *   - embeddings: vec_id shifted, the vector rotated by copy index
  *     (norms/distribution preserved, cross-copy cosine decorrelated).
  *
  * Usage: runMain graft.ScaleProbe [queries] — builds (or reuses)
  * /tmp/graft_sf1_probe and times each query best-of-two at sf0.1 and
  * at the probe. The default list is the round's five slowest.
  */
object ScaleProbe {

  private val Copies = 10

  def build(spark: SparkSession, sfDir: String, out: String): Unit = {
    // versioned marker: v2 added events.parquet, v3 the verbatim
    // dimension copies — a probe dir built before that must rebuild,
    // or scale runs touching those tables fail on a missing path
    val done = new java.io.File(s"$out/_PROBE_READY_v3")
    if (done.exists()) return
    new java.io.File(out).mkdirs()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val maxOk = li.agg(max("l_orderkey")).head().getLong(0) + 1
    val maxPk = li.agg(max("l_partkey")).head().getLong(0) + 1
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    val dim = emb.select(size(col("embedding"))).head().getInt(0)

    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until Copies).map(c => f(df, c)).reduce(_ unionAll _)

    copies(li) { (d, c) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(c * maxOk))
        .withColumn("l_partkey", col("l_partkey") + lit(c * maxPk))
    }.repartition(32).write.mode("overwrite")
      .parquet(s"$out/lineitem.parquet")

    copies(docs) { (d, c) =>
      d.withColumn("doc_id", col("doc_id") + lit(c * maxDoc))
        .withColumn("text", array_join(
          transform(split(col("text"), "\\s+"),
            t => concat(lit(s"c${c}x"), t)), " "))
    }.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    copies(emb) { (d, c) =>
      val rot =
        if (c == 0) col("embedding")
        else concat(
          slice(col("embedding"), c + 1, dim - c),
          slice(col("embedding"), 1, c))
      d.withColumn("vec_id", col("vec_id") + lit(c * maxVec))
        .withColumn("embedding", rot)
    }.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    // events: event_id and user_id shifted per copy — 10x users with
    // sf0.1-length per-user histories (the 100-TB shape: more
    // entities, not longer streams), so per-key streaming state and
    // ordered windows stay bounded while key cardinality scales
    // through the Tables accessor: the testdata ships ts as
    // TIMESTAMP(NANOS), which needs the nanosAsLong conf + the
    // normalize-to-TimestampType branch a raw read lacks
    val ev = Tables(spark, sfDir).events
    val maxEv = ev.agg(max("event_id")).head().getLong(0) + 1
    val maxUs = ev.agg(max("user_id")).head().getLong(0) + 1
    copies(ev) { (d, c) =>
      d.withColumn("event_id", col("event_id") + lit(c * maxEv))
        .withColumn("user_id", col("user_id") + lit(c * maxUs))
    }.repartition(32).write.mode("overwrite")
      .parquet(s"$out/events.parquet")

    // dimension tables copy verbatim (the 100-TB shape: facts scale,
    // dims don't) — registerAll() over the probe dir needs every
    // table present
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders")) {
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }

    done.createNewFile()
  }

  private def time(spark: SparkSession, name: String,
      dir: String): Double = {
    def once(): Double = {
      // Bench's cache hygiene: queries persist shared subtrees and
      // register model caches — without dropping them between
      // measurements, storage pressure from EARLIER panel queries
      // charges a later query's reading (observed: a stream-stream
      // drain 3x slower mid-panel than in a fresh session)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q199_ppjoin", "q300_basket_triples", "q218_item_cf",
        "q235_bpe_tokenize", "q338_kcore",
        // round-8/9 additions: the 4-6s cluster in the clean bench
        // run plus the new stream-stream drains
        "q280_recommender_sql", "q238_logistic_quality",
        "q399_stream_seqpat_final", "q408_stream_pipeline_final",
        "q427_stream_ssjoin_final", "q428_stream_ssouter_final")
    val sfDir = "/root/testdata/sf0.1"
    val probe = "/tmp/graft_sf1_probe"
    val spark = Engine.session(
      master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, sfDir, probe)
    for (n <- names) {
      val t01 = time(spark, n, sfDir)
      val t1 = time(spark, n, probe)
      println(f"[probe] $n sf0.1=$t01%.2fs sf1=$t1%.2fs " +
        f"ratio=${t1 / t01}%.1fx")
    }
    spark.stop()
  }
}
