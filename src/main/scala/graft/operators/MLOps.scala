package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window


/** ML relational operators (reference: analytics/ml — CLASSIFIED WITH /
  * CLUSTERED WITH / IMPUTED), re-expressed as iterative DataFrame
  * programs: models are tiny DataFrames (k centroids), broadcast into
  * scoring joins; training data never leaves the executors.
  */
object MLOps {

  /** Per-label centroids of an embedding column: explode to
    * (label, dim, v), average, re-assemble ordered arrays. */
  def centroids(df: DataFrame, labelCol: String): DataFrame =
    df.select(col(labelCol).as("c_label"),
      posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("c_label"), col("dim"))
      .agg(avg(col("v")).as("cv"))
      .groupBy(col("c_label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("cv"))))
        .as("_pairs"))
      .select(col("c_label"),
        transform(col("_pairs"), p => p.getField("cv")).as("centroid"))

  /** Nearest-centroid assignment: broadcast the centroid table, score
    * every vector against k centroids with the native codegen
    * graft_dist_sq (an interpreted zip_with/aggregate fold here costs
    * ~100x on the vectors-times-k hot path), keep the argmin
    * (deterministic tie-break on label). */
  def assign(vectors: DataFrame, cents: DataFrame): DataFrame = {
    graft.plans.VectorExpressions.register(vectors.sparkSession)
    // argmin as a min_by hash aggregation (map-side partials, no
    // per-partition sort) instead of a row_number window; (d2,
    // c_label) is unique per vector so the result is deterministic.
    val outCols = vectors.columns.toSeq :+ "c_label" :+ "d2"
    vectors.crossJoin(broadcast(cents))
      .withColumn("d2", expr("graft_dist_sq(centroid, embedding)"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(outCols.map(col): _*),
        struct(col("d2"), col("c_label"))).as("_best"))
      .select(col("_best.*"))
  }

  /** Lloyd k-means: deterministic init (lowest vec_ids), `iters`
    * assign/update rounds. Each round is one shuffle (the centroid
    * update groupBy); the k-centroid model is broadcast — the loop is
    * driver-side control flow over distributed data, never data on the
    * driver. */
  def kmeans(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    // every Lloyd round re-reads the vectors (iters+1 scans of the
    // 100-TB side without this) — cache them once up front
    val vecs = vectors.persist()
    val model = trainKmeans(vecs, k, iters)
    val out = assign(vecs, model)
      .select(col("vec_id"), col("c_label").as("cluster"),
        round(sqrt(col("d2")), 6).as("dist"))
    // training is done (model counted); the input + model caches now
    // only serve the caller's single consuming action — scope them to
    // it so they don't leak into the LRU store
    CacheScope.scoped(vecs)
    CacheScope.scoped(model)
    out
  }

  /** The trained k-means model alone — (c_label, centroid) after
    * `iters` Lloyd rounds — for the named-model registry
    * (GRAFT CREATE CLUSTERER): train once, score many by name. The
    * returned model STAYS cached (it is catalog state, dropped via
    * GRAFT DROP); the training input's cache is released here. */
  def kmeansModel(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    val vecs = vectors.persist()
    val m = trainKmeans(vecs, k, iters)
    vecs.unpersist(blocking = false) // model materialized; input done
    m
  }

  /** `iters` Lloyd rounds over an already-persisted input; returns the
    * k-row model, persisted and materialized. */
  private def trainKmeans(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    // deterministic init: the k lowest vec_ids. A partition-local
    // filter (ids are dense from 0), not a global-sort row_number —
    // the all-rows sort would serialize on one task at corpus scale.
    var cents = vecs
      .where(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("c_label"),
        transform(col("embedding"), v => v.cast("double")).as("centroid"))
    var i = 0
    var prev: DataFrame = null
    while (i < iters) {
      val assigned = assign(vecs, cents)
        .select(col("vec_id"), col("embedding"), col("c_label"))
      // materialize the k-row model each round: without this, round
      // i's broadcast lazily re-executes rounds 1..i-1 (the cents
      // lineage nests one full assign+update per iteration)
      cents = centroids(
        assigned.withColumnRenamed("c_label", "cluster"), "cluster")
        .persist()
      cents.count()
      if (prev != null) prev.unpersist()
      prev = cents
      i += 1
    }
    cents
  }

  /** IMPUTED (reference sql/parser IMPUTED clause): fill nulls in
    * `valueCol` with the per-key mean. Adds `<col>_was_missing` and
    * `<col>_imputed`; one window pass per key. */
  def imputeMean(
      df: DataFrame, valueCol: String, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    df.withColumn(s"${valueCol}_was_missing", col(valueCol).isNull)
      .withColumn(s"${valueCol}_imputed",
        coalesce(col(valueCol), avg(col(valueCol)).over(w)))
  }

  /** TYPEINFER (reference analytics/infer): vote on the type of every
    * STRING column by try-cast counts over the whole column. Integer
    * detection is a regex, not try_cast — engines disagree on whether
    * '87.5' casts to INT (q41's documented rationale). */
  def inferTypes(df: DataFrame): DataFrame = {
    val strCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).toSeq
    require(strCols.nonEmpty, "inferTypes: no string columns")
    // ONE aggregation pass computes every column's counters side by
    // side (a union of per-column df.agg would re-scan the table once
    // per string column); the single counter row then unstacks into
    // one row per column — driver-free, |cols|x4 aggregate state.
    val aggs = strCols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__n"),
      count(when(col(c).rlike("^-?[0-9]+$"), 1)).as(s"${c}__i"),
      count(expr(s"try_cast(`$c` AS DOUBLE)")).as(s"${c}__d"),
      count(expr(s"try_cast(`$c` AS DATE)")).as(s"${c}__t"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(strCols.map { c =>
        struct(lit(c).as("col_name"),
          col(s"${c}__n").as("n_nonnull"),
          col(s"${c}__i").as("n_int"),
          col(s"${c}__d").as("n_double"),
          col(s"${c}__t").as("n_date"))
      }: _*)).as("s"))
      .select(col("s.*"))
      .withColumn("inferred",
        when(col("n_int") === col("n_nonnull"), "int")
          .when(col("n_double") === col("n_nonnull"), "double")
          .when(col("n_date") === col("n_nonnull"), "date")
          .otherwise("string"))
  }
}
