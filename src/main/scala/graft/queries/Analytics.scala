package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.MLOps

/** ML relational operators over the embeddings table (reference:
  * analytics/ml classifier/clusterer). */
object Analytics {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CLUSTERED WITH — deterministic Lloyd k-means (k=8, 3 iterations,
    // lowest-vec_id init). Cluster sizes summarized for stability.
    "q39_kmeans" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      MLOps.kmeans(t.embeddings, k = 8, iters = 3)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("dist")), 4).as("avg_dist"))
        .orderBy(col("cluster"))
    },

    // CLASSIFIED WITH — nearest-centroid classifier: train on
    // vec_id % 5 != 0, score the held-out fold.
    "q40_classify" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val train = t.embeddings.where(col("vec_id") % 5 =!= 0)
      val test = t.embeddings.where(col("vec_id") % 5 === 0)
      val cents = MLOps.centroids(train, "label")
      MLOps.assign(test, cents)
        .select(col("vec_id"), col("label").as("actual"),
          col("c_label").as("predicted"))
        .withColumn("correct", col("actual") === col("predicted"))
        .orderBy(col("vec_id"))
    }
  )

  /** Nearest-centroid is oracle-expressible: per-label per-dim AVG,
    * argmin of squared L2 — identical algebra in DuckDB. */
  def oracle: Map[String, String] = Map(
    "q40_classify" ->
      """WITH train AS (SELECT * FROM embeddings WHERE vec_id % 5 <> 0),
        |test AS (SELECT * FROM embeddings WHERE vec_id % 5 = 0),
        |expl AS (SELECT label AS c_label,
        |    generate_subscripts(embedding, 1) - 1 AS dim,
        |    unnest(embedding) AS v FROM train),
        |cent AS (SELECT c_label, dim, AVG(v) AS cv FROM expl
        |  GROUP BY c_label, dim),
        |cvec AS (SELECT c_label,
        |    list(cv ORDER BY dim) AS centroid FROM cent GROUP BY c_label),
        |scored AS (SELECT t.vec_id, t.label AS actual, c.c_label,
        |    list_sum(list_transform(list_zip(c.centroid, t.embedding),
        |      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
        |         * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS d2
        |  FROM test t CROSS JOIN cvec c),
        |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |    ORDER BY d2, c_label) AS rk FROM scored)
        |SELECT vec_id, actual, c_label AS predicted,
        |  actual = c_label AS correct
        |FROM ranked WHERE rk = 1 ORDER BY vec_id""".stripMargin
  )
}
