package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal versioned-table layer: immutable parquet snapshots
  * `v0, v1, ...` under one root, giving copy-on-write DML (q129) a
  * history — time-travel reads, version log, and version diff. This
  * is the table-format commit discipline (Delta/Iceberg-style
  * snapshot isolation, reduced to its Spark-native core: every commit
  * is an append-only directory, readers pin a version, nothing is
  * ever rewritten in place). The reference has no versioning surface;
  * at 100 TB it is what makes concurrent readers + curation rewrites
  * safe, so graft treats it as first-class.
  *
  * Layout: `<root>/v<N>/` parquet per version; a version exists iff
  * its `_SUCCESS` marker does (Spark's own atomic-ish commit marker),
  * so a killed writer never exposes a half-written snapshot.
  */
object VersionedTable {

  private def vdir(root: String, v: Int): File =
    new File(root, s"v$v")

  /** Highest committed version, or -1 if none. */
  def latestVersion(root: String): Int = {
    var v = -1
    while (new File(vdir(root, v + 1), "_SUCCESS").exists()) v += 1
    v
  }

  /** Commit `df` as the next version; returns its version number.
    * Writers racing on the same root serialize on the JVM lock (the
    * cluster story is the usual table-format conditional commit). */
  def commit(root: String, df: DataFrame): Int = synchronized {
    val v = latestVersion(root) + 1
    df.write.mode("overwrite").parquet(vdir(root, v).toString)
    v
  }

  /** Time-travel read of a pinned version. */
  def read(spark: SparkSession, root: String, version: Int): DataFrame = {
    require(new File(vdir(root, version), "_SUCCESS").exists(),
      s"version $version does not exist under $root")
    spark.read.parquet(vdir(root, version).toString)
  }

  /** Version log: (version, n_rows) for every committed snapshot. */
  def history(spark: SparkSession, root: String): DataFrame = {
    val latest = latestVersion(root)
    (0 to latest).map { v =>
      read(spark, root, v)
        .agg(lit(v).as("version"), count(lit(1)).as("n_rows"))
    }.reduce(_ unionByName _)
  }

  /** Row-level diff between two versions on a key column: one full
    * outer join -> added / removed / changed / unchanged status per
    * key (changed = any non-key column differs, compared through a
    * canonical string form). */
  def diff(spark: SparkSession, root: String, keyCol: String,
      fromV: Int, toV: Int): DataFrame = {
    val a = read(spark, root, fromV)
    val b = read(spark, root, toV)
    val cols = a.columns.filter(_ != keyCol).sorted
    def fp(df: DataFrame) = df.select(col(keyCol).as("k"),
      concat_ws("", cols.map(c => col(c).cast("string")): _*)
        .as("fp"))
    fp(a).withColumnRenamed("fp", "fp_a")
      .join(fp(b).withColumnRenamed("fp", "fp_b"), Seq("k"), "full_outer")
      .select(col("k"),
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
