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

  /** All committed versions in order (gaps allowed after VACUUM). */
  def versions(root: String): Seq[Int] = {
    val d = new File(root)
    Option(d.list()).getOrElse(Array.empty[String])
      .collect {
        case n if n.matches("v\\d+") &&
          new File(new File(d, n), "_SUCCESS").exists() => n.drop(1).toInt
      }.sorted.toSeq
  }

  /** Highest committed version, or -1 if none. */
  def latestVersion(root: String): Int =
    versions(root).lastOption.getOrElse(-1)

  /** Commit `df` as the next version; returns its version number.
    * Writers racing on the same root serialize on the JVM lock (the
    * cluster story is the usual table-format conditional commit). */
  def commit(root: String, df: DataFrame): Int = synchronized {
    val v = latestVersion(root) + 1
    df.write.mode("overwrite").parquet(vdir(root, v).toString)
    v
  }

  /** Idempotent commit for at-least-once writers (streaming
    * foreachBatch): if a committed version already carries `tag`,
    * return it instead of committing again. The snapshot is staged
    * (with the tag file INSIDE) and renamed into place, so version
    * visibility and the tag are one atomic event — there is no crash
    * window where the data committed but the tag did not. */
  def commitTagged(root: String, df: DataFrame, tag: String): Int =
    synchronized {
      taggedVersion(root, tag).getOrElse {
        val v = latestVersion(root) + 1
        val stage = new File(root, s"_staging_v$v")
        df.write.mode("overwrite").parquet(stage.toString)
        java.nio.file.Files.writeString(
          new File(stage, "_tag").toPath, tag)
        java.nio.file.Files.move(stage.toPath, vdir(root, v).toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        v
      }
    }

  /** The committed version carrying `tag`, if any. */
  def taggedVersion(root: String, tag: String): Option[Int] =
    versions(root).find { v =>
      val f = new File(vdir(root, v), "_tag")
      f.exists() &&
        java.nio.file.Files.readString(f.toPath) == tag
    }

  /** Time-travel read of a pinned version. */
  def read(spark: SparkSession, root: String, version: Int): DataFrame = {
    require(new File(vdir(root, version), "_SUCCESS").exists(),
      s"version $version does not exist under $root")
    spark.read.parquet(vdir(root, version).toString)
  }

  /** Version log: (version, n_rows) for every committed snapshot
    * still present (vacuumed versions drop out of the log). */
  def history(spark: SparkSession, root: String): DataFrame = {
    versions(root).map { v =>
      read(spark, root, v)
        .agg(lit(v).as("version"), count(lit(1)).as("n_rows"))
    }.reduce(_ unionByName _)
  }

  /** Delete every version older than the newest `keep` (the Delta
    * VACUUM discipline: time travel keeps a bounded horizon, storage
    * is reclaimed; the version counter keeps advancing — vacuumed
    * numbers are never reused). Returns the deleted versions. */
  def vacuum(root: String, keep: Int): Seq[Int] = synchronized {
    require(keep >= 1, s"keep $keep must be >= 1")
    val vs = versions(root)
    val victims = vs.dropRight(keep)
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(rm)
      f.delete(); ()
    }
    victims.foreach(v => rm(vdir(root, v)))
    victims
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
