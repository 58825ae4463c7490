package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

import java.util.WeakHashMap

/** Session registry for unified index objects (reference:
  * sql/statements/SqlStatement.scala:164-175 — SqlCreateIndex /
  * SqlDropIndex route index DDL per location). graft lowers the one
  * statement two ways: file locations get a per-file Bloom manifest
  * (FileManifest.buildBloom — the lakehouse "index"), attached JDBC
  * catalogs get real vendor CREATE INDEX DDL through the GRAFT NATIVE
  * runtime lane. This registry carries the metadata GRAFT LIST
  * INDEXES / LIST OBJECTS render; keyed weakly by session (the
  * SessionViews discipline).
  */
object IndexRegistry {

  /** `kind` is "bloom" (file layout; `detail` = manifest dir) or
    * "remote" (attached catalog; `detail` = catalog name). */
  final case class IndexDef(name: String, kind: String, target: String,
      keyCol: String, detail: String)

  private val store =
    new WeakHashMap[SparkSession, TrieMap[String, IndexDef]]()

  private def map(spark: SparkSession): TrieMap[String, IndexDef] =
    store.synchronized {
      var m = store.get(spark)
      if (m == null) {
        m = TrieMap.empty[String, IndexDef]
        store.put(spark, m)
      }
      m
    }

  def put(spark: SparkSession, d: IndexDef): Unit =
    map(spark).put(d.name.toLowerCase, d)

  def get(spark: SparkSession, name: String): Option[IndexDef] =
    map(spark).get(name.toLowerCase)

  def drop(spark: SparkSession, name: String): Boolean =
    map(spark).remove(name.toLowerCase).isDefined

  def list(spark: SparkSession): Seq[IndexDef] =
    map(spark).values.toSeq.sortBy(_.name)
}
