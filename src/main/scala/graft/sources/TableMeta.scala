package graft.sources

import scala.collection.concurrent.TrieMap

import java.util.WeakHashMap

import org.apache.spark.sql.SparkSession

/** Session registry for explicitly declared table schemas (reference:
  * sql/parser/SqlCudParser.scala:137-175 tableExplicitDef / tableKeys
  * — CREATE TABLE with column definitions, PRIMARY KEY and REFERENCES
  * constraints; sql/objects/Table.scala carries the key metadata that
  * objects/DescribeObject.scala renders). Spark has no enforced key
  * constraints, so the declarations are METADATA: they type the
  * table, document its keys, and surface through GRAFT DESCRIBE
  * TABLE — the contract a sclera user migrating DDL expects. */
object TableMeta {

  /** One declared column: name, Spark DDL type text, and its key
    * role — "primary" for PRIMARY KEY members, "references t(c)" for
    * foreign keys, "" otherwise. */
  final case class ColumnDef(name: String, typeDdl: String, key: String)

  final case class TableDef(name: String, columns: Seq[ColumnDef])

  private val store =
    new WeakHashMap[SparkSession, TrieMap[String, TableDef]]()

  private def map(spark: SparkSession): TrieMap[String, TableDef] =
    store.synchronized {
      var m = store.get(spark)
      if (m == null) {
        m = TrieMap.empty[String, TableDef]
        store.put(spark, m)
      }
      m
    }

  def put(spark: SparkSession, d: TableDef): Unit =
    map(spark).put(d.name.toLowerCase, d)

  def get(spark: SparkSession, name: String): Option[TableDef] =
    map(spark).get(name.toLowerCase)

  def drop(spark: SparkSession, name: String): Boolean =
    map(spark).remove(name.toLowerCase).isDefined

  def list(spark: SparkSession): Seq[TableDef] =
    map(spark).values.toSeq.sortBy(_.name)
}
