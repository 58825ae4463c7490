package graft

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted old-side signature store for cross-corpus dedup
  * (DedupOps.buildSignatureStore / appendSignatureStore /
  * crossDedupAgainstStore): the incremental-ingestion contract is
  * that a shard's dedup run costs O(shard + candidates) — the
  * accumulated corpus is NEVER re-scanned. Pins: (1) the dedup plan
  * reads the store parquet and NOT the old corpus parquet, (2)
  * append == rebuild row-for-row, (3) store-backed results equal the
  * direct two-sided run. */
class SignatureStoreSpec extends AnyFunSuite {
  import TestSession._

  private val ops = graft.operators.DedupOps

  private def tmpDir(name: String): String = {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"sigstore_${name}_${Integer.toHexString(sfDir.hashCode)}")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(d)
    d.toString
  }

  test("dedup against the store never scans the old corpus") {
    val t = Tables(spark, sfDir)
    // the old corpus staged as its own parquet, so its scan is
    // identifiable in the plan by root path
    val oldPath = tmpDir("oldcorpus")
    t.documents.where(col("doc_id") % 5 =!= 0)
      .write.mode("overwrite").parquet(oldPath)
    val store = tmpDir("store1")
    ops.buildSignatureStore(
      spark.read.parquet(oldPath), "doc_id", "text", 32, store)
    val shard = t.documents.where(col("doc_id") % 5 === 0)
    val dedup = ops.crossDedupAgainstStore(
      spark, shard, store, "doc_id", "text", 32, 8, 3, 5)
    val scans = dedup.queryExecution.optimizedPlan.collect {
      case LogicalRelation(h: HadoopFsRelation, _, _, _, _) =>
        h.location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.exists(_.contains("sigstore_store1")),
      s"store not scanned: $scans")
    assert(!scans.exists(_.contains("sigstore_oldcorpus")),
      s"old corpus re-scanned: $scans")
    assert(dedup.count() > 0)
  }

  test("append == rebuild, and store-backed == direct") {
    val t = Tables(spark, sfDir)
    val oldA = t.documents.where(col("doc_id") % 5 === 1)
    val oldB = t.documents.where(col("doc_id") % 5 === 2)
    val incremental = tmpDir("incr")
    ops.buildSignatureStore(oldA, "doc_id", "text", 32, incremental)
    ops.appendSignatureStore(oldB, "doc_id", "text", 32, incremental)
    val rebuilt = tmpDir("rebuilt")
    ops.buildSignatureStore(oldA.unionByName(oldB),
      "doc_id", "text", 32, rebuilt)
    def canon(p: String) = spark.read.parquet(p)
      .select(col("doc_id"), col("_mh"), size(col("_toks")).as("_nt"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(canon(incremental) == canon(rebuilt))

    // the store-backed dedup equals the direct two-sided run
    val shard = t.documents.where(col("doc_id") % 5 === 0)
    val viaStore = ops.crossDedupAgainstStore(
        spark, shard, incremental, "doc_id", "text", 32, 8, 3, 5)
      .select(col("doc_new"), col("doc_old"),
        round(col("jaccard"), 6).as("j"))
      .orderBy(col("doc_new"), col("doc_old")).collect().toSeq
    val newSigs = ops.minhashSignature(shard, "text", 32)
    val oldSigs = ops.minhashSignature(
      oldA.unionByName(oldB), "text", 32)
    val direct = ops.verifyJaccard(
        ops.crossMinhashCandidates(newSigs, oldSigs, "doc_id", 32, 8)
          .select(col("doc_new").as("doc_a"), col("doc_old").as("doc_b")),
        t.documents, "doc_id", "text")
      .where(col("jaccard") >= 0.6)
      .select(col("doc_a").as("doc_new"), col("doc_b").as("doc_old"),
        round(col("jaccard"), 6).as("j"))
      .orderBy(col("doc_new"), col("doc_old")).collect().toSeq
    assert(viaStore == direct)
  }

  test("SQL front doors: STORE BUILD/APPEND + AGAINST STORE") {
    val t = Tables(spark, sfDir)
    t.documents.where(col("doc_id") % 5 =!= 0)
      .createOrReplaceTempView("ss_old")
    t.documents.where(col("doc_id") % 5 === 0)
      .createOrReplaceTempView("ss_new")
    val store = tmpDir("sql")
    val b = spark.sql("GRAFT DEDUP STORE BUILD ss_old ID doc_id " +
      s"TEXT text INTO '$store'").collect().head
    assert(b.getAs[String]("mode") == "build" &&
      b.getAs[String]("status") == "done")
    val viaSql = spark.sql(s"GRAFT DEDUP ss_new AGAINST STORE '$store' " +
      "ID doc_id TEXT text THRESHOLD 3/5")
    val direct = spark.sql("GRAFT DEDUP ss_new AGAINST ss_old " +
      "ID doc_id TEXT text THRESHOLD 3/5")
    assert(viaSql.orderBy(col("doc_new"), col("doc_old"))
      .collect().toSeq ==
      direct.orderBy(col("doc_new"), col("doc_old")).collect().toSeq)
    // EXPLAIN of the maintenance statement builds nothing
    val ghost = tmpDir("ghost")
    spark.sql("GRAFT EXPLAIN GRAFT DEDUP STORE BUILD ss_old " +
      s"ID doc_id TEXT text INTO '$ghost'").collect()
    assert(!new java.io.File(ghost).exists())
  }
}
