package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unified index DDL (reference sql/statements/SqlStatement.scala:
  * 164-175 — SqlCreateIndex / SqlDropIndex route per location): the
  * one GRAFT CREATE INDEX statement lowers to the per-file Bloom
  * manifest for file layouts and to real vendor CREATE INDEX DDL for
  * attached JDBC catalogs. Both lowerings proven here; the file lane's
  * oracle row is q426. */
class GraftIndexSpec extends AnyFunSuite {
  import TestSession._

  test("file lowering: builds the Bloom manifest, DROP removes it") {
    val t = Tables(spark, sfDir)
    val tmp = graft.sources.ExternalStage.materialize(sfDir,
      "hashed_lineitem", t.lineitem) { (df, path) =>
      df.repartition(16, col("l_orderkey"))
        .write.mode("overwrite").parquet(path)
    }
    spark.sql("GRAFT DROP INDEX spec_idx").collect()
    val st = spark
      .sql(s"GRAFT CREATE INDEX spec_idx ON '$tmp' (l_orderkey)")
      .collect().head
    assert(st.getAs[String]("kind") == "bloom" &&
      st.getAs[String]("status") == "created")
    // manifest materialized on disk
    val mDir = new org.apache.hadoop.fs.Path(tmp, "_bloom_l_orderkey")
    val fs = mDir.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(mDir, "_SUCCESS")))
    // listed in both catalogs
    assert(spark.sql("GRAFT LIST INDEXES")
      .where(col("index_name") === "spec_idx").count() == 1)
    assert(spark.sql("GRAFT LIST OBJECTS spec_idx")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("index", "spec_idx")))
    // duplicate names rejected
    val e = intercept[Exception] {
      spark.sql(s"GRAFT CREATE INDEX spec_idx ON '$tmp' (l_orderkey)")
        .collect()
    }
    assert(e.getMessage.contains("already exists"))
    // DROP deletes the manifest and the registry row
    val dr = spark.sql("GRAFT DROP INDEX spec_idx").collect().head
    assert(dr.getAs[String]("status") == "dropped")
    assert(!fs.exists(mDir))
    assert(spark.sql("GRAFT LIST INDEXES")
      .where(col("index_name") === "spec_idx").count() == 0)
    // dropping again is a reported no-op
    assert(spark.sql("GRAFT DROP INDEX spec_idx")
      .collect().head.getAs[String]("status") == "absent")
  }

  test("multi-column file index: one Bloom manifest per column") {
    val t = Tables(spark, sfDir)
    val tmp = graft.sources.ExternalStage.materialize(sfDir,
      "hashed_lineitem", t.lineitem) { (df, path) =>
      df.repartition(16, col("l_orderkey"))
        .write.mode("overwrite").parquet(path)
    }
    spark.sql("GRAFT DROP INDEX spec_multi").collect()
    val st = spark.sql(
      s"GRAFT CREATE INDEX spec_multi ON '$tmp' " +
        "(l_orderkey, l_partkey)").collect().head
    assert(st.getAs[String]("key") == "l_orderkey,l_partkey")
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sessionState.newHadoopConf())
    for (c <- Seq("l_orderkey", "l_partkey"))
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$tmp/_bloom_$c/_SUCCESS")), s"missing manifest for $c")
    spark.sql("GRAFT DROP INDEX spec_multi").collect()
    for (c <- Seq("l_orderkey", "l_partkey"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$tmp/_bloom_$c")))
  }

  test("remote lowering: vendor CREATE/DROP INDEX inside Derby") {
    val t = Tables(spark, sfDir)
    graft.sources.FederatedPushdown.seedOnce(spark, "spec_idx_db",
      "NAT_IDX", t.nation)
    spark.sql("GRAFT ATTACH DERBY 'spec_idx_db' AS idxfed").collect()
    val st = spark
      .sql("GRAFT CREATE INDEX nat_rk_ix ON idxfed.NAT_IDX (n_regionkey)")
      .collect().head
    assert(st.getAs[String]("kind") == "remote" &&
      st.getAs[String]("status") == "created")
    // the index exists in Derby's own catalog
    val url = graft.sources.EmbeddedDerby.url("spec_idx_db")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT COUNT(*) FROM SYS.SYSCONGLOMERATES " +
          "WHERE CONGLOMERATENAME = 'NAT_RK_IX'")
      rs.next()
      assert(rs.getInt(1) == 1, "index missing from SYSCONGLOMERATES")
      rs.close()
    } finally conn.close()
    // DROP runs the vendor DDL and clears the registry
    assert(spark.sql("GRAFT DROP INDEX nat_rk_ix")
      .collect().head.getAs[String]("status") == "dropped")
    val conn2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn2.createStatement().executeQuery(
        "SELECT COUNT(*) FROM SYS.SYSCONGLOMERATES " +
          "WHERE CONGLOMERATENAME = 'NAT_RK_IX'")
      rs.next()
      assert(rs.getInt(1) == 0, "index survived DROP INDEX")
      rs.close()
    } finally conn2.close()
  }

  test("EXPLAIN of index DDL renders the command without running it") {
    val t = Tables(spark, sfDir)
    val tmp = graft.sources.ExternalStage.materialize(sfDir,
      "hashed_lineitem", t.lineitem) { (df, path) =>
      df.repartition(16, col("l_orderkey"))
        .write.mode("overwrite").parquet(path)
    }
    spark.sql("GRAFT DROP INDEX never_built").collect()
    val plan = spark.sql(
      s"GRAFT EXPLAIN GRAFT CREATE INDEX never_built ON '$tmp' " +
        "(l_partkey)").collect().map(_.getString(1)).mkString("\n")
    assert(plan.contains("CreateIndexCommand"))
    assert(spark.sql("GRAFT LIST INDEXES")
      .where(col("index_name") === "never_built").count() == 0)
  }
}
