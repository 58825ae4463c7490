package graft

import org.scalatest.funsuite.AnyFunSuite

/** GRAFT SET / SHOW CONFIG: session-scoped conf admin (the knob
  * surface the opt-in optimizer rules read). */
class ConfigAdminSpec extends AnyFunSuite {
  import TestSession._

  test("SET writes the session conf; SHOW CONFIG reports it") {
    val set = spark.sql(
      "GRAFT SET spark.graft.bandJoin.enabled = true").collect().head
    assert(set.getAs[String]("status") == "set")
    assert(spark.conf.get("spark.graft.bandJoin.enabled") == "true")

    val conf = spark.sql("GRAFT SHOW CONFIG").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(conf("spark.graft.bandJoin.enabled") == "true")
    assert(conf.contains("spark.sql.shuffle.partitions"))
    assert(conf("spark.sql.session.timeZone") == "UTC")

    spark.sql("GRAFT SET spark.graft.bandJoin.enabled = false")
    assert(spark.conf.get("spark.graft.bandJoin.enabled") == "false")
  }
}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Named ML model objects + external-location admin + DML statements —
  * the round-4 SQL front doors (reference: SqlCudParser /
  * SqlAdminParser). Each statement's catalog side effects and the
  * statement-to-statement composition are pinned here; value-level
  * equivalence with the inline operators goes through the DuckDB gate
  * (q181-q185). */
class ModelRegistrySpec extends AnyFunSuite {
  import TestSession._

  test("CREATE CLASSIFIER trains once; CLASSIFIED WITH scores by name") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE CLASSIFIER mreg TARGET label ON embeddings")
    val model = spark.table("graft_model_mreg")
    assert(model.columns.toSeq == Seq("c_label", "centroid"))
    assert(model.count() == 10) // one centroid per label
    val scored = spark.sql("GRAFT CLASSIFIED embeddings WITH mreg")
    assert(scored.columns.contains("c_label") &&
      scored.columns.contains("d2"))
    assert(scored.count() ==
      Tables(spark, sfDir).embeddings.count())
  }

  test("DROP removes the model; scoring a dropped model names it") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE CLASSIFIER mtmp TARGET label ON embeddings")
    val st = spark.sql("GRAFT DROP CLASSIFIER mtmp").collect()
    assert(st.head.getString(1) == "dropped")
    val e = intercept[Exception] {
      spark.sql("GRAFT CLASSIFIED embeddings WITH mtmp").collect()
    }
    assert(e.getMessage.contains("graft_model_mtmp"))
  }

  test("CREATE CLUSTERER model equals the inline kmeans model") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE CLUSTERER kreg K 4 ITERS 2 ON embeddings")
    val named = spark.table("graft_model_kreg")
    val inline = graft.operators.MLOps
      .kmeansModel(Tables(spark, sfDir).embeddings, 4, 2)
    assert(named.exceptAll(inline).isEmpty &&
      inline.exceptAll(named).isEmpty)
  }

  test("ADD/LIST/REMOVE LOCATION round-trip through SQL") {
    val dir = s"$sfDir/nation.parquet"
    spark.sql(s"GRAFT ADD LOCATION locspec PARQUET '$dir'")
    assert(spark.sql("GRAFT LIST LOCATIONS").collect()
      .map(_.getString(0)).contains("locspec"))
    assert(spark.sql("SELECT COUNT(*) AS n FROM EXTERNAL(locspec)")
      .collect().head.getLong(0) > 0)
    assert(spark.sql("GRAFT REMOVE LOCATION locspec").collect()
      .head.getString(1) == "removed")
    assert(!spark.sql("GRAFT LIST LOCATIONS").collect()
      .map(_.getString(0)).contains("locspec"))
  }

  test("EXTERNAL(unknown) stays untouched for the delegate parser") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM EXTERNAL(never_registered)").collect()
    }
    assert(e.getMessage != null)
  }

  test("DML statements compose without a view self-reference cycle") {
    Tables(spark, sfDir).nation.createOrReplaceTempView("nat_dml")
    val before = spark.table("nat_dml").count()
    spark.sql("GRAFT DELETE FROM nat_dml WHERE n_regionkey = 0")
    val afterDelete = spark.table("nat_dml").count()
    assert(afterDelete < before)
    spark.sql(
      "GRAFT UPDATE nat_dml SET n_name = upper(n_name) WHERE n_nationkey >= 0")
    assert(spark.table("nat_dml").where(col("n_name") =!=
      upper(col("n_name"))).count() == 0)
    spark.sql("GRAFT INSERT INTO nat_dml VALUES (990, 'xx', 1)")
    assert(spark.table("nat_dml").count() == afterDelete + 1)
    // the deleted region stays deleted through later statements
    assert(spark.table("nat_dml")
      .where(col("n_regionkey") === 0).count() == 0)
  }

  test("DESCRIBE LOCATION and LIST MODELS report the catalog state") {
    spark.sql("GRAFT ADD LOCATION desc_t CSV '/tmp/desc_t.csv' " +
      "SCHEMA 'a INT, b STRING'")
    val d = spark.sql("GRAFT DESCRIBE LOCATION desc_t").head()
    assert(d.getAs[String]("kind") == "CSV")
    assert(d.getAs[String]("path") == "/tmp/desc_t.csv")
    assert(d.getAs[String]("schema").contains("a INT"))
    assert(spark.sql("GRAFT DESCRIBE LOCATION no_such_loc")
      .head().getAs[String]("status") == "absent")
    spark.sql("GRAFT REMOVE LOCATION desc_t")

    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE CLASSIFIER listme TARGET label ON embeddings")
    val names = spark.sql("GRAFT LIST MODELS")
      .collect().map(_.getString(0))
    assert(names.contains("listme"))
    spark.sql("GRAFT DROP CLASSIFIER listme")
    val after = spark.sql("GRAFT LIST CLASSIFIERS")
      .collect().map(_.getString(0))
    assert(!after.contains("listme"))
  }

  test("EXPLAIN renders the inner statement's physical plan as rows") {
    Tables(spark, sfDir).registerAll()
    // set up the views the inner statement needs BEFORE explaining it
    val ev = Tables(spark, sfDir).events
    ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
      .createOrReplaceTempView("graft_explain_p")
    ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("ref_event_id"))
      .createOrReplaceTempView("graft_explain_r")
    val lines = spark.sql(
      "GRAFT EXPLAIN GRAFT ASOF graft_explain_p REF graft_explain_r " +
        "KEY user_id ORDER ts")
      .collect().map(_.getString(1)).mkString("\n")
    assert(lines.contains("AsOfJoin"),
      s"custom exec missing from the explained plan:\n$lines")
    val ord = spark.sql(
      "GRAFT EXPLAIN SELECT COUNT(*) FROM graft_explain_p")
      .collect().map(_.getInt(0))
    assert(ord.sameElements(ord.sorted)) // line_no orders the plan text
  }

  test("MERGE upserts: source wins on key match, target rest survives") {
    Tables(spark, sfDir).nation.createOrReplaceTempView("nat_merge")
    val before = spark.table("nat_merge").count()
    spark.table("nat_merge").where(col("n_nationkey") < 3)
      .withColumn("n_name", lit("UPDATED"))
      .unionByName(spark.range(995, 997).select(
        col("id").cast("int").as("n_nationkey"), lit("NEW").as("n_name"),
        lit(0).as("n_regionkey")))
      .createOrReplaceTempView("nat_merge_src")
    spark.sql("GRAFT MERGE INTO nat_merge USING nat_merge_src ON n_nationkey")
    val post = spark.table("nat_merge")
    assert(post.count() == before + 2) // 3 updated in place, 2 inserted
    assert(post.where(col("n_name") === "UPDATED").count() == 3)
    assert(post.where(col("n_name") === "NEW").count() == 2)
    // untouched keys keep their original values
    assert(post.where(col("n_nationkey") === 5)
      .select(col("n_name")).head().getString(0) != "UPDATED")
    assert(post.columns.toSeq ==
      Tables(spark, sfDir).nation.columns.toSeq)
  }

  test("TEXT PARSE projects match groups; non-matches yield empty") {
    Tables(spark, sfDir).registerAll()
    val out = spark.sql(
      "GRAFT TEXT PARSE '^(\\w+)' IN text TO head FROM documents")
    assert(out.columns.contains("head"))
    assert(out.where(col("head") === "").count() +
      out.where(col("head") =!= "").count() == out.count())
  }

  test("IMPUTE WITH fills only NULL targets and flags them") {
    Tables(spark, sfDir).registerAll()
    spark.sql("SELECT vec_id, embedding, " +
      "CASE WHEN vec_id % 7 = 0 THEN NULL ELSE label END AS label " +
      "FROM embeddings").createOrReplaceTempView("impspec")
    spark.sql("SELECT * FROM impspec WHERE label IS NOT NULL")
      .createOrReplaceTempView("impspec_train")
    spark.sql("GRAFT CREATE CLASSIFIER mimp TARGET label " +
      "ON impspec_train")
    val out = spark.sql(
      "GRAFT IMPUTE impspec SET label WITH mimp FLAG was_imputed")
    assert(out.columns.toSeq ==
      Seq("vec_id", "embedding", "label", "was_imputed"))
    // every row filled, flags exactly the held-out fold
    assert(out.where(col("label").isNull).count() == 0)
    assert(out.where(col("was_imputed")).count() ==
      spark.table("impspec").where(col("label").isNull).count())
    // complete rows pass through verbatim
    val changed = out.as("o")
      .join(spark.table("impspec").as("i"), "vec_id")
      .where(!col("o.was_imputed") && col("o.label") =!= col("i.label"))
    assert(changed.count() == 0)
    // and the label type survives the fill (int in, int out)
    assert(out.schema("label").dataType ==
      spark.table("impspec").schema("label").dataType)
  }
}
