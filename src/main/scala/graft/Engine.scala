package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.plans.{CosineSimF, DistSqF, FingerprintHash, SortedIntersectCount}

/** Session-level integration: a SparkSessionExtensions hook that makes
  * the graft native expressions first-class SQL functions, and a
  * session factory with the settings every graft deployment wants
  * (AQE, sane shuffle parallelism, UTC).
  *
  * Deployments that can't pass `withExtensions` (e.g. the driver's own
  * harness session) get the same functions via the per-query
  * `register(spark)` calls inside the query functions — both paths are
  * idempotent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Custom logical operators: lowered right after resolution so the
    // optimizer and planner only ever see standard nodes.
    ext.injectPostHocResolutionRule(_ => graft.plans.RewriteDistinctOn)
    // Opt-in optimizer rewrite: point-in-interval theta join →
    // bucket-expansion equi-join (spark.graft.rangeJoin.bucketWidth).
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // Opt-in optimizer rewrite: keyed band join (equi-key + point in
    // interval) → the sorted-sweep BandJoinPlan
    // (spark.graft.bandJoin.enabled).
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
    // Whole-operator physical extension: AsOfJoinPlan survives to the
    // planner, where this strategy turns it into AsOfJoinExec (the
    // sorted-merge as-of join).
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // Keyed band/interval join: sorted sweep instead of hash-join +
    // post-filter all-pairs (BandJoinPlan -> BandJoinExec).
    ext.injectPlannerStrategy(_ => graft.plans.BandJoinStrategy)
    // Custom SQL productions (GRAFT MATCH / GRAFT DISTINCT ON);
    // everything else delegates to Spark's parser.
    ext.injectParser { (session, delegate) =>
      new graft.plans.GraftSqlParser(() => session, delegate)
    }
    ext.injectFunction(fn("graft_cosine") {
      exprs => CosineSimF(exprs(0), exprs(1))
    })
    ext.injectFunction(fn("graft_dist_sq") {
      exprs => DistSqF(exprs(0), exprs(1))
    })
    ext.injectFunction(fn("graft_fingerprint") {
      exprs => FingerprintHash(exprs.head, 256)
    })
    ext.injectFunction(fn("graft_sorted_intersect_count") {
      exprs => SortedIntersectCount(exprs(0), exprs(1))
    })
    // basket-mining combination generators: registered at session
    // build so BasketOps.pairColumn/tripleColumn (and plain SQL)
    // resolve without depending on a prior withCappedItems call
    // having run its per-query register side effect
    ext.injectFunction(fn("graft_pairs") {
      exprs => graft.plans.ArrayPairs(exprs.head)
    })
    ext.injectFunction(fn("graft_triples") {
      exprs => graft.plans.ArrayTriples(exprs.head)
    })
    ext.injectFunction(fn("graft_topk") {
      exprs => graft.plans.SpaceSavingTopK.fromExprs(exprs)
    })
    ext.injectFunction(fn("graft_topk_by") {
      exprs => graft.plans.TopKBy.fromExprs(exprs)
    })
    ext.injectFunction(fn("graft_cms") {
      exprs => graft.plans.CountMinSketch.aggFromExprs(exprs)
    })
    ext.injectFunction(fn("graft_cms_estimate") {
      exprs => graft.plans.CountMinSketch.estFromExprs(exprs)
    })
    ext.injectFunction(fn("graft_bloom_agg") {
      exprs => graft.plans.BloomPrune.aggExpr(exprs)
    })
    ext.injectFunction(fn("graft_bloom_contains") {
      exprs => graft.plans.BloomPrune.containsExpr(exprs)
    })
    // theta/KMV sketch family: distinct sketches with SET ALGEBRA
    // (intersect / a-not-b — what HLL can't do) + stored-sketch
    // re-aggregation; every client surface (shell, JDBC, HTTP) gets
    // the functions in plain SQL
    ext.injectFunction(fn("graft_theta") {
      exprs => graft.plans.ThetaSketch.aggFromExprs(exprs)
    })
    ext.injectFunction(fn("graft_theta_merge") {
      exprs => graft.plans.ThetaMergeAgg(exprs.head)
    })
    ext.injectFunction(fn("graft_theta_estimate") {
      exprs => graft.plans.ThetaEstimate(exprs.head)
    })
    ext.injectFunction(fn("graft_theta_union") {
      exprs => graft.plans.ThetaUnion(exprs(0), exprs(1))
    })
    ext.injectFunction(fn("graft_theta_intersect") {
      exprs => graft.plans.ThetaIntersect(exprs(0), exprs(1))
    })
    ext.injectFunction(fn("graft_theta_anotb") {
      exprs => graft.plans.ThetaANotB(exprs(0), exprs(1))
    })
  }
}

object GraftExtensions {
  private type FnDesc =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def fn(name: String)(
      builder: Seq[Expression] => Expression): FnDesc = {
    val ident = FunctionIdentifier(name)
    val info = FunctionRegistryBase.expressionInfo[Expression](name, None)
    (ident, info, builder)
  }
}

object Engine {
  /** SparkSession with graft extensions and scale-sane defaults. */
  def session(
      master: String = "local[32]",
      shufflePartitions: Int = 32): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE small-partition coalescing: Spark's default
      // parallelismFirst=true. r6-r10 ran =false ("size by bytes, not
      // cluster width"), which is right when shuffle BYTES are the
      // cost — but it coalesces row-heavy/byte-light shuffles (e.g.
      // 600k small grouped structs ~ a few MB) to ONE partition,
      // serializing CPU-dense aggregates (measured: the q300/q218
      // final aggregates ran 2.7-2.8s on 1 task with 31 cores idle)
      // and flattening the core-count scaling the harness measures.
      // At production scale the two settings agree (bytes >> advisory
      // size ⇒ byte-based sizing either way); they differ only in the
      // small-bytes regime, where wasting the cluster is the wrong
      // call — so the shipped default is also the scale-correct one.
      // Broadcast/shuffle blocks are only unpersisted when the driver
      // GC collects their variables (ContextCleaner weak refs); the
      // default periodic-GC safety net is 30min, so a long-lived
      // session accumulates dead broadcast blocks until memory
      // pressure stalls it. 45s keeps a many-query session flat.
      .config("spark.cleaner.periodicGC.interval", "45s")
      // Whole-stage-codegen class cache: default 100 entries. A
      // long-lived session serving a large query registry (the
      // engine's actual deployment shape — and the bench: 459 queries
      // x 2 passes in one JVM) evicts every compiled class between
      // re-runs of the same query, so EVERY execution pays janino
      // compilation again (hundreds of ms per codegen unit, several
      // units per query). 8192 keeps every distinct unit compiled
      // once; memory cost is metaspace-resident generated classes
      // (~KBs each), trivial next to executor memory.
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
