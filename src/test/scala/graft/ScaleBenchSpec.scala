package graft

import org.apache.spark.sql.functions._

/** Pins that every query name the benchmark harnesses time resolves to
  * a registered SparkEntry query — a typo'd or renamed entry would
  * otherwise surface only as a -1 row in a driver bench artifact. */
class BenchRegistrySpec extends org.scalatest.funsuite.AnyFunSuite {
  test("headline/extended/serve/scale bench rows are all registered queries") {
    val all = Bench.headline ++ Bench.extended ++ Bench.serveRows ++
      ScaleBench.queries
    val missing = all.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unregistered bench rows: $missing")
  }
}

/** Pins the construction guarantees of [[ScaleBench.replicate]] — the
  * 10x-tier results in BENCH_SCALE.md are only as credible as the
  * generator, so the three properties the methodology claims are
  * spec-verified here at n=3 on sf0.001:
  *  1. row counts scale by exactly n (fixed dims copied as-is);
  *  2. FK families stay closed — every replicated lineitem still joins
  *     its orders row, every orders row its customer (no dangling keys,
  *     no cross-replica leakage);
  *  3. document shingle sets are DISJOINT across replicas (the
  *     token-salting), so near-dup work scales linearly instead of
  *     quadratically — and replica 0 is byte-identical to the source.
  */
class ScaleBenchSpec extends SparkSpec {

  private val n = 3
  private lazy val outDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_spec").toString
    ScaleBench.replicate(spark, sf(), dir, n)
    dir
  }

  test("replicate scales fact tables by n and copies fixed dims") {
    for (t <- Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")) {
      val src = graft.sources.Tables(spark, sf(), t).count()
      val rep = graft.sources.Tables(spark, outDir, t).count()
      assert(rep == n * src, s"$t: expected ${n * src}, got $rep")
    }
    for (t <- Seq("region", "nation")) {
      val src = graft.sources.Tables(spark, sf(), t).count()
      val rep = graft.sources.Tables(spark, outDir, t).count()
      assert(rep == src, s"$t: fixed dim should be copied as-is")
    }
  }

  test("replicated FK families stay closed within each replica") {
    val li = graft.sources.Tables(spark, outDir, "lineitem")
    val ord = graft.sources.Tables(spark, outDir, "orders")
    val cust = graft.sources.Tables(spark, outDir, "customer")
    val danglingOrders = li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")
    assert(danglingOrders.count() == 0, "lineitem rows with no orders row")
    val danglingCust = ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left_anti")
    assert(danglingCust.count() == 0, "orders rows with no customer row")
    // and the join never crosses replicas: key DIV stride must agree
    val stride = lit(1000000000L)
    val crossed = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .filter(li("l_orderkey").divide(stride).cast("long")
        =!= ord("o_orderkey").divide(stride).cast("long"))
    assert(crossed.count() == 0)
  }

  test("document shingles are disjoint across replicas; replica 0 is the source") {
    val docs = graft.sources.Tables(spark, outDir, "documents")
    val sh = graft.ext.Dedup.explodedShingles(docs)
      .withColumn("_r", (col("doc_id") / 1000000000L).cast("long"))
    // a shingle seen in two replicas would let near-dup candidates
    // cross replicas and corrupt the linear-scaling construction
    val crossReplica = sh.groupBy("shingle")
      .agg(countDistinct("_r").as("nr")).filter(col("nr") > 1)
    assert(crossReplica.count() == 0, "shingles leak across replicas")
    val src = graft.sources.Tables(spark, sf(), "documents").select("doc_id", "text")
    val r0 = docs.filter(col("doc_id") < 1000000000L).select("doc_id", "text")
    assert(r0.exceptAll(src).isEmpty && src.exceptAll(r0).isEmpty,
      "replica 0 must be byte-identical to the source corpus")
  }

  test("the planted beacon token is heavy at the replica tier: salt-invariant, once per salted doc, absent from replica 0") {
    val docs = graft.sources.Tables(spark, outDir, "documents")
    val toks = docs.select(
      explode(graft.ext.TextAnalysis.tokens(col("text"))).as("tok"),
      (col("doc_id") / 1000000000L).cast("long").as("_r"))
    val total = toks.count()
    val beacon = toks.filter(col("tok") === ScaleBench.HeavyBeacon)
    // the 1% heavy threshold t33/s21 use — the beacon's share is
    // deterministic by construction ((n−1)/n of one token per doc),
    // so the streamed heavy-hitter row has non-vacuous content at
    // every replica tier
    assert(beacon.count() * 100 >= total,
      s"beacon must cross the 1% threshold (${beacon.count()} of $total)")
    // exactly once per salted-replica doc, never in replica 0 (whose
    // byte-identity the previous test pins)
    assert(beacon.filter(col("_r") === 0).count() == 0)
    val perDoc = docs.filter(col("doc_id") >= 1000000000L)
      .select(graft.ext.TextAnalysis.tokens(col("text")).as("ts"))
      .select(size(filter(col("ts"),
        t => t === ScaleBench.HeavyBeacon)).as("c"))
    assert(perDoc.filter(col("c") =!= 1).count() == 0,
      "exactly one beacon per salted doc")
    // and the Misra-Gries summary actually surfaces it: the planted
    // row reads found_ok (the s21 scale-tier claim in miniature)
    val facts = graft.analytics.ExtPipelines.heavyHitters(spark, outDir)
      .filter(col("tok") === ScaleBench.HeavyBeacon).collect()
    assert(facts.length == 1 && facts(0).getAs[Boolean]("found_ok") &&
      facts(0).getAs[Boolean]("err_ok"),
      s"beacon row must be found with the MG bound: ${facts.mkString}")
  }
}
