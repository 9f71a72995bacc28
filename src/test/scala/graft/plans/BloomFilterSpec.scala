package graft.plans

import graft.SharedSpark
import graft.operators.Analytics
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The guarantees that make bloom pruning safe and worth it: no false
  * negatives (structural — the oracle equality in Verify re-proves it
  * end-to-end), OR-merge partition invariance, a bounded fp rate, and
  * the scale claim itself: the pruning step adds ZERO shuffles and
  * actually shrinks the fact side.
  */
class BloomFilterSpec extends AnyFunSuite {
  import SharedSpark._

  test("inserted keys always probe true; disjoint keys rarely do (fp bound)") {
    val dim = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
    val bf = dim.agg(expr("graft_bloom_agg(CAST(c_custkey AS STRING), 17)"))
      .collect()(0).getAs[Array[Byte]](0)
    val members = dim.select("c_custkey").collect().map(_.getLong(0))
    assert(members.nonEmpty)
    members.foreach(k =>
      assert(BloomFilter.contains(bf, k.toString), s"false negative: $k"))
    // keys guaranteed absent (beyond the key domain): fp rate well under 1%
    val probes = (1 to 20000).map(i => s"absent_${i}")
    val fps = probes.count(BloomFilter.contains(bf, _))
    assert(fps <= probes.size / 100,
      s"$fps false positives in ${probes.size} probes at 2^17 bits")
  }

  test("per-partition partial blooms OR into the direct bloom bit-identically") {
    val keys = Tables.orders(spark, sf)
      .select(col("o_custkey").cast("string").as("k"))
    val direct = keys.agg(expr("graft_bloom_agg(k, 17)"))
      .collect()(0).getAs[Array[Byte]](0)
    val viaPartials = keys
      .withColumn("p", pmod(crc32(col("k")), lit(13)))
      .groupBy("p").agg(expr("graft_bloom_agg(k, 17)").as("bf"))
      .agg(expr("graft_bloom_merge(bf)"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, viaPartials))
  }

  test("pruning adds no shuffle and shrinks the fact side to possible matches") {
    val dim = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val bloom = dim.agg(
      expr("graft_bloom_agg(CAST(c_custkey AS STRING), 17)").as("bf"))
    val fact = Tables.orders(spark, sf).select(col("o_custkey"))
    val pruned = fact.join(broadcast(bloom))
      .filter(expr("graft_bloom_contains(bf, CAST(o_custkey AS STRING))"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"))
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bloom pruning should be shuffle-free:\n$plan")
    val total = fact.count()
    val kept = pruned.count()
    val trueMatches = fact.join(dim, col("o_custkey") === col("c_custkey"))
      .count()
    assert(kept >= trueMatches, "bloom dropped a true match")
    assert(kept < total, "bloom pruned nothing on a selective dim")
    // fp tail is small: kept is within 1% of the true match count
    assert(kept - trueMatches <= math.max(1L, total / 100))
  }

  test("geometry mismatch is a hard error; empty dim prunes everything") {
    import spark.implicits._
    val a = Seq("x").toDF("k").agg(expr("graft_bloom_agg(k, 17)").as("bf"))
    val b = Seq("y").toDF("k").agg(expr("graft_bloom_agg(k, 18)").as("bf"))
    val err = intercept[Exception] {
      a.union(b).agg(expr("graft_bloom_merge(bf)")).collect()
    }
    assert(err.getMessage != null)
    val emptyBf = Seq.empty[String].toDF("k")
      .agg(expr("graft_bloom_agg(k, 17)").as("bf"))
    val kept = Tables.orders(spark, sf).join(broadcast(emptyBf))
      .filter(expr("graft_bloom_contains(bf, CAST(o_custkey AS STRING))"))
      .count()
    assert(kept === 0L)
  }

  test("bloom_join_prune equals the plain join (no-false-negative end-to-end)") {
    val viaBloom = Analytics.bloomJoinPrune(spark, sf).collect().map(_.toSeq)
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
          .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_orderkey")).as("first_order"),
        max(col("o_orderkey")).as("last_order"))
      .orderBy("c_custkey").collect().map(_.toSeq)
    assert(viaBloom.toSeq === plain.toSeq)
  }
}
