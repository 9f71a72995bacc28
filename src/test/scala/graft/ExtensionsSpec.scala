package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster entry point must register every native expression at
  * session build — no Graft.tune call anywhere in this spec.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers the native functions at session build") {
    val shared = SharedSpark.spark // force shared context into existence
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT graft_long_dot(array(1L,2L,3L), array(4L,5L,6L)) AS d, " +
          "graft_word_shingles(array('a','b','c'), 2) AS sh, " +
          "graft_hex_parity(md5('x'), md5('y')) AS p").head
      assert(r.getAs[Long]("d") === 32L)
      assert(r.getAs[Seq[String]]("sh") === Seq("a b", "b c"))
      val top = s2.range(10).selectExpr("CAST(id % 3 AS STRING) AS t")
        .selectExpr("graft_topk_sketch(t, 2, 8) AS top").head
      assert(top.getSeq[org.apache.spark.sql.Row](0).nonEmpty)
      // sketch tier: HLL (+ union algebra) and CMS (+ inner product)
      val sk = s2.range(100).selectExpr("CAST(id AS STRING) AS v")
        .selectExpr("graft_hll_sketch(v, 10) AS h", "graft_cms_sketch(v) AS c")
        .selectExpr(
          "graft_hll_est(graft_hll_union(h, h)) AS est",
          "graft_cms_est(c, '42') AS f42",
          "graft_cms_dot(c, c) AS dot").head
      assert(math.abs(sk.getAs[Long]("est") - 100L) <= 10L)
      assert(sk.getAs[Long]("f42") === 1L)
      assert(sk.getAs[Long]("dot") >= 100L)
      // round-4 tier: DDSketch quantiles, bloom pruning, deflate signal
      val r4 = s2.range(1, 1001)
        .selectExpr("CAST(id AS DOUBLE) AS x", "CAST(id AS STRING) AS k")
        .selectExpr("graft_dds_sketch(x) AS q", "graft_bloom_agg(k, 16) AS bf")
        .selectExpr(
          "graft_dds_quantile(q, 0.5D) AS p50",
          "graft_bloom_contains(bf, '500') AS hit",
          "graft_bloom_contains(bf, 'absent_key') AS miss",
          "graft_deflate_len(repeat('ab', 500)) AS zlen").head
      assert(math.abs(r4.getAs[Double]("p50") - 500.0) <= 6.0)
      assert(r4.getAs[Boolean]("hit"))
      assert(!r4.getAs[Boolean]("miss"))
      assert(r4.getAs[Int]("zlen") > 0 && r4.getAs[Int]("zlen") < 100)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
