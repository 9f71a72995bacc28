package graft

import org.scalatest.funsuite.AnyFunSuite

class RegistrySpec extends AnyFunSuite {
  import SharedSpark._

  test("registry names are unique and oracle keys match query keys") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Pair-producing ops may legitimately be sparse at sf0.001; everything
  // else must produce rows.
  private val maySparse = Set("dedup_simhash", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "ann_topk_lsh")

  Registry.all.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!maySparse(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
