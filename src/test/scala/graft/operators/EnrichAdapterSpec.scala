package graft.operators

import java.util.concurrent.atomic.AtomicLong

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Counters shared with executor code — valid because tests run
  * local-mode (single JVM). */
object EnrichProbe {
  val calls = new AtomicLong(0)
  val rowsSeen = new AtomicLong(0)
  val maxBatch = new AtomicLong(0)
  val failuresLeft = new AtomicLong(0)
  def reset(failures: Long = 0): Unit = {
    calls.set(0); rowsSeen.set(0); maxBatch.set(0)
    failuresLeft.set(failures)
  }
}

/** An instrumented backend delegating to the rule client. */
object ProbeFactory extends EnrichClientFactory {
  def open(): EnrichClient = new EnrichClient {
    private val inner = RuleEnrichClient.open()
    def enrichBatch(batch: Seq[OfferText]): Seq[EnrichResult] = {
      if (EnrichProbe.failuresLeft.getAndUpdate(n => math.max(0, n - 1)) > 0)
        throw new RuntimeException("transient backend failure (test)")
      EnrichProbe.calls.incrementAndGet()
      EnrichProbe.rowsSeen.addAndGet(batch.size)
      EnrichProbe.maxBatch.getAndUpdate(m => math.max(m, batch.size))
      inner.enrichBatch(batch)
    }
  }
}

class EnrichAdapterSpec extends AnyFunSuite {
  import SharedSpark._

  private def offers(n: Int, parts: Int = 1) = {
    import spark.implicits._
    (0 until n).map(i => OfferText(i.toLong, s"Data Engineer #$i!",
      if (i % 2 == 0) "we use spark daily" else "plain text",
      if (i % 3 == 0) "1-URGENT" else "2-HIGH"))
      .toDS().repartition(parts)
  }

  test("default rule backend reproduces the oracled column expressions exactly") {
    val out = EnrichAdapter.enrichOffers(spark, sf).collect()
    assert(out.nonEmpty)
    // the column-expression twin over the same source frame
    val twin = graft.sources.Tables.documents(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf)
        .select(col("o_orderkey").as("doc_id"),
          col("o_orderpriority").as("priority")), Seq("doc_id"))
      .select(col("doc_id").as("offer_id"),
        trim(regexp_replace(regexp_replace(
          lower(substring(col("text"), 1, 40)), "[^a-z ]", " "),
          " +", " ")).as("titre_homogene"),
        when(col("text").contains("spark"), "Data")
          .when(col("text").contains("stream"), "Streaming")
          .when(col("text").contains("customer"), "CRM")
          .when(col("text").contains("vector"), "ML")
          .otherwise("Autre").as("secteur"),
        when(col("priority") === "1-URGENT", 5)
          .when(col("priority") === "2-HIGH", 4)
          .when(col("priority") === "3-MEDIUM", 3)
          .when(col("priority") === "4-NOT SPECIFIED", 2)
          .otherwise(1).as("niveau_qualification"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSet
    val got = out.map(r => (r.offer_id, r.titre_homogene, r.secteur,
      r.niveau_qualification)).toSet
    assert(got === twin)
  }

  test("memoization: duplicate inputs call the backend once per partition") {
    import spark.implicits._
    EnrichProbe.reset()
    // 300 rows but only 3 distinct (title, description, priority) keys,
    // one partition, batches of 50
    val dup = (0 until 300).map(i => OfferText(i.toLong, s"T${i % 3}",
      "desc", "2-HIGH")).toDS().repartition(1)
    val out = EnrichAdapter.enrich(dup, ProbeFactory, batchSize = 50)
      .collect()
    assert(out.length === 300)
    // every row got its own id back, memo answers re-keyed per row
    assert(out.map(_.offer_id).toSet === (0L until 300L).toSet)
    assert(EnrichProbe.rowsSeen.get() === 3,
      s"backend saw ${EnrichProbe.rowsSeen.get()} rows for 3 distinct inputs")
    assert(EnrichProbe.maxBatch.get() <= 50)
  }

  test("batching respects batchSize and covers every distinct row") {
    EnrichProbe.reset()
    val out = EnrichAdapter.enrich(offers(500), ProbeFactory, batchSize = 64)
      .collect()
    assert(out.length === 500)
    assert(EnrichProbe.maxBatch.get() <= 64)
    // all distinct: backend must see every row exactly once
    assert(EnrichProbe.rowsSeen.get() === 500)
    assert(EnrichProbe.calls.get() === 8) // ceil(500/64)
  }

  test("bounded retry: transient failures recover, persistent ones fail the task") {
    EnrichProbe.reset(failures = 2) // first two calls throw; retries cover
    val ok = EnrichAdapter.enrich(offers(10), ProbeFactory,
      batchSize = 100, maxRetries = 2).collect()
    assert(ok.length === 10)

    EnrichProbe.reset(failures = 100) // more failures than retries allow
    val e = intercept[Exception] {
      EnrichAdapter.enrich(offers(10), ProbeFactory,
        batchSize = 100, maxRetries = 2).collect()
    }
    assert(e.getMessage != null)
  }
}
