package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One offer's text fields going INTO enrichment (the reference sends
  * title + description to Groq, pipline.py:88-110). */
final case class OfferText(offer_id: Long, title: String,
    description: String, priority: String)

/** The enrichment verdict coming back: the three fields the reference's
  * system prompt demands. */
final case class EnrichResult(offer_id: Long, titre_homogene: String,
    secteur: String, niveau_qualification: Int)

/** A batch enrichment backend. Implementations MUST be:
  *  - serializable (instances configure on the driver, the per-partition
  *    client materializes on executors via [[EnrichClientFactory.open]]);
  *  - deterministic per input for replay safety (a Spark task retry
  *    re-runs the partition — a backend whose answers drift between
  *    retries breaks exactly-once downstream semantics; cache or pin
  *    model versions accordingly, and note temperature-0 alone does not
  *    guarantee this for remote LLMs).
  */
trait EnrichClientFactory extends Serializable {
  /** Called once per PARTITION on the executor — the place a real
    * implementation builds its HTTP client / rate limiter; never once
    * per row, never on the driver. */
  def open(): EnrichClient
}

/** The per-partition client: one batch in, one batch out, index-aligned. */
trait EnrichClient {
  def enrichBatch(batch: Seq[OfferText]): Seq[EnrichResult]
  /** Called when the partition is exhausted (close sockets etc.). */
  def close(): Unit = ()
}

/** The deterministic rule backend — the SAME rules as the oracled
  * [[Enrich]] column operators, as plain Scala (spec-pinned equal), so
  * the default adapter reproduces exactly what the correctness gate
  * verifies. A model-backed deployment swaps the factory and keeps
  * every Spark-side mechanic below.
  */
object RuleEnrichClient extends EnrichClientFactory {
  def normalizeTitle(t: String): String =
    t.toLowerCase.replaceAll("[^a-z ]", " ").replaceAll(" +", " ").trim

  def classifySector(text: String): String =
    if (text.contains("spark")) "Data"
    else if (text.contains("stream")) "Streaming"
    else if (text.contains("customer")) "CRM"
    else if (text.contains("vector")) "ML"
    else "Autre"

  def qualification(priority: String): Int = priority match {
    case "1-URGENT" => 5
    case "2-HIGH" => 4
    case "3-MEDIUM" => 3
    case "4-NOT SPECIFIED" => 2
    case _ => 1
  }

  def open(): EnrichClient = new EnrichClient {
    def enrichBatch(batch: Seq[OfferText]): Seq[EnrichResult] =
      batch.map(o => EnrichResult(o.offer_id, normalizeTitle(o.title),
        classifySector(o.description), qualification(o.priority)))
  }
}

/** The LLM-enrichment ADAPTER — the seam the reference fills with Groq
  * (init_groq.py) and this container fills with [[RuleEnrichClient]].
  * What is REAL here, regardless of backend, is every Spark-side
  * mechanic a production LLM stage needs:
  *
  *  - '''partition lifecycle''': one client per partition via
  *    `mapPartitions` + [[EnrichClientFactory.open]], closed when the
  *    iterator drains — never a client per row, never driver-side;
  *  - '''batching''': rows stream through in fixed-size batches
  *    (`batchSize`), the unit a rate-limited API wants;
  *  - '''within-partition memoization''': duplicate inputs (same
  *    (title, description, priority)) call the backend ONCE — the get-or-create
  *    discipline of the reference's dictionnaire_titres, applied at
  *    the call boundary where it saves real money;
  *  - '''bounded retry''': a failing batch retries up to `maxRetries`
  *    times and then FAILS THE TASK (Spark's own retry/lineage then
  *    governs) — errors are never swallowed into fabricated rows.
  *
  * The iterator is lazy end-to-end: a partition never materializes more
  * than one batch of in-flight requests plus the memo map.
  */
object EnrichAdapter {

  val DefaultBatchSize = 64

  def enrich(offers: Dataset[OfferText], factory: EnrichClientFactory,
      batchSize: Int = DefaultBatchSize,
      maxRetries: Int = 2): Dataset[EnrichResult] = {
    import offers.sparkSession.implicits._
    offers.mapPartitions { rows =>
      val client = factory.open()
      val memo = scala.collection.mutable.HashMap
        .empty[(String, String, String), EnrichResult]
      def callWithRetry(batch: Seq[OfferText]): Seq[EnrichResult] = {
        var attempt = 0
        while (true) {
          try return client.enrichBatch(batch)
          catch {
            case _: Exception if attempt < maxRetries => attempt += 1
          }
        }
        sys.error("unreachable")
      }
      val out = rows.grouped(batchSize).flatMap { batch =>
        // one backend row per DISTINCT unseen input — duplicates within
        // the batch and across earlier batches never reach the client
        val misses = batch
          .filterNot(o => memo.contains((o.title, o.description, o.priority)))
          .distinctBy(o => (o.title, o.description, o.priority))
        val fresh = if (misses.isEmpty) Nil else callWithRetry(misses)
        misses.zip(fresh).foreach { case (o, r) =>
          memo((o.title, o.description, o.priority)) = r }
        // re-emit in input order; memo answers re-key to each row's id
        batch.map { o =>
          val m = memo((o.title, o.description, o.priority))
          EnrichResult(o.offer_id, m.titre_homogene, m.secteur,
            m.niveau_qualification)
        }
      }
      new Iterator[EnrichResult] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h) client.close()
          h
        }
        def next(): EnrichResult = out.next()
      }
    }
  }

  /** The typed path over testdata, shaped like the reference's stage:
    * documents play offers (the text's head as the raw title, the full
    * text as the description) with the order-priority domain as the
    * gradable field — the same castings the oracled [[Enrich]] queries
    * use. */
  def enrichOffers(s: SparkSession, dir: String,
      factory: EnrichClientFactory = RuleEnrichClient): Dataset[EnrichResult] = {
    import s.implicits._
    val src = graft.sources.Tables.documents(s, dir)
      .join(graft.sources.Tables.orders(s, dir)
        .select(col("o_orderkey").as("doc_id"),
          col("o_orderpriority").as("priority")), Seq("doc_id"))
      .select(col("doc_id").as("offer_id"),
        substring(col("text"), 1, 40).as("title"),
        col("text").as("description"), col("priority"))
      .as[OfferText]
    enrich(src, factory)
  }
}
