package graft

import java.nio.file.Files

import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input robustness: every registered query must EXECUTE on
  * a corpus with the right schemas and zero rows — the shape of an
  * empty partition, a filtered-out date range, or a first run before
  * data lands. Nothing may throw; results must be collectable (empty
  * or a well-defined aggregate row). A 100 TB pipeline hits this shape
  * constantly (per-partition retries, backfills, new tenants).
  */
class EmptyCorpusSpec extends AnyFunSuite {
  import SharedSpark._

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.table(spark, sf, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // events: write the RAW schema (int64 nano ts), not the converted
    // one — Tables.events re-applies the nanos conversion on read
    spark.read.parquet(s"$sf/events.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  Registry.all.foreach { q =>
    test(s"${q.name} executes on an empty corpus") {
      val rows = q.fn(spark, emptyDir).collect()
      assert(rows != null)
    }
  }
}
