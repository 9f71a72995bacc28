package graft

import java.nio.file.Files

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input robustness, part 2: every registered query must
  * EXECUTE on a corpus whose measure columns are CONSTANT — zero
  * variance, a single distinct timestamp, identical documents and
  * embeddings. This is the input class that zeroes every variance,
  * rank-spread and time-span denominator at once, and ANSI Spark
  * throws DIVIDE_BY_ZERO where legacy mode would have emitted
  * Inf/NaN (the round-6 finding). A real pipeline meets this shape
  * on single-tenant slices, first-day backfills, and stuck upstream
  * producers; the contract is NULL statistics, never a crash.
  */
class ConstantCorpusSpec extends AnyFunSuite {
  import SharedSpark._

  private def constantize(df: DataFrame, subs: (String, Any)*): DataFrame =
    subs.foldLeft(df) { case (d, (c, v)) =>
      d.withColumn(c, lit(v).cast(d.schema(c).dataType))
    }

  private lazy val constDir: String = {
    val dir = Files.createTempDirectory("graft_const").toString
    def w(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    Seq("region", "nation", "customer", "supplier").foreach { t =>
      w(Tables.table(spark, sf, t), t)
    }
    w(constantize(Tables.table(spark, sf, "part"),
      "p_retailprice" -> 50.0, "p_size" -> 10), "part")
    w(constantize(Tables.table(spark, sf, "orders"),
      "o_totalprice" -> 100.0,
      "o_orderdate" -> "2024-01-15 00:00:00"), "orders")
    w(constantize(Tables.table(spark, sf, "lineitem"),
      "l_quantity" -> 5.0, "l_extendedprice" -> 100.0,
      "l_discount" -> 0.05, "l_tax" -> 0.02,
      "l_shipdate" -> "2024-01-20 00:00:00"), "lineitem")
    // events via the repaired loader so ts lands as a plain timestamp
    // (Tables.events passes TIMESTAMP through unchanged on re-read)
    w(constantize(Tables.events(spark, sf),
      "ts" -> "2024-01-15 12:00:00", "value" -> 1.0), "events")
    w(constantize(Tables.documents(spark, sf),
      "text" -> "alpha beta gamma", "n_chars" -> 16L), "documents")
    w(Tables.embeddings(spark, sf)
      .withColumn("embedding",
        expr("CAST(array_repeat(0.5F, 64) AS ARRAY<FLOAT>)")), "embeddings")
    dir
  }

  Registry.all.foreach { q =>
    test(s"${q.name} executes on a constant corpus") {
      val rows = q.fn(spark, constDir).collect()
      assert(rows != null)
    }
  }
}
