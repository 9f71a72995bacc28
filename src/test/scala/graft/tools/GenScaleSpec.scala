package graft.tools

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sf1.0 gate's generator deserves a gate of its own: a K=3
  * replication of sf0.001 must preserve every property the scaling
  * exponents' interpretation rests on — FK closure, key uniqueness,
  * fixed dims, fixed time span (density scaling), and the near-dup
  * salt design.
  */
class GenScaleSpec extends AnyFunSuite {
  import SharedSpark._

  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("genscale").toString
    GenScale.run(spark, sf, d, 3)
    d
  }
  private def t(name: String) = spark.read.parquet(s"$dst/$name.parquet")
  private def src(name: String) = spark.read.parquet(s"$sf/$name.parquet")

  test("replicated tables triple; fixed dims stay fixed") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(t(n).count() === 3 * src(n).count(), n)
    for (n <- Seq("region", "nation"))
      assert(t(n).count() === src(n).count(), n)
  }

  test("keys stay unique and every FK edge closes") {
    assert(t("customer").select("c_custkey").distinct().count() ===
      t("customer").count())
    assert(t("orders").select("o_orderkey").distinct().count() ===
      t("orders").count())
    def orphans(child: String, ck: String, parent: String, pk: String) =
      t(child).join(t(parent), col(ck) === col(pk), "left_anti").count()
    assert(orphans("orders", "o_custkey", "customer", "c_custkey") === 0)
    assert(orphans("lineitem", "l_orderkey", "orders", "o_orderkey") === 0)
    assert(orphans("lineitem", "l_partkey", "part", "p_partkey") === 0)
    assert(orphans("lineitem", "l_suppkey", "supplier", "s_suppkey") === 0)
    assert(orphans("events", "user_id", "customer", "c_custkey") === 0)
    assert(orphans("customer", "c_nationkey", "nation", "n_nationkey") === 0)
  }

  test("names regenerate from shifted keys; per-key fanouts are preserved") {
    assert(t("customer").filter(col("c_name") =!=
      format_string("Customer#%09d", col("c_custkey"))).count() === 0)
    // per-customer order counts replicate exactly: the max per-key
    // fanout is unchanged, so join selectivities scale linearly
    def maxFan(df: org.apache.spark.sql.DataFrame, k: String) =
      df.groupBy(k).count().agg(max("count")).head.getLong(0)
    assert(maxFan(t("orders"), "o_custkey") ===
      maxFan(src("orders"), "o_custkey"))
  }

  test("--files N writes a multi-file layout readable by Tables; k>10 salts stay honest") {
    val d = java.nio.file.Files.createTempDirectory("genscale_mf").toString
    GenScale.run(spark, sf, d, 12, files = 4)
    val liDir = new java.io.File(s"$d/lineitem.parquet")
    assert(liDir.isDirectory, "multi-file mode must write a directory")
    val parts = liDir.listFiles().count(_.getName.startsWith("part-"))
    assert(parts === 4, s"expected 4 part files, got $parts")
    for (n <- Seq("orders", "lineitem", "documents"))
      assert(spark.read.parquet(s"$d/$n.parquet").count() ===
        12 * src(n).count(), n)
    // scan parallelism now comes from the files themselves
    assert(spark.read.parquet(s"$d/lineitem.parquet")
      .rdd.getNumPartitions >= 4)
    val docs = spark.read.parquet(s"$d/documents.parquet")
    // replica indices >= 10 render 6-char salts; n_chars must track
    assert(docs.filter(col("text").endsWith(" rep11")).count() > 0)
    assert(docs.filter(col("n_chars") =!= length(col("text"))).count() === 0)
  }

  test("sorted layout restores natural clustering inside every part file") {
    val d = java.nio.file.Files.createTempDirectory("genscale_sorted").toString
    GenScale.run(spark, sf, d, 2, files = 3, sorted = true)
    // every events part file is time-sorted ON ITS OWN (the flat
    // layout's order, which plain repartition(files) destroys — the
    // §7a.1 round-14 ingest-order experiment's instrument)
    val evDir = new java.io.File(s"$d/events.parquet")
    val partFiles = evDir.listFiles().filter(_.getName.startsWith("part-"))
    assert(partFiles.length === 3)
    partFiles.foreach { f =>
      val ts = spark.read.parquet(f.getAbsolutePath)
        .select("ts").coalesce(1).collect().map(_.getTimestamp(0).getTime)
      assert(ts.zip(ts.drop(1)).forall { case (a, b) => a <= b },
        s"${f.getName} is not time-sorted")
    }
    // row content identical to the unsorted layout (order is layout,
    // not data)
    val d2 = java.nio.file.Files.createTempDirectory("genscale_unsorted").toString
    GenScale.run(spark, sf, d2, 2, files = 3)
    val a = spark.read.parquet(s"$d/events.parquet")
    val b = spark.read.parquet(s"$d2/events.parquet")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("time span is FIXED (density scales) and document salt keeps n_chars honest") {
    def days(df: org.apache.spark.sql.DataFrame) =
      df.select(to_date(col("ts")).as("d")).distinct().count()
    assert(days(t("events")) === days(src("events")),
      "replication must scale daily VOLUME, not the calendar")
    assert(t("documents").filter(col("n_chars") =!= length(col("text")))
      .count() === 0)
    // replicas are NEAR dups (salted), never exact dups
    assert(t("documents").select("text").distinct().count() ===
      t("documents").count())
  }
}
