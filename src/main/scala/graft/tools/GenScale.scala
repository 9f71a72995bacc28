package graft.tools

import graft.Graft
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the sf1.0 gate (VERDICT r9 #1): replicates a
  * driver testdata directory K× (default 10) with key offsets that
  * preserve every foreign-key relationship, so the engine's scaling
  * exponents can be MEASURED instead of argued. Default layout mirrors
  * the driver's (one flat `<table>.parquet` file per table) so
  * Tables/parity.py read it unchanged; an optional 4th argument
  * `files` writes each table as a DIRECTORY of that many part files
  * instead — the real-cluster layout, where scan parallelism comes
  * from file splits rather than Tables.fanOut's defensive repartition.
  *
  * Replication design (per replica r of K):
  * - every dense 0-based key shifts by r·|domain| (custkey +15000·r,
  *   orderkey +150000·r, …), and FK columns shift by their REFERENCED
  *   table's stride — per-key fanouts (orders/customer, lines/order,
  *   events/user) are exactly preserved, so join selectivities and
  *   group cardinalities scale linearly the way a real corpus does;
  * - region/nation stay fixed (true dimensions don't grow with data);
  * - Customer#/Supplier# names regenerate from the shifted key (same
  *   printf shape, uniqueness preserved); part names/brands keep their
  *   fixed domains;
  * - event timestamps keep their 30-day span → DAILY VOLUME scales
  *   10×, which is the axis the temporal operators' §6 stories claim;
  * - document text gains a per-replica salt token (` rep<r>`, r>0), so
  *   replicas form 10-member NEAR-duplicate clusters (bounded pair
  *   blowup, realistic for a crawl) rather than exact clones; n_chars
  *   shifts by the salt length;
  * - embeddings replicate with shifted ids (capped ANN query sets stay
  *   capped by construction).
  */
object GenScale {

  private def replicate(df: DataFrame, k: Int): DataFrame =
    df.withColumn("__r", explode(sequence(lit(0), lit(k - 1))))

  /** Write `<name>.parquet` in the layout `files` selects: 1 = ONE flat
    * FILE (the driver's layout — single row group, unsplittable, the
    * worst case Tables.fanOut defends against); N > 1 = a DIRECTORY of
    * N part files, the real-cluster layout where scan parallelism comes
    * from the files themselves (spark.read.parquet and parity.py read
    * both forms transparently).
    */
  /** Natural clustering column per table — the order the driver's flat
    * files ship in (events time-sorted: 0/100k adjacent inversions on
    * ts; fact tables key-clustered). The `sorted` layout restores it
    * INSIDE each part file after the replica fan-out: repartition(files)
    * otherwise permutes rows randomly, which is the adversarial worst
    * case for the planner's sort-owning operators (asof/sessionize/SMJ
    * lose their adaptive-run advantage — the §7a.1 round-14 experiment
    * isolates exactly this variable).
    */
  private val clusterCol = Map(
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "ts",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  private def writeFlat(s: SparkSession, df: DataFrame, dst: String,
      name: String, files: Int, sorted: Boolean = false): Unit = {
    val fin = new org.apache.hadoop.fs.Path(s"$dst/$name.parquet")
    val conf = s.sparkContext.hadoopConfiguration
    val fs = fin.getFileSystem(conf)
    if (files > 1) {
      fs.delete(fin, true) // a flat FILE of the same name would collide
      val parts = df.repartition(files)
      val out = clusterCol.get(name)
        .filter(_ => sorted)
        .map(c => parts.sortWithinPartitions(col(c)))
        .getOrElse(parts)
      out.write.mode(SaveMode.Overwrite)
        .parquet(fin.toString)
    } else {
      val tmp = s"$dst/.__gen_$name"
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val tmpPath = new org.apache.hadoop.fs.Path(tmp)
      val part = fs.listStatus(tmpPath)
        .map(_.getPath).find(_.getName.startsWith("part-"))
        .getOrElse(sys.error(s"no part file under $tmp"))
      fs.delete(fin, true) // a DIRECTORY of the same name would collide
      require(fs.rename(part, fin), s"rename failed: $part -> $fin")
      fs.delete(tmpPath, true)
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("testdata/sf1.0")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val files = args.lift(3).map(_.toInt).getOrElse(1)
    // 5th arg `sorted`: restore each table's natural clustering inside
    // every part file (time-clustered ingest — the §6 layout rule the
    // round-14 sort-path experiment tests)
    val sorted = args.lift(4).contains("sorted")
    val spark = Graft.session()
    run(spark, src, dst, k, files, sorted)
    Tables.names.foreach { t =>
      val n = spark.read.parquet(s"$dst/$t.parquet").count()
      println(s"[genscale] $t: $n rows")
    }
    spark.stop()
  }

  /** The generator body, separated from main so the spec can drive it
    * on the shared test session (main's stop() would kill it). */
  def run(spark: SparkSession, src: String, dst: String, k: Int,
      files: Int = 1, sorted: Boolean = false): Unit = {
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L
    val cStride = stride(Tables.customer(spark, src), "c_custkey")
    val oStride = stride(Tables.orders(spark, src), "o_orderkey")
    val pStride = stride(Tables.part(spark, src), "p_partkey")
    val sStride = stride(Tables.supplier(spark, src), "s_suppkey")
    val eStride = stride(Tables.events(spark, src), "event_id")
    val dStride = stride(Tables.table(spark, src, "documents"), "doc_id")
    val vStride = stride(Tables.table(spark, src, "embeddings"), "vec_id")

    def shifted(c: String, s0: Long) = (col(c) + col("__r") * s0).as(c)

    // fixed dimensions copy through untouched
    writeFlat(spark, Tables.region(spark, src), dst, "region", files, sorted)
    writeFlat(spark, Tables.nation(spark, src), dst, "nation", files, sorted)

    writeFlat(spark, replicate(Tables.customer(spark, src), k)
      .select(shifted("c_custkey", cStride),
        format_string("Customer#%09d", col("c_custkey") + col("__r") * cStride)
          .as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      dst, "customer", files, sorted)

    writeFlat(spark, replicate(Tables.supplier(spark, src), k)
      .select(shifted("s_suppkey", sStride),
        format_string("Supplier#%09d", col("s_suppkey") + col("__r") * sStride)
          .as("s_name"),
        col("s_nationkey"), col("s_acctbal")),
      dst, "supplier", files, sorted)

    writeFlat(spark, replicate(Tables.part(spark, src), k)
      .select(shifted("p_partkey", pStride), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice")),
      dst, "part", files, sorted)

    writeFlat(spark, replicate(Tables.orders(spark, src), k)
      .select(shifted("o_orderkey", oStride), shifted("o_custkey", cStride),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")),
      dst, "orders", files, sorted)

    writeFlat(spark, replicate(Tables.lineitem(spark, src), k)
      .select(shifted("l_orderkey", oStride), shifted("l_partkey", pStride),
        shifted("l_suppkey", sStride), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate")),
      dst, "lineitem", files, sorted)

    // events.user_id references customer keys → customer stride
    writeFlat(spark, replicate(Tables.events(spark, src), k)
      .select(shifted("event_id", eStride), col("ts"),
        shifted("user_id", cStride), col("event_type"), col("value"),
        col("props")),
      dst, "events", files, sorted)

    writeFlat(spark, replicate(Tables.table(spark, src, "documents"), k)
      .select(shifted("doc_id", dStride),
        when(col("__r") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("__r")))
          .as("text"),
        col("lang"), col("source"),
        // salt length is dynamic: " rep<r>" is 5 chars only for r <= 9
        (col("n_chars") + when(col("__r") === 0, lit(0L))
          .otherwise(length(concat(lit(" rep"),
            col("__r").cast("string"))).cast("long")))
          .as("n_chars")),
      dst, "documents", files, sorted)

    writeFlat(spark, replicate(Tables.table(spark, src, "embeddings"), k)
      .select(shifted("vec_id", vStride), col("embedding"), col("label")),
      dst, "embeddings", files, sorted)
  }
}
