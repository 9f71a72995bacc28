package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Simulates the driver harness: a BARE session (none of Graft's confs)
  * calling the SparkEntry contract — proves Graft.tune's defensive
  * settings and function registrations carry the contract on a session
  * the engine did not build.
  */
object DriverSim {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[driver-sim] entry rows: ${SparkEntry.entry(spark).count()}")
    // events (nanos timestamps), native expressions, and streaming-twin
    // batch ops all through the public map on the foreign session
    for (q <- Seq("events_hourly", "dedup_embedding_cosine",
        "top_tokens_sketch", "dedup_minhash_lsh")) {
      val n = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      println(s"[driver-sim] $q rows: $n")
    }
    println(s"[driver-sim] oracle entries: ${SparkEntry.oracleSql.size}")
    spark.stop()
  }
}
