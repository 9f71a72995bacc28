package graft

import org.apache.spark.sql.SparkSession

/** One session for the whole test run (Spark startup dominates suite
  * time otherwise). Same confs as Graft.session, smaller parallelism.
  */
object SharedSpark {
  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = Graft.builder(cores = "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Graft.tune(s)
  }
}
