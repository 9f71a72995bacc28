package graft.tools

import graft.{Graft, Registry}

/** Single-query timing harness: best-of-3 wall time for the given query
  * names at SPARK_GRAFT_SF_DIR (noop-sink materialization, same as
  * Bench). For measuring one operator's iteration without paying the
  * whole headline suite.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val q = Registry.byName(n)
      q.fn(spark, "/root/testdata/sf0.001").write.format("noop")
        .mode("overwrite").save() // warmup/JIT
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q.fn(spark, sf).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $n best=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
