package graft.tools

import graft.{Graft, Registry}

/** Dev harness: time one registered query N times at a given sf dir. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = Graft.session()
    val q = Registry.byName(name)
    q.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[timeone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
