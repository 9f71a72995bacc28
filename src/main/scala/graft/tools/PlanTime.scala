package graft.tools

import graft.{Graft, Registry}

/** Dev harness: isolate driver-side plan-construction cost per bench
  * query — builds the DataFrame (including any eager localCheckpoint
  * work) and forces analysis + optimization + physical planning via
  * `executedPlan`, WITHOUT running the job. Prints build-vs-plan
  * milliseconds so "the query is slow" can be attributed between
  * Catalyst time and execution time (guide §7.3: planning is
  * single-threaded driver work inside every timed pass).
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session()
    val names =
      if (args.nonEmpty) args.toSeq else Registry.all.filter(_.bench).map(_.name)
    // warm round: JIT + rule instantiation
    names.foreach { n =>
      val df = Registry.byName(n).fn(spark, sfDir)
      df.queryExecution.executedPlan
    }
    val rows = names.map { n =>
      val t0 = System.nanoTime()
      val df = Registry.byName(n).fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      (n, (t1 - t0) / 1e6, (t2 - t1) / 1e6)
    }
    rows.sortBy(-_._3).foreach { case (n, b, p) =>
      println(f"[plantime] $n%-28s build=$b%8.1f ms plan=$p%8.1f ms")
    }
    spark.stop()
  }
}
