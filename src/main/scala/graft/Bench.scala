package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline (bench-flagged) queries at the
  * SPARK_GRAFT_SF_DIR scale factor and prints ONE JSON line. Each query
  * is fully materialized via the noop sink (a bare count() would let
  * Catalyst prune the projection and under-report).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = Graft.session()
    val qs = Registry.all.filter(_.bench)
    // one warmup pass on the smallest sf to JIT/codegen before timing
    qs.foreach { q =>
      try q.fn(spark, "/root/testdata/sf0.001").write.format("noop")
        .mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // best of 2: single measurements at this scale carry ~15% scheduler
    // noise; the minimum is the stable estimate of the plan's cost
    val results = qs.map { q =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      q.name -> times.min
    }
    val qJson = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
