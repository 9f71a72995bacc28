package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline (bench-flagged) queries at the
  * SPARK_GRAFT_SF_DIR scale factor and prints ONE JSON line. Each query
  * is fully materialized via the noop sink (a bare count() would let
  * Catalyst prune the projection and under-report).
  *
  * Contention robustness (two rounds of phantom >4x outliers on the
  * driver's bench host): best of THREE timed passes per query, plus
  * per-query spread fields so a contended run self-documents — `spread`
  * is the median absolute deviation of the three times, and any query
  * whose worst pass exceeds 2x its best lands in `outliers`. A noisy
  * host then shows up as large MADs / a populated outlier list around
  * believable minima, instead of silently inflating the totals.
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
    val results = qs.map { q =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median = times(times.size / 2)
      val mad = times.map(t => math.abs(t - median)).sorted.apply(times.size / 2)
      (q.name, times.min, times.max, mad)
    }
    def fmtMap(f: ((String, Double, Double, Double)) => String): String =
      results.map(f).mkString("{", ",", "}")
    val qJson = fmtMap { case (k, mn, _, _) => "\"" + k + "\":" + f"$mn%.3f" }
    val spreadJson = fmtMap { case (k, _, _, mad) => "\"" + k + "\":" + f"$mad%.3f" }
    val outliers = results.collect {
      case (k, mn, mx, _) if mx > 2.0 * mn && mx - mn > 0.25 => "\"" + k + "\""
    }.mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qJson,"spread":$spreadJson,"outliers":$outliers,"sf":"$sfDir"}""")
    spark.stop()
  }
}
