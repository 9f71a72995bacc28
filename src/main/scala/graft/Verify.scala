package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.util.control.NonFatal
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver contract: (sfDir, outDir). Extra args = query-name filter
    // for fast local iteration (dump only those queries).
    val sfDir = args(0)
    val outDir = args(1)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // 4 queries in flight: Spark schedules concurrent jobs fine and the
    // per-query fixed overhead (planning, AQE rounds) overlaps; failures
    // stay per-query so one bad operator can't zero the round
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val failed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stalePoisoned = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val runs = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      scala.concurrent.Future {
        // NonFatal only: after an OOM/LinkageError the JVM is not
        // trustworthy — no result written from it should reach the
        // driver's compare, and the error must surface, not be queued.
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case NonFatal(e) =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          failed.add(name)
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(runs),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // Serial retry once the pool has drained: with 4 concurrent queries
    // sharing one executor-memory pool, a heavy query can lose the
    // memory race to its neighbors (observed at the sf1.0 gate:
    // UNABLE_TO_ACQUIRE_MEMORY on the 6M-row fact×fact window while
    // three other queries held the pool) — alone it has the whole pool,
    // so only DETERMINISTIC failures survive to the driver's compare.
    failed.forEach { name =>
      System.err.println(s"[verify] retrying $name serially")
      try SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case NonFatal(e) =>
        System.err.println(s"[verify] $name failed (retry): ${e.getMessage}")
        // outDir persists across runs (e.g. /tmp/verify_sf10): a stale
        // result from a previous run at $outDir/$name would make the
        // driver compare an OLD result against the fresh oracle and a
        // double-failed query could silently pass. Remove it so parity
        // hits its 'spark output missing' FAIL path instead. The walk
        // stream must close (handle leak otherwise), and a deletion
        // hiccup must stay PER-QUERY — an IOException escaping this
        // forEach would abort the remaining serial retries and skip the
        // oracle_sql.json write, zeroing the whole round over one file.
        try {
          val dir = Paths.get(outDir, name)
          if (Files.exists(dir))
            scala.util.Using.resource(Files.walk(dir)) { w =>
              w.sorted(java.util.Comparator.reverseOrder())
                .forEach(p => Files.deleteIfExists(p))
            }
        } catch { case NonFatal(e2) =>
          System.err.println(
            s"[verify] $name stale-output cleanup failed: ${e2.getMessage}")
          // the stale parquet SURVIVED — without a machine-visible
          // poison the driver would compare the OLD result against the
          // fresh oracle and a double-failed query could silently
          // pass. Two independent poisons: a garbage .parquet file the
          // directory reader CANNOT skip, and a nonzero exit after
          // oracle_sql.json is written. The name must not start with
          // '_' or '.' — parquet directory readers (Spark, and
          // pandas/pyarrow's default ignore_prefixes) silently skip
          // those as metadata, which made the original `_STALE` marker
          // inert (ADVICE r14). A non-parquet payload under a .parquet
          // name makes any whole-directory read fail parsing it.
          try Files.writeString(
            Paths.get(outDir, name, "zzz_stale_poison.parquet"),
            s"stale output: query + cleanup both failed: ${e2.getMessage}")
          catch { case NonFatal(_) => () }
          stalePoisoned.add(name)
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (!stalePoisoned.isEmpty) {
      System.err.println(
        s"[verify] EXITING NONZERO: stale outputs could not be removed for " +
          s"${String.join(",", stalePoisoned)} — parity must not consume them")
      sys.exit(1)
    }
  }
}
