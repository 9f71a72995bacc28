package graft.tools

import org.apache.spark.sql.DataFrame

/** Canonicalized plan-shape fingerprints for the frozen bench
  * headliners — the machine check behind three rounds of "bench drift
  * is host contention, not a plan change" adjudications (VERDICT r9
  * #6): if a headliner's physical plan SHAPE changes, the hash changes
  * and the gate fails loudly; if only the wall clock moves, the hash
  * proves the plan did not.
  *
  * Canonical form: the pre-AQE physical operator tree rendered as
  * nodeName(child,...) — expression ids, file paths, sizes and stats
  * are all absent by construction, so the hash is stable across hosts
  * and testdata locations but sensitive to any operator insertion,
  * removal, reorder, or join-strategy flip. Plans are fingerprinted
  * PER SCALE FACTOR (size-based join planning can legitimately differ
  * across SFs); the committed file records one line per
  * (sf-label, query): `sf0.001 q1_agg <md5>`.
  *
  * Regenerate after an INTENTIONAL plan change with:
  * `sbt "runMain graft.tools.PlanFingerprint"` (rewrites the resource
  * file in-place; review the diff like any other plan review).
  */
object PlanFingerprint {

  val File = "src/test/resources/plan_fingerprints.txt"

  /** The scale factors whose plans are pinned. */
  val Sfs: Seq[(String, String)] = Seq(
    "sf0.001" -> "/root/testdata/sf0.001",
    "sf0.1" -> "/root/testdata/sf0.1")

  def shape(df: DataFrame): String = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): String =
      p.nodeName + (if (p.children.isEmpty) ""
                    else p.children.map(walk).mkString("(", ",", ")"))
    walk(df.queryExecution.sparkPlan)
  }

  def hash(df: DataFrame): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(shape(df).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Current fingerprints of every bench-flagged query at every pinned
    * SF, as (sfLabel, name) -> hash. */
  def current(s: org.apache.spark.sql.SparkSession)
      : Map[(String, String), String] =
    (for {
      (label, dir) <- Sfs
      q <- graft.Registry.all.filter(_.bench)
    } yield (label, q.name) -> hash(q.fn(s, dir))).toMap

  /** The committed fingerprints (empty if the resource is absent). */
  def committed(): Map[(String, String), String] = {
    val f = new java.io.File(File)
    if (!f.exists()) Map.empty
    else scala.io.Source.fromFile(f).getLines()
      .filter(_.nonEmpty).map { l =>
        val Array(sf, n, h) = l.split(" ")
        (sf, n) -> h
      }.toMap
  }

  /** Regenerate the committed file from the current plans. */
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    val cur = current(spark)
    val out = cur.toSeq.sortBy { case ((sf, n), _) => (sf, n) }
      .map { case ((sf, n), h) => s"$sf $n $h" }
      .mkString("", "\n", "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(File),
      out.getBytes("UTF-8"))
    println(s"wrote ${cur.size} fingerprints to $File")
    spark.stop()
  }
}
