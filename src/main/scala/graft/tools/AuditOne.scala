package graft.tools

import graft.Graft

/** Dev harness: ResourceAudit one or more registered queries at a given
  * sf dir — wall + scan/shuffle/spill bytes, the numbers the scale
  * claims are checked against (`tools/sf1_gate.sh` records them
  * suite-wide; this is the per-query spot-check).
  */
object AuditOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = Graft.session()
    // JIT/codegen warmup at the smallest sf, like Bench
    names.foreach { n =>
      try graft.Registry.byName(n).fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    ResourceAudit.auditQueries(spark, sfDir, names)
      .collect().foreach { r =>
        val mb = 1024.0 * 1024.0
        println(f"[auditone] ${r.getString(0)}%s wall=${r.getDouble(1)}%.2fs " +
          f"tasks=${r.getLong(2)}%d input=${r.getLong(3) / mb}%.1fMB " +
          f"shuffle_w=${r.getLong(6) / mb}%.1fMB " +
          f"shuffle_w_recs=${r.getLong(7)}%d spill=${r.getLong(8) / mb}%.1fMB " +
          f"spread=${r.getDouble(9)}%.2f gc_ms=${r.getLong(10)}%d")
      }
    spark.stop()
  }
}
