package graft.tools

import graft.{Graft, Registry}

/** Plan-review harness: prints the formatted physical plan for the
  * given query names (default: headline bench queries) so scan pruning
  * (ReadSchema/PushedFilters), broadcast choices, and WholeStageCodegen
  * spans can be inspected. `tools/explain.sh <names...>`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names =
      if (args.nonEmpty) args.toSeq else Registry.all.filter(_.bench).map(_.name)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Registry.byName(n).fn(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
