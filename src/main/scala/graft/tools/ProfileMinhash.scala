package graft.tools

import graft.Graft
import graft.functions.Text._
import org.apache.spark.sql.functions._

/** Scratch profiler for the MinHash pipeline stages (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val rounds = sys.env.get("SPARK_GRAFT_PROFILE_ROUNDS")
      .map(_.toInt).getOrElse(2)
    val docs = graft.sources.Tables.documents(spark, dir)
    val shr = docs.select(col("doc_id"),
      explode(array_distinct(wordShingles(toks(col("text")), 3))).as("sh"))
    for (round <- 1 to rounds) {
      println(s"--- round $round")
      time("scan+shingle+explode (count)")(shr.count())
      // mirrors Dedup's 4-lanes-per-digest signature shape
      val mhCols = (0 until 16).map(i =>
        min(substring(md5(concat(lit(s"${i / 4}:"), col("sh"))),
          (i % 4) * 8 + 1, 8)).as(s"mh$i"))
      val mh = shr.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
      time("minhash agg")(mh.write.format("noop").mode("overwrite").save())
      val bandRows = mh.select(col("doc_id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band_id"),
            md5(concat_ws(",", (0 until 4).map(r => col(s"mh${b * 4 + r}")): _*))
              .as("band_hash"))): _*)).as("bb"))
        .select(col("doc_id"), col("bb.band_id").as("band_id"),
          col("bb.band_hash").as("band_hash"))
      val cand = bandRows.groupBy("band_id", "band_hash")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(col("ids"), posexplode(col("ids")).as(Seq("i", "doc_a")))
        .select(col("doc_a"),
          explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("doc_b"))
        .distinct()
      println(s"candidates: ${time("bands+candidates")(cand.count())}")
      time("full operator")(
        graft.operators.Dedup.dedupMinhashLsh(spark, dir)
          .write.format("noop").mode("overwrite").save())
      // accepted = the operator's output pairs — candidates÷accepted is
      // the rides-output ratio the §7a.1 scale adjudication records
      // (VERDICT r14 item 4, the simhash precedent)
      println(s"accepted: ${time("accepted pairs (count)")(
        graft.operators.Dedup.dedupMinhashLsh(spark, dir).count())}")
    }
    spark.stop()
  }
}
