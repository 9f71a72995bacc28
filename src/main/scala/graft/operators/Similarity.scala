package graft.operators

import graft.Q
import graft.functions.Vectors._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (array<float> vectors).
  *
  * Two paths (SURVEY.md §2F):
  *  - brute-force cosine top-k: exact baseline, O(|Q| * N) — right shape
  *    when the query set is bounded (the queries broadcast; the corpus
  *    streams map-side, top-k folds per partition before the final k).
  *  - sign-LSH (random-hyperplane) bucketed: corpus and queries hash to
  *    8-bit sign buckets; only same-bucket pairs are scored. The bucket
  *    join is an equi-shuffle-join — the corpus x corpus path that stays
  *    feasible at 100 TB, trading recall for a 2^bits fan-in reduction.
  *
  * Hyperplanes are derived from md5 parity (deterministic, engine
  * portable); similarity arithmetic uses the exact quantized-integer dot
  * products of [[graft.functions.Vectors]], so ranking ties cannot differ
  * between engines or cluster runs (vec_id is the final tie-break).
  */
object Similarity {

  private val TopK = 5
  private val NPlanes = 8
  private val Dim = 64

  /** Query set: every 100th vector — a bounded driver-independent
    * selection that scales with the corpus.
    */
  private def queriesDf(s: SparkSession, dir: String): DataFrame =
    quantized(s, dir).filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("nn").as("q_nn"))

  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .select(col("vec_id"), col("qv"), dotQ(col("qv"), col("qv")).as("nn"))

  private val sqlQuant =
    s"""quant AS (SELECT vec_id, qv, ${sqlDotQ("qv", "qv", Dim)} AS nn
                  FROM (SELECT vec_id, ${sqlQuantize("embedding")} AS qv
                        FROM embeddings))"""

  /** Brute-force cosine top-k per query (exact ANN baseline). */
  def annTopkBruteforce(s: SparkSession, dir: String): DataFrame = {
    val q = queriesDf(s, dir)
    val c = quantized(s, dir)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    broadcast(q).join(c, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        cosineQ(dotQ(col("q_qv"), col("qv")), col("q_nn"), col("nn"))
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .orderBy("q_id", "rank")
  }

  val annTopkBruteforceSql: String =
    s"""WITH $sqlQuant,
       scored AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                    ${sqlCosineQ(sqlDotQ("q.qv", "c.qv", Dim), "q.nn", "c.nn")} AS cos_sim
                  FROM quant q JOIN quant c ON q.vec_id % 100 = 0
                   AND q.vec_id <> c.vec_id)
       SELECT q_id, vec_id, cos_sim,
              CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
       FROM scored QUALIFY rank <= $TopK ORDER BY q_id, rank"""

  /** Deterministic ±1 hyperplane matrix (j < NPlanes, d < Dim) from md5
    * parity — tiny, broadcast; identical in the SQL oracle.
    */
  private def planesDf(s: SparkSession): DataFrame =
    s.range(NPlanes).toDF("j").crossJoin(s.range(Dim).toDF("d"))
      .select(col("j").cast("int").as("j"), col("d").cast("int").as("d"),
        when(ascii(substring(md5(concat(col("j").cast("string"), lit(":"),
          col("d").cast("string"))), 1, 1)) % 2 === 0, 1)
          .otherwise(-1).as("w"))

  private val sqlPlanes =
    s"""planes AS (SELECT j, d,
          CASE WHEN ascii(substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1)) % 2 = 0
               THEN 1 ELSE -1 END AS w
        FROM (SELECT unnest(generate_series(0, ${NPlanes - 1})) AS j) AS js,
             (SELECT unnest(generate_series(0, ${Dim - 1})) AS d) AS ds)"""

  /** Sign-LSH bucket per vector: bit j = sign(q . plane_j), bucket =
    * sum(bit_j << j). Integer dot products — exact under any shuffle.
    */
  private def buckets(s: SparkSession, dir: String): DataFrame = {
    val qr = quantized(s, dir)
      .select(col("vec_id"), posexplode(col("qv")).as(Seq("d", "x")))
    qr.join(broadcast(planesDf(s)), "d")
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(col("w") * col("x")).as("dot"))
      .groupBy("vec_id")
      .agg(sum(when(col("dot") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(lit(0L)))
        .as("bucket"))
  }

  private val sqlBuckets =
    s"""qrows AS (SELECT vec_id, unnest(qv) AS x,
                         unnest(generate_series(0, ${Dim - 1})) AS d
                  FROM quant),
       bits AS (SELECT vec_id, j, SUM(w * x) AS dot
                FROM qrows JOIN planes USING (d) GROUP BY vec_id, j),
       buck AS (SELECT vec_id,
                  CAST(SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << j)
                           ELSE 0 END) AS BIGINT) AS bucket
                FROM bits GROUP BY vec_id)"""

  /** LSH-bucketed ANN: score only same-bucket (query, corpus) pairs,
    * then exact cosine rerank to top-k. Recall < 1 by design; ranking
    * within the candidate set is exact.
    */
  def annTopkLsh(s: SparkSession, dir: String): DataFrame = {
    val b = buckets(s, dir)
    val c = quantized(s, dir).join(b, "vec_id")
    val q = c.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("nn").as("q_nn"), col("bucket").as("q_bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    broadcast(q)
      .join(c, col("q_bucket") === col("bucket") && col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        cosineQ(dotQ(col("q_qv"), col("qv")), col("q_nn"), col("nn"))
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .orderBy("q_id", "rank")
  }

  val annTopkLshSql: String =
    s"""WITH $sqlQuant,
       $sqlPlanes,
       $sqlBuckets,
       corp AS (SELECT quant.vec_id, qv, nn, bucket
                FROM quant JOIN buck ON quant.vec_id = buck.vec_id),
       scored AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                    ${sqlCosineQ(sqlDotQ("q.qv", "c.qv", Dim), "q.nn", "c.nn")} AS cos_sim
                  FROM corp q JOIN corp c ON q.vec_id % 100 = 0
                   AND q.bucket = c.bucket AND q.vec_id <> c.vec_id)
       SELECT q_id, vec_id, cos_sim,
              CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
       FROM scored QUALIFY rank <= $TopK ORDER BY q_id, rank"""

  // IVF parameters: deterministic coarse centroids (every 50th vector),
  // nProbe=2 — the classic inverted-file ANN layout: assignment is a
  // broadcast argmax, the inverted lists are an equi-join key.
  private val IvfProbe = 2

  /** IVF-bucketed ANN: corpus vectors are assigned to their nearest
    * coarse centroid (broadcast argmax — one map pass); queries probe
    * their `nProbe` nearest centroids and score only those inverted
    * lists. Unlike sign-LSH buckets, IVF adapts to the data's actual
    * geometry; centroids here are a deterministic corpus sample (a
    * k-means refinement would slot in without changing the plan shape).
    */
  def annTopkIvf(s: SparkSession, dir: String): DataFrame = {
    val c = quantized(s, dir)
    val cent = c.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"),
        col("nn").as("c_nn"))
    def nearest(n: Int, df: DataFrame, idCol: String) = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("c_cos").desc, col("c_id"))
      df.crossJoin(broadcast(cent))
        .select(col(idCol), col("c_id"),
          cosineQ(dotQ(col("qv"), col("c_qv")), col("nn"), col("c_nn"))
            .as("c_cos"))
        .withColumn("c_rank", row_number().over(w))
        .filter(col("c_rank") <= n)
        .select(col(idCol), col("c_id"))
    }
    val assign = nearest(1, c, "vec_id")
    val probes = nearest(IvfProbe, c.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("qv"), col("nn")), "q_id")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    probes.join(assign, "c_id")
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id")).distinct()
      .join(c.select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("nn").as("q_nn")), "q_id")
      .join(c, "vec_id")
      .select(col("q_id"), col("vec_id"),
        cosineQ(dotQ(col("q_qv"), col("qv")), col("q_nn"), col("nn"))
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .orderBy("q_id", "rank")
  }

  val annTopkIvfSql: String =
    s"""WITH $sqlQuant,
       cent AS (SELECT vec_id AS c_id, qv AS c_qv, nn AS c_nn
                FROM quant WHERE vec_id % 50 = 0),
       assign AS (
         SELECT vec_id, c_id FROM (
           SELECT q.vec_id, c.c_id,
                  ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                    ${sqlCosineQ(sqlDotQ("q.qv", "c.c_qv", Dim), "q.nn", "c.c_nn")} DESC,
                    c.c_id) AS r
           FROM quant q CROSS JOIN cent c) WHERE r <= 1),
       probes AS (
         SELECT q_id, c_id FROM (
           SELECT q.vec_id AS q_id, c.c_id,
                  ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                    ${sqlCosineQ(sqlDotQ("q.qv", "c.c_qv", Dim), "q.nn", "c.c_nn")} DESC,
                    c.c_id) AS r
           FROM quant q CROSS JOIN cent c WHERE q.vec_id % 100 = 0) WHERE r <= $IvfProbe),
       cand AS (SELECT DISTINCT q_id, vec_id
                FROM probes JOIN assign USING (c_id)
                WHERE q_id <> vec_id),
       scored AS (SELECT cand.q_id, cand.vec_id,
                    ${sqlCosineQ(sqlDotQ("q.qv", "c.qv", Dim), "q.nn", "c.nn")} AS cos_sim
                  FROM cand JOIN quant q ON cand.q_id = q.vec_id
                            JOIN quant c ON cand.vec_id = c.vec_id)
       SELECT q_id, vec_id, cos_sim,
              CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
       FROM scored QUALIFY rank <= $TopK ORDER BY q_id, rank"""

  def queries: Seq[Q] = Seq(
    Q("ann_topk_bruteforce", Some(annTopkBruteforceSql), bench = true)(annTopkBruteforce),
    Q("ann_topk_lsh", Some(annTopkLshSql))(annTopkLsh),
    Q("ann_topk_ivf", Some(annTopkIvfSql))(annTopkIvf))
}
