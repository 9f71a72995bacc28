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

  /** Hard cap on the registered query set: every 100th vector AND
    * vec_id below 100*MaxQueries, so |Q| <= MaxQueries no matter how
    * large the corpus grows — brute-force stays O(|Q|*N) = O(N), never
    * O(N^2/100).
    */
  private val MaxQueries = 100
  private val queryPred =
    col("vec_id") % 100 === 0 && col("vec_id") < 100L * MaxQueries
  private def sqlQueryPred(a: String) =
    s"$a.vec_id % 100 = 0 AND $a.vec_id < ${100L * MaxQueries}"

  private def queriesDf(s: SparkSession, dir: String): DataFrame =
    quantized(s, dir).filter(queryPred)
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
                  FROM quant q JOIN quant c ON ${sqlQueryPred("q")}
                   AND q.vec_id <> c.vec_id)
       SELECT q_id, vec_id, cos_sim,
              CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
       FROM scored QUALIFY rank <= $TopK ORDER BY q_id, rank"""

  /** Deterministic ±1 hyperplane j as a LITERAL array<bigint> — computed
    * at plan-build time with the exact md5-parity formula the SQL twin
    * uses (`ascii(first hex char of md5("j:d")) % 2`), so both engines
    * see identical planes without materializing a planes relation.
    */
  private[operators] def planeVec(j: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(Dim) { d =>
      val hex = md.digest(s"$j:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.charAt(0).toInt % 2 == 0) 1L else -1L
    }
  }

  private val sqlPlanes =
    s"""planes AS (SELECT j, d,
          CASE WHEN ascii(substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1)) % 2 = 0
               THEN 1 ELSE -1 END AS w
        FROM (SELECT unnest(generate_series(0, ${NPlanes - 1})) AS j) AS js,
             (SELECT unnest(generate_series(0, ${Dim - 1})) AS d) AS ds)"""

  /** Sign-LSH bucket per vector, fully MAP-SIDE: bit j = sign(qv .
    * plane_j) via NPlanes codegen'd LongDot projections against literal
    * plane arrays — zero shuffles, zero explode. (The first-round form
    * posexploded each vector 64x and aggregated twice: two exchanges of
    * a Dim-times-blown-up relation for what is per-row arithmetic.)
    */
  private def buckets(s: SparkSession, dir: String): DataFrame =
    bucketsOf(quantized(s, dir))

  private def bucketsOf(q: DataFrame): DataFrame = {
    val bucket = (0 until NPlanes).map { j =>
      when(dotQ(col("qv"), lit(planeVec(j))) > 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    q.withColumn("bucket", bucket)
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
    val c = buckets(s, dir)
    val q = c.filter(queryPred)
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
                  FROM corp q JOIN corp c ON ${sqlQueryPred("q")}
                   AND q.bucket = c.bucket AND q.vec_id <> c.vec_id)
       SELECT q_id, vec_id, cos_sim,
              CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
       FROM scored QUALIFY rank <= $TopK ORDER BY q_id, rank"""

  /** Hard negatives kept per anchor. */
  private val HardNegK = 3

  /** Hard-negative mining for contrastive training — per anchor, the
    * most-similar corpus vectors with a DIFFERENT label, found inside
    * the anchor's sign-LSH bucket (the negatives that actually teach:
    * random negatives are trivially separable, and the "hard" ones
    * live exactly where an ANN index puts near neighbors — mining
    * rides the same bucket join as [[annTopkLsh]], so it scales the
    * same way: bucket fan-in, never corpus², recall traded exactly as
    * the index trades it, exact quantized cosine inside the bucket).
    * [[graft.operators.Curation.contrastivePairs]] builds the RANDOM
    * negative set; this is its curriculum-hardening sibling. Query set
    * capped like every ANN key; output ≤ |Q|·k rows. (round 7)
    */
  def hardNegativesLsh(s: SparkSession, dir: String): DataFrame = {
    val lab = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
    val c = bucketsOf(quantized(s, dir)).join(lab, Seq("vec_id"))
    val q = c.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("nn").as("q_nn"), col("label").as("q_label"),
        col("bucket").as("q_bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    broadcast(q)
      .join(c, col("q_bucket") === col("bucket") &&
        col("q_label") =!= col("label"))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        cosineQ(dotQ(col("q_qv"), col("qv")), col("q_nn"), col("nn"))
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= HardNegK)
      .orderBy("q_id", "rank")
  }

  val hardNegativesLshSql: String =
    s"""WITH $sqlQuant,
       $sqlPlanes,
       $sqlBuckets,
       corp AS (SELECT quant.vec_id, qv, nn, bucket, e.label
                FROM quant JOIN buck ON quant.vec_id = buck.vec_id
                  JOIN embeddings e ON quant.vec_id = e.vec_id),
       scored AS (SELECT q.vec_id AS q_id, q.label AS q_label,
                    c.vec_id AS vec_id, c.label,
                    ${sqlCosineQ(sqlDotQ("q.qv", "c.qv", Dim), "q.nn", "c.nn")} AS cos_sim
                  FROM corp q JOIN corp c ON ${sqlQueryPred("q")}
                   AND q.bucket = c.bucket AND q.label <> c.label)
       SELECT q_id, q_label, vec_id, label, cos_sim,
              CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
       FROM scored QUALIFY rank <= $HardNegK ORDER BY q_id, rank"""

  /** Index-quality evaluation: recall@k of the sign-LSH index against
    * the exact brute-force baseline, per query. The operator a real ANN
    * deployment runs continuously (on a sampled query set) to catch
    * index drift; composes the two registered paths, so its cost is
    * bounded by theirs.
    */
  def annRecallLsh(s: SparkSession, dir: String): DataFrame = {
    val bf = annTopkBruteforce(s, dir).select(col("q_id"), col("vec_id"))
    val ls = annTopkLsh(s, dir).select(col("q_id"), col("vec_id"))
    val inter = bf.join(ls, Seq("q_id", "vec_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    bf.select("q_id").distinct()
      .join(inter, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / TopK).as("recall"))
      .orderBy("q_id")
  }

  val annRecallLshSql: String = {
    def ranked(rel: String, extraPred: String) =
      s"""SELECT q_id, vec_id FROM (
            SELECT q.vec_id AS q_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                     ${sqlCosineQ(sqlDotQ("q.qv", "c.qv", Dim), "q.nn", "c.nn")} DESC,
                     c.vec_id) AS r
            FROM $rel q JOIN $rel c ON ${sqlQueryPred("q")}$extraPred
             AND q.vec_id <> c.vec_id) WHERE r <= $TopK"""
    s"""WITH $sqlQuant,
       $sqlPlanes,
       $sqlBuckets,
       corp AS (SELECT quant.vec_id, qv, nn, bucket
                FROM quant JOIN buck ON quant.vec_id = buck.vec_id),
       bf AS (${ranked("quant", "")}),
       lshk AS (${ranked("corp", " AND q.bucket = c.bucket")}),
       inter AS (SELECT q_id, COUNT(*) AS n_hit
                 FROM bf JOIN lshk USING (q_id, vec_id) GROUP BY q_id),
       qs AS (SELECT DISTINCT q_id FROM bf)
       SELECT qs.q_id, CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
              CAST(COALESCE(n_hit, 0) AS DOUBLE) / $TopK AS recall
       FROM qs LEFT JOIN inter USING (q_id) ORDER BY q_id"""
  }

  /** Recall gate for [[hardNegativesLsh]] against the EXACT top-k
    * different-label neighbors (the same drift-monitor discipline as
    * [[annRecallLsh]] — an approximate miner that silently loses its
    * hard negatives trains on easy ones, which is invisible without
    * this number). Exact truth is brute force over the capped query
    * set, O(|Q|·N); cost bounded by the monitored key's own baseline.
    * (round 7)
    */
  def hardNegativesRecall(s: SparkSession, dir: String): DataFrame = {
    val lab = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
    val c = quantized(s, dir).join(lab, Seq("vec_id"))
    val q = c.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("nn").as("q_nn"), col("label").as("q_label"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val exact = broadcast(q).join(c, col("q_label") =!= col("label"))
      .select(col("q_id"), col("vec_id"),
        cosineQ(dotQ(col("q_qv"), col("qv")), col("q_nn"), col("nn"))
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= HardNegK)
      .select("q_id", "vec_id")
    val mined = hardNegativesLsh(s, dir).select("q_id", "vec_id")
    val inter = exact.join(mined, Seq("q_id", "vec_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    exact.select("q_id").distinct()
      .join(inter, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / HardNegK)
          .as("recall"))
      .orderBy("q_id")
  }

  val hardNegativesRecallSql: String = {
    def ranked(rel: String, extraPred: String) =
      s"""SELECT q_id, vec_id FROM (
            SELECT q.vec_id AS q_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                     ${sqlCosineQ(sqlDotQ("q.qv", "c.qv", Dim), "q.nn", "c.nn")} DESC,
                     c.vec_id) AS r
            FROM $rel q JOIN $rel c ON ${sqlQueryPred("q")}$extraPred
             AND q.label <> c.label) WHERE r <= $HardNegK"""
    s"""WITH $sqlQuant,
       $sqlPlanes,
       $sqlBuckets,
       lq AS (SELECT quant.vec_id, qv, nn, e.label
              FROM quant JOIN embeddings e ON quant.vec_id = e.vec_id),
       corp AS (SELECT lq.vec_id, qv, nn, label, bucket
                FROM lq JOIN buck ON lq.vec_id = buck.vec_id),
       bf AS (${ranked("lq", "")}),
       mined AS (${ranked("corp", " AND q.bucket = c.bucket")}),
       inter AS (SELECT q_id, COUNT(*) AS n_hit
                 FROM bf JOIN mined USING (q_id, vec_id) GROUP BY q_id),
       qs AS (SELECT DISTINCT q_id FROM bf)
       SELECT qs.q_id, CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
              CAST(COALESCE(n_hit, 0) AS DOUBLE) / $HardNegK AS recall
       FROM qs LEFT JOIN inter USING (q_id) ORDER BY q_id"""
  }

  // IVF defaults (SimilarityConfig.Default): a corpus-INDEPENDENT
  // centroid count (the broadcast and the assignment cost stay bounded
  // no matter how large the corpus grows), refined by exact-integer
  // Lloyd iterations; nProbe=2. Oracle SQL is written against Default.
  private val D = SimilarityConfig.Default
  private def IvfK = D.ivfK
  private def IvfIters = D.ivfIters
  private def IvfProbe = D.ivfProbe

  /** Nearest-centroid argmax for each row of `df` (bounded broadcast of
    * <= IvfK centroids; one map pass over the data).
    */
  private def nearest(cent: DataFrame, df: DataFrame, idCol: String,
      n: Int): DataFrame = {
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

  /** One exact-integer Lloyd iteration: assign each vector to its
    * nearest centroid, then replace each centroid with its cluster
    * mean. Cosine is scale-invariant, so the "mean" keeps no fractional
    * part: we take the element-wise integer SUM and scale it down by
    * the cluster count with a portable floor-division
    * (`(s - ((s % cnt + cnt) % cnt)) div cnt` — the numerator is an
    * exact multiple of cnt, so Spark's `div` and DuckDB's `//` agree
    * bit-for-bit and components stay in quantized range). Everything is
    * distributed: the agg is 64 map-side-partial SUM columns, the
    * centroid frame is <= IvfK rows.
    */
  private def lloyd(c: DataFrame, cent: DataFrame): DataFrame = {
    val assign = nearest(cent, c, "vec_id", 1)
    val sums = c.join(assign, "vec_id")
      .groupBy(col("c_id"))
      .agg(count(lit(1)).as("cnt"),
        (0 until Dim).map(d =>
          sum(element_at(col("qv"), d + 1)).as(s"s$d")): _*)
    sums.select(col("c_id"),
      array((0 until Dim).map(d =>
        expr(s"(s$d - ((s$d % cnt + cnt) % cnt)) div cnt")): _*).as("c_qv"))
      .select(col("c_id"), col("c_qv"),
        dotQ(col("c_qv"), col("c_qv")).as("c_nn"))
  }

  /** IVF-bucketed ANN: corpus vectors are assigned to their nearest
    * coarse centroid (broadcast argmax — one map pass); queries probe
    * their `nProbe` nearest centroids and score only those inverted
    * lists. Unlike sign-LSH buckets, IVF adapts to the data's actual
    * geometry: seeds are the IvfK lowest-id vectors, refined by
    * exact-integer k-means (deterministic in both engines). Total cost
    * is O(IvfIters * K * N) assignment passes — linear in the corpus,
    * with a bounded centroid broadcast.
    */
  def annTopkIvf(s: SparkSession, dir: String): DataFrame =
    annTopkIvf(s, dir, D)

  def annTopkIvf(s: SparkSession, dir: String,
      cfg: SimilarityConfig): DataFrame = {
    val c = quantized(s, dir)
    val seed = c.filter(col("vec_id") < cfg.ivfK)
      .select(col("vec_id").cast("int").as("c_id"), col("qv").as("c_qv"),
        col("nn").as("c_nn"))
    val cent = (1 to cfg.ivfIters).foldLeft(seed)((ct, _) => lloyd(c, ct))
    val assign = nearest(cent, c, "vec_id", 1)
    val probes = nearest(cent, c.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("qv"), col("nn")), "q_id",
      cfg.ivfProbe)
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

  /** Nearest-centroid argmax over quant rows, DuckDB twin. */
  private def sqlNearest(centCte: String, pred: String, n: Int): String =
    s"""SELECT vec_id, c_id FROM (
          SELECT q.vec_id, c.c_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                   ${sqlCosineQ(sqlDotQ("q.qv", "c.c_qv", Dim), "q.nn", "c.c_nn")} DESC,
                   c.c_id) AS r
          FROM quant q CROSS JOIN $centCte c$pred) WHERE r <= $n"""

  /** One unrolled exact-integer Lloyd iteration, DuckDB twin of
    * [[lloyd]]: SUM per component, portable floor-division scale-down.
    */
  private def sqlLloydIter(i: Int): String = {
    val sumCols =
      (0 until Dim).map(d => s"SUM(qv[${d + 1}]) AS s$d").mkString(", ")
    val meanList = (0 until Dim)
      .map(d => s"((s$d - ((s$d % cnt + cnt) % cnt)) // cnt)")
      .mkString("[", ", ", "]")
    s"""asg$i AS (${sqlNearest(s"cent$i", "", 1)}),
       sum$i AS (SELECT c_id, COUNT(*) AS cnt, $sumCols
                 FROM quant JOIN asg$i USING (vec_id) GROUP BY c_id),
       cent${i + 1} AS (SELECT c_id, c_qv, ${sqlDotQ("c_qv", "c_qv", Dim)} AS c_nn
                 FROM (SELECT c_id, $meanList AS c_qv FROM sum$i))"""
  }

  val annTopkIvfSql: String =
    s"""WITH $sqlQuant,
       cent0 AS (SELECT CAST(vec_id AS INT) AS c_id, qv AS c_qv, nn AS c_nn
                 FROM quant WHERE vec_id < $IvfK),
       ${(0 until IvfIters).map(sqlLloydIter).mkString(",\n")},
       assign AS (${sqlNearest(s"cent$IvfIters", "", 1)}),
       probes AS (
         SELECT vec_id AS q_id, c_id FROM
           (${sqlNearest(s"cent$IvfIters", s" WHERE ${sqlQueryPred("q")}", IvfProbe)})),
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

  // Product quantization geometry: 8 subspaces x 8 dims, 16-entry
  // codebook per subspace (seeds = the 16 lowest-id vectors' subvectors,
  // one exact-integer Lloyd refinement), squared-L2 distance.
  private val PqSub = 8
  private val PqSubDim = 8
  private val PqK = 16

  /** PQ-encoded ANN — the smallest-memory ANN tier: each corpus vector
    * compresses to 8 code bytes (one nearest-codebook-entry id per
    * subspace; 8 B vs 256 B for the raw quantized vector), and query
    * scoring is Asymmetric Distance Computation: the query precomputes
    * its distance to every codebook entry (|Q| x 8 x 16 lookup rows,
    * broadcast), and a corpus vector's approximate distance is the sum
    * of 8 table lookups — no per-pair vector arithmetic at all. Like
    * IVF, codebooks are corpus-independent (fixed K seeds + one
    * exact-integer Lloyd step, floor-division means), so training cost
    * and broadcast size do not grow with the corpus; encoding is
    * O(K * N) map work. All distances are exact BIGINTs (quantized
    * subvector squared-L2 < 2^53), so ranking is bit-portable.
    */
  /** PQ building blocks shared by [[annTopkPq]] and [[annTopkIvfPq]]:
    * trained codebooks `cb` (s, c_id, cv), per-vector `codes`
    * (vec_id, s, code), and the query ADC lookup table `qdt`
    * (q_id, s, code, d).
    */
  private final case class PqParts(cb: DataFrame, codes: DataFrame,
      qdt: DataFrame)

  // exact integer squared-L2 via three LongDot products
  private def pqL2(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    dotQ(a, a) - lit(2L) * dotQ(a, b) + dotQ(b, b)

  private def pqParts(s: SparkSession, dir: String): PqParts = {
    val c = quantized(s, dir)
    // (vec_id, s, sv): the 8-dim subvector of each subspace
    val sv = c.select(col("vec_id"), posexplode(array((0 until PqSub).map(
        ss => slice(col("qv"), ss * PqSubDim + 1, PqSubDim)): _*))
        .as(Seq("s", "sv")))
    val seed = sv.filter(col("vec_id") < PqK)
      .select(col("vec_id").cast("int").as("c_id"), col("s"),
        col("sv").as("cv"))

    // nearest codebook entry per (vector, subspace)
    def assign(rows: DataFrame, idCol: String, cb: DataFrame): DataFrame = {
      val w = Window.partitionBy(col(idCol), col("s"))
        .orderBy(col("d"), col("c_id"))
      rows.join(broadcast(cb), "s")
        .select(col(idCol), col("s"), col("c_id"),
          pqL2(col("sv"), col("cv")).as("d"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col(idCol), col("s"), col("c_id"))
    }

    // one Lloyd step: floor-division integer means per (s, c_id)
    val asg0 = assign(sv, "vec_id", seed)
    val sums = sv.join(asg0, Seq("vec_id", "s"))
      .groupBy(col("s"), col("c_id"))
      .agg(count(lit(1)).as("cnt"),
        (0 until PqSubDim).map(d =>
          sum(element_at(col("sv"), d + 1)).as(s"m$d")): _*)
    val cb = sums.select(col("s"), col("c_id"),
      array((0 until PqSubDim).map(d =>
        expr(s"(m$d - ((m$d % cnt + cnt) % cnt)) div cnt")): _*).as("cv"))

    val codes = assign(sv, "vec_id", cb)
      .withColumnRenamed("c_id", "code")
    // ADC lookup table: query x subspace x codebook entry
    val qdt = sv.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("s"), col("sv"))
      .join(broadcast(cb), "s")
      .select(col("q_id"), col("s"), col("c_id").as("code"),
        pqL2(col("sv"), col("cv")).as("d"))
    PqParts(cb, codes, qdt)
  }

  def annTopkPq(s: SparkSession, dir: String): DataFrame = {
    val p = pqParts(s, dir)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("approx_l2"), col("vec_id"))
    p.codes.join(broadcast(p.qdt), Seq("s", "code"))
      .filter(col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d")).as("approx_l2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .orderBy("q_id", "rank")
  }

  /** IVF-PQ — the full-scale ANN composition: IVF's coarse centroids
    * prune the corpus to nProbe inverted lists per query, and PQ codes
    * score ONLY those candidates by ADC table lookup. Per-query cost is
    * O(list length) lookups instead of O(N), and per-vector index state
    * is one coarse list id + 8 code bytes — the memory/throughput shape
    * real billion-vector indexes (FAISS IVF-PQ) run. Training of both
    * quantizers is corpus-independent and exact-integer, so the whole
    * index build AND search replay bit-identically in the oracle.
    */
  def annTopkIvfPq(s: SparkSession, dir: String): DataFrame = {
    val cfg = D
    val c = quantized(s, dir)
    val seed = c.filter(col("vec_id") < cfg.ivfK)
      .select(col("vec_id").cast("int").as("c_id"), col("qv").as("c_qv"),
        col("nn").as("c_nn"))
    val cent = (1 to cfg.ivfIters).foldLeft(seed)((ct, _) => lloyd(c, ct))
    val assign = nearest(cent, c, "vec_id", 1)
    val probes = nearest(cent, c.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("qv"), col("nn")), "q_id",
      cfg.ivfProbe)
    val cand = probes.join(assign, "c_id")
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id")).distinct()
    val p = pqParts(s, dir)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("approx_l2"), col("vec_id"))
    cand
      .join(p.codes, "vec_id")
      .join(broadcast(p.qdt), Seq("q_id", "s", "code"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d")).as("approx_l2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .orderBy("q_id", "rank")
  }

  /** Shared DuckDB CTE block for the PQ quantizer: `sv` (subvectors),
    * `pqseed`/`pqasg0`/`pqsums` (training), `cb` (codebooks), `codes`
    * (per-vector code bytes), `qdt` (query ADC tables). Expects `quant`
    * in scope; splice into a WITH clause.
    */
  private val sqlPqCtes: String = {
    def sqlL2(a: String, b: String) =
      s"(${sqlDotQ(a, a, PqSubDim)} - 2 * ${sqlDotQ(a, b, PqSubDim)}" +
        s" + ${sqlDotQ(b, b, PqSubDim)})"
    def sqlAssign(rowsRel: String, idCol: String, cbRel: String) =
      s"""SELECT $idCol, s, c_id FROM (
            SELECT r.$idCol, r.s, c.c_id,
                   ROW_NUMBER() OVER (PARTITION BY r.$idCol, r.s
                     ORDER BY ${sqlL2("r.sv", "c.cv")}, c.c_id) AS rk
            FROM $rowsRel r JOIN $cbRel c ON r.s = c.s) WHERE rk = 1"""
    val sumCols = (0 until PqSubDim)
      .map(d => s"SUM(sv[${d + 1}]) AS m$d").mkString(", ")
    val meanList = (0 until PqSubDim)
      .map(d => s"((m$d - ((m$d % cnt + cnt) % cnt)) // cnt)")
      .mkString("[", ", ", "]")
    s"""sv AS (SELECT vec_id, s, qv[s * $PqSubDim + 1 : s * $PqSubDim + $PqSubDim] AS sv
              FROM quant, (SELECT unnest(generate_series(0, ${PqSub - 1})) AS s) AS ss),
       pqseed AS (SELECT CAST(vec_id AS INT) AS c_id, s, sv AS cv
                FROM sv WHERE vec_id < $PqK),
       pqasg0 AS (${sqlAssign("sv", "vec_id", "pqseed")}),
       pqsums AS (SELECT sv.s, c_id, COUNT(*) AS cnt, $sumCols
                FROM sv JOIN pqasg0 ON sv.vec_id = pqasg0.vec_id AND sv.s = pqasg0.s
                GROUP BY sv.s, c_id),
       cb AS (SELECT s, c_id, $meanList AS cv FROM pqsums),
       codes AS (SELECT vec_id, s, c_id AS code
                 FROM (${sqlAssign("sv", "vec_id", "cb")})),
       qsv AS (SELECT vec_id AS q_id, s, sv FROM sv
               WHERE ${sqlQueryPred("sv")}),
       qdt AS (SELECT q.q_id, q.s, c.c_id AS code,
                      ${sqlL2("q.sv", "c.cv")} AS d
               FROM qsv q JOIN cb c ON q.s = c.s)"""
  }

  val annTopkPqSql: String =
    s"""WITH $sqlQuant,
       $sqlPqCtes,
       scored AS (SELECT qdt.q_id, codes.vec_id,
                         CAST(SUM(qdt.d) AS BIGINT) AS approx_l2
                  FROM codes JOIN qdt
                    ON codes.s = qdt.s AND codes.code = qdt.code
                  WHERE qdt.q_id <> codes.vec_id
                  GROUP BY qdt.q_id, codes.vec_id)
       SELECT q_id, vec_id, approx_l2,
              CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY approx_l2, vec_id) AS INT) AS rank
       FROM scored QUALIFY rank <= $TopK ORDER BY q_id, rank"""

  val annTopkIvfPqSql: String =
    s"""WITH $sqlQuant,
       cent0 AS (SELECT CAST(vec_id AS INT) AS c_id, qv AS c_qv, nn AS c_nn
                 FROM quant WHERE vec_id < $IvfK),
       ${(0 until IvfIters).map(sqlLloydIter).mkString(",\n")},
       assign AS (${sqlNearest(s"cent$IvfIters", "", 1)}),
       probes AS (
         SELECT vec_id AS q_id, c_id FROM
           (${sqlNearest(s"cent$IvfIters", s" WHERE ${sqlQueryPred("q")}", IvfProbe)})),
       cand AS (SELECT DISTINCT q_id, vec_id
                FROM probes JOIN assign USING (c_id)
                WHERE q_id <> vec_id),
       $sqlPqCtes,
       scored AS (SELECT cand.q_id, cand.vec_id,
                         CAST(SUM(qdt.d) AS BIGINT) AS approx_l2
                  FROM cand JOIN codes ON cand.vec_id = codes.vec_id
                            JOIN qdt ON qdt.q_id = cand.q_id
                                    AND qdt.s = codes.s
                                    AND qdt.code = codes.code
                  GROUP BY cand.q_id, cand.vec_id)
       SELECT q_id, vec_id, approx_l2,
              CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY approx_l2, vec_id) AS INT) AS rank
       FROM scored QUALIFY rank <= $TopK ORDER BY q_id, rank"""

  /** Per-label embedding centroid (class prototype / cluster summary):
    * exact fixed-point component sums, one IEEE division per component
    * at the end. Output is FLAT (label, pos, csum, n, mean) rows, not
    * an array column — array cells break downstream row-level
    * consumers and hash gates. Shape at scale: posexplode is dim-wide
    * but the shuffle carries only (label, pos) -> (sum, count)
    * partials thanks to map-side combine; result is |labels| * dim
    * rows regardless of corpus size.
    */
  def embeddingCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(quantize(col("embedding"))))
      .select(col("label"), (col("pos") + 1).as("pos"), col("col").as("q"))
      .groupBy("label", "pos")
      .agg(sum(col("q")).as("csum"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"), col("csum"), col("n"),
        (col("csum").cast("double") / col("n").cast("double")).as("mean"))
      .orderBy("label", "pos")

  val embeddingCentroidsSql: String =
    s"""WITH q AS (SELECT label,
               unnest(${sqlQuantize("embedding")}) AS qx,
               CAST(generate_subscripts(embedding, 1) AS INT) AS pos
             FROM embeddings),
       g AS (SELECT label, pos, CAST(SUM(qx) AS BIGINT) AS csum,
               CAST(COUNT(*) AS BIGINT) AS n
             FROM q GROUP BY 1, 2)
       SELECT label, pos, csum, n,
              CAST(csum AS DOUBLE) / CAST(n AS DOUBLE) AS mean
       FROM g ORDER BY label, pos"""

  /** kNN label vote — the classifier-evaluation surface over the exact
    * ANN tier: each query vector takes the majority label of its
    * [[TopK]] nearest neighbors (exact quantized cosine, deterministic
    * tie-breaks: neighbor rank by (cos desc, vec_id), vote by (count
    * desc, label)). `correct` makes the frame aggregate directly into
    * label-quality / embedding-drift dashboards. Same O(|Q|*N) shape
    * as the brute-force baseline (query set hard-capped); the vote
    * itself touches only |Q|*k rows.
    */
  def knnLabelVote(s: SparkSession, dir: String): DataFrame = {
    val q = queriesDf(s, dir)
    val c = quantized(s, dir)
    val wNn = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val nn = broadcast(q).join(c, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        cosineQ(dotQ(col("q_qv"), col("qv")), col("q_nn"), col("nn"))
          .as("cos_sim"))
      .withColumn("rank", row_number().over(wNn))
      .filter(col("rank") <= TopK)
    val lab = Tables.embeddings(s, dir)
      .select(col("vec_id").as("c_id"), col("label").as("c_label"))
    val votes = nn.join(lab, nn("vec_id") === lab("c_id"))
      .groupBy(col("q_id"), col("c_label"))
      .agg(count(lit(1)).as("votes"))
    val wV = Window.partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("c_label"))
    val truth = Tables.embeddings(s, dir).filter(queryPred)
      .select(col("vec_id").as("q_id"), col("label").as("true_label"))
    votes.withColumn("rk", row_number().over(wV))
      .filter(col("rk") === 1)
      .join(truth, "q_id")
      .select(col("q_id"), col("true_label"),
        col("c_label").as("pred_label"), col("votes"),
        when(col("c_label") === col("true_label"), 1).otherwise(0)
          .cast("int").as("correct"))
      .orderBy("q_id")
  }

  /** Confusion matrix over the kNN evaluation — the (true, predicted)
    * cell counts behind [[knnLabelVote]]'s per-query verdicts, plus
    * each cell's share of its true-label row (recall decomposition).
    * One label²-bounded aggregation on top of the existing vote
    * pipeline. (round 4)
    */
  def knnConfusionMatrix(s: SparkSession, dir: String): DataFrame = {
    val votes = knnLabelVote(s, dir)
    val rowTotals = votes.groupBy(col("true_label").as("tl"))
      .agg(count(lit(1)).as("row_n"))
    votes.groupBy("true_label", "pred_label")
      .agg(count(lit(1)).as("n"))
      .join(broadcast(rowTotals), col("true_label") === col("tl"))
      .select(col("true_label"), col("pred_label"), col("n"),
        (col("n").cast("double") / col("row_n").cast("double"))
          .as("row_frac"))
      .orderBy("true_label", "pred_label")
  }

  // lazy: interpolates knnLabelVoteSql, which initializes later in
  // this object (a plain val here would capture null)
  lazy val knnConfusionMatrixSql: String =
    s"""WITH votes AS (SELECT * FROM ($knnLabelVoteSql)),
       cells AS (SELECT true_label, pred_label, COUNT(*) AS n
                 FROM votes GROUP BY 1, 2),
       rt AS (SELECT true_label AS tl, COUNT(*) AS row_n
              FROM votes GROUP BY 1)
       SELECT c.true_label, c.pred_label, c.n,
              CAST(c.n AS DOUBLE) / CAST(rt.row_n AS DOUBLE) AS row_frac
       FROM cells c JOIN rt ON c.true_label = rt.tl
       ORDER BY c.true_label, c.pred_label"""

  val knnLabelVoteSql: String =
    s"""WITH $sqlQuant,
       scored AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                    ${sqlCosineQ(sqlDotQ("q.qv", "c.qv", Dim), "q.nn", "c.nn")} AS cos_sim
                  FROM quant q JOIN quant c ON ${sqlQueryPred("q")}
                   AND q.vec_id <> c.vec_id),
       nn AS (SELECT q_id, vec_id FROM (
                SELECT q_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY q_id
                         ORDER BY cos_sim DESC, vec_id) AS rank
                FROM scored) WHERE rank <= $TopK),
       v AS (SELECT nn.q_id, e.label AS c_label,
               CAST(COUNT(*) AS BIGINT) AS votes
             FROM nn JOIN embeddings e ON nn.vec_id = e.vec_id
             GROUP BY 1, 2),
       top AS (SELECT q_id, c_label, votes,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY votes DESC, c_label) AS rk
               FROM v)
       SELECT t.q_id, e.label AS true_label, t.c_label AS pred_label,
              t.votes,
              CAST(CASE WHEN t.c_label = e.label THEN 1 ELSE 0 END AS INT)
                AS correct
       FROM top t JOIN embeddings e ON t.q_id = e.vec_id
       WHERE t.rk = 1 ORDER BY t.q_id"""

  /** Semantic dedup — the SemDeDup curation step (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus embeddings, then inside
    * each cluster drop all but one of every near-duplicate group,
    * keeping the member CLOSEST to its centroid (the most
    * prototypical). Two-level blocking makes the pair search
    * corpus-scale: the IVF k-means cluster (semantic blocking, the
    * paper's move — reuses [[annTopkIvf]]'s exact-integer centroids)
    * AND the 8-bit sign-LSH bucket (fine blocking), so candidate
    * pairs ride an equi-join on (cluster, bucket) — never an
    * in-cluster all-pairs product, which at 100 TB would be N²/K.
    * Survivor policy is per verified pair: the lower-centroid-sim
    * member drops (tie: higher vec_id) — deterministic, so a re-run
    * or a retried partition makes identical keep decisions.
    *
    * Output is a per-vector verdict frame (vec_id, cluster, cent_sim,
    * kept) — the join-ready shape a curation pipeline filters the
    * corpus with. All similarity arithmetic is the exact quantized
    * integer dot/cosine used by the ANN tier, so verdicts are
    * bit-identical across engines and partitionings. (round 5)
    */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame =
    dedupSemantic(s, dir, D)

  def dedupSemantic(s: SparkSession, dir: String,
      cfg: SimilarityConfig): DataFrame =
    dedupSemanticOn(Tables.embeddings(s, dir), cfg)

  /** [[dedupSemantic]] over an arbitrary (vec_id, embedding) frame —
    * the library entry point, and the hook constructed-corpus specs
    * verify the keep policy through.
    */
  def dedupSemanticOn(emb: DataFrame,
      cfg: SimilarityConfig): DataFrame = {
    val c = emb
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .select(col("vec_id"), col("qv"), dotQ(col("qv"), col("qv")).as("nn"))
    val seed = c.filter(col("vec_id") < cfg.ivfK)
      .select(col("vec_id").cast("int").as("c_id"), col("qv").as("c_qv"),
        col("nn").as("c_nn"))
    val cent = (1 to cfg.ivfIters).foldLeft(seed)((ct, _) => lloyd(c, ct))
    // assignment WITH the centroid similarity (the keep-policy score)
    val wA = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("c_id"))
    val asg = c.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("c_id"),
        cosineQ(dotQ(col("qv"), col("c_qv")), col("nn"), col("c_nn"))
          .as("c_cos"))
      .withColumn("c_rank", row_number().over(wA))
      .filter(col("c_rank") === 1)
      .select(col("vec_id"), col("c_id"), col("c_cos"))
    val m = asg.join(bucketsOf(c).select(col("vec_id"), col("bucket")),
      "vec_id")
    val cand = m.as("a").join(m.as("b"),
        col("a.c_id") === col("b.c_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.c_cos").as("cos_a"), col("b.c_cos").as("cos_b"))
    val pairs = cand
      .join(c.select(col("vec_id").as("vec_a"), col("qv").as("qa"),
        col("nn").as("na")), "vec_a")
      .join(c.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
        col("nn").as("nb")), "vec_b")
      .filter(cosineQ(dotQ(col("qa"), col("qb")), col("na"), col("nb"))
        >= cfg.embeddingTau)
    // per verified pair the less-prototypical member drops; vec_a <
    // vec_b, so an exact tie drops the higher id (vec_b)
    val drops = pairs
      .select(when(col("cos_a") < col("cos_b"), col("vec_a"))
        .otherwise(col("vec_b")).as("vec_id"))
      .distinct()
    m.join(drops.withColumn("dropped", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("c_id"), col("c_cos").as("cent_sim"),
        col("dropped").isNull.as("kept"))
      .orderBy("vec_id")
  }

  val dedupSemanticSql: String =
    s"""WITH $sqlQuant,
       cent0 AS (SELECT CAST(vec_id AS INT) AS c_id, qv AS c_qv, nn AS c_nn
                 FROM quant WHERE vec_id < $IvfK),
       ${(0 until IvfIters).map(sqlLloydIter).mkString(",\n")},
       $sqlPlanes,
       $sqlBuckets,
       asgc AS (SELECT vec_id, c_id, c_cos FROM (
                  SELECT q.vec_id, c.c_id,
                         ${sqlCosineQ(sqlDotQ("q.qv", "c.c_qv", Dim), "q.nn", "c.c_nn")} AS c_cos,
                         ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                           ${sqlCosineQ(sqlDotQ("q.qv", "c.c_qv", Dim), "q.nn", "c.c_nn")} DESC,
                           c.c_id) AS r
                  FROM quant q CROSS JOIN cent$IvfIters c) WHERE r = 1),
       m AS (SELECT a.vec_id, a.c_id, a.c_cos, buck.bucket
             FROM asgc a JOIN buck ON a.vec_id = buck.vec_id),
       cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                       a.c_cos AS cos_a, b.c_cos AS cos_b
                FROM m a JOIN m b ON a.c_id = b.c_id
                 AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       pairs AS (SELECT vec_a, vec_b, cos_a, cos_b
                 FROM cand JOIN quant qa ON vec_a = qa.vec_id
                           JOIN quant qb ON vec_b = qb.vec_id
                 WHERE ${sqlCosineQ(sqlDotQ("qa.qv", "qb.qv", Dim), "qa.nn", "qb.nn")}
                       >= ${D.embeddingTau}),
       drops AS (SELECT DISTINCT CASE WHEN cos_a < cos_b THEN vec_a
                                      ELSE vec_b END AS vec_id
                 FROM pairs)
       SELECT m.vec_id, m.c_id, m.c_cos AS cent_sim,
              d.vec_id IS NULL AS kept
       FROM m LEFT JOIN drops d ON m.vec_id = d.vec_id
       ORDER BY m.vec_id"""

  /** Cluster-balance sampling weights over the IVF partition of the
    * embedding space — the concept-rebalancing step of a pretraining
    * mix (over-represented regions of embedding space get downweighted,
    * rare regions upweighted; the cluster-level analogue of
    * [[graft.operators.Curation.sourceMixTemperature]]'s source-level
    * reweighting). weight = N / (K_nonempty * n_c), so cluster-uniform
    * resampling preserves total corpus mass: sum_c n_c * w_c = N.
    *
    * Reuses the exact-integer IVF construction (corpus-independent
    * K = `cfg.ivfK` centroid broadcast — Default 16 — with Lloyd
    * refinement, one assignment map pass), so the weight table costs
    * one extra K-row aggregate over the assignment — and both engines
    * derive identical clusters, which keeps the key SQL-oracled where
    * a float k-means could never be.
    */
  def clusterBalanceWeights(s: SparkSession, dir: String): DataFrame =
    clusterBalanceWeights(s, dir, D)

  /** Library entry with the IVF geometry (K, Lloyd iterations) taken
    * from [[SimilarityConfig]] — the registered query stays on
    * `Default` (its oracle is written against it), deployments size K
    * to their corpus and keep the exact-integer Lloyd discipline. */
  def clusterBalanceWeights(s: SparkSession, dir: String,
      cfg: SimilarityConfig): DataFrame = {
    val c = quantized(s, dir)
    val seed = c.filter(col("vec_id") < cfg.ivfK)
      .select(col("vec_id").cast("int").as("c_id"), col("qv").as("c_qv"),
        col("nn").as("c_nn"))
    val cent = (1 to cfg.ivfIters).foldLeft(seed)((ct, _) => lloyd(c, ct))
    val counts = nearest(cent, c, "vec_id", 1)
      .groupBy("c_id").agg(count(lit(1)).as("n_vecs"))
    val tot = counts.agg(sum(col("n_vecs")).as("nt"),
      count(lit(1)).as("kk"))
    counts.crossJoin(broadcast(tot))
      .select(col("c_id").as("cluster_id"), col("n_vecs"),
        (col("nt").cast("double")
          / (col("kk") * col("n_vecs")).cast("double")).as("weight"))
      .orderBy("cluster_id")
  }

  val clusterBalanceWeightsSql: String =
    s"""WITH $sqlQuant,
       cent0 AS (SELECT CAST(vec_id AS INT) AS c_id, qv AS c_qv, nn AS c_nn
                 FROM quant WHERE vec_id < $IvfK),
       ${(0 until IvfIters).map(sqlLloydIter).mkString(",\n")},
       counts AS (SELECT c_id, CAST(COUNT(*) AS BIGINT) AS n_vecs
                  FROM (${sqlNearest(s"cent$IvfIters", "", 1)})
                  GROUP BY c_id),
       tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS nt,
                      CAST(COUNT(*) AS BIGINT) AS kk FROM counts)
       SELECT c.c_id AS cluster_id, c.n_vecs,
              CAST(t.nt AS DOUBLE) / CAST(t.kk * c.n_vecs AS DOUBLE) AS weight
       FROM counts c CROSS JOIN tot t ORDER BY cluster_id"""

  /** Embedding norm health per label — the data-quality gate every
    * vector store needs before similarity math means anything
    * ("are there zero vectors, are norms collapsing or exploding per
    * class"): squared norms as EXACT quantized-integer self-dots
    * (the codegen'd LongDot — one map pass), min/max/zero-count over
    * BIGINTs (order-free), mean squared norm as one division of an
    * exact DECIMAL sum. Norms surface through sqrt of exact casts,
    * de-quantized by the 2^20 scale. Scale: one scan, one
    * label-cardinality aggregate — nothing else. (round 6)
    */
  def embeddingNormStats(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vectors._
    val sq = Tables.embeddings(s, dir)
      .select(col("label"), quantize(col("embedding")).as("q"))
      .select(col("label"), dotQ(col("q"), col("q")).as("sq"))
    sq.groupBy("label")
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("sq") === 0L, 1L).otherwise(0L)).as("n_zero"),
        min(col("sq")).as("mn"), max(col("sq")).as("mx"),
        sum(col("sq")).cast("decimal(38,0)").as("ssum"))
      .select(col("label").cast("long").as("label"), col("n_vectors"),
        col("n_zero"),
        (sqrt(col("mn").cast("double")) / lit(Scale.toDouble)).as("min_norm"),
        (sqrt(col("mx").cast("double")) / lit(Scale.toDouble)).as("max_norm"),
        ((col("ssum").cast("double") / col("n_vectors").cast("double"))
          / (lit(Scale.toDouble) * lit(Scale.toDouble))).as("mean_sq_norm"))
      .orderBy("label")
  }

  val embeddingNormStatsSql: String = {
    import graft.functions.Vectors._
    s"""WITH sq AS (
         SELECT label, ${sqlDotQ("qv", "qv", Dim)} AS sq
         FROM (SELECT label, ${sqlQuantize("embedding")} AS qv
               FROM embeddings)),
       g AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
                    CAST(SUM(CASE WHEN sq = 0 THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_zero,
                    CAST(MIN(sq) AS BIGINT) AS mn,
                    CAST(MAX(sq) AS BIGINT) AS mx,
                    SUM(CAST(sq AS HUGEINT)) AS ssum
             FROM sq GROUP BY 1)
       SELECT CAST(label AS BIGINT) AS label, n_vectors, n_zero,
              sqrt(CAST(mn AS DOUBLE)) / ${Scale}.0 AS min_norm,
              sqrt(CAST(mx AS DOUBLE)) / ${Scale}.0 AS max_norm,
              (CAST(CAST(ssum AS VARCHAR) AS DOUBLE)
                 / CAST(n_vectors AS DOUBLE))
                / (${Scale}.0 * ${Scale}.0) AS mean_sq_norm
       FROM g ORDER BY label"""
  }

  /** Simplified silhouette per vector — the clustering-quality read
    * over the labeled embedding space ([[knnLabelVote]] audits labels
    * by neighborhood vote; this audits them by GEOMETRY: a vector
    * closer to another label's centroid than its own is a mislabel or
    * a boundary case, and the per-label mean of s is the standard
    * cluster-cohesion dashboard number): s = (b − a) / max(a, b) with
    * a = distance to the own-label centroid, b = the nearest OTHER
    * centroid (the centroid form is the classic "simplified
    * silhouette" — O(N·L), never the O(N²) pairwise original). All
    * distance mass is exact: per-dimension deviations scale by the
    * label count (n·q − Σq — integers; squares in DECIMAL(38,0), 64-dim
    * sums exact), one double division + sqrt per (vector, label) at
    * the very end. Emitted PER VECTOR (no mean-of-doubles aggregation
    * — the order-dependence rule; callers that want the per-label mean
    * aggregate the exact D mass themselves). Scale: explode ×
    * broadcast(labels × dims) join → two vec-keyed aggregates; output
    * is vector-cardinality. (round 9)
    */
  def silhouetteSimplified(s: SparkSession, dir: String): DataFrame =
    silhouetteFrom(Tables.embeddings(s, dir))

  /** Core over any (vec_id, label, embedding array<float>) frame
    * (spec plants separated clusters and a mislabel). */
  private[operators] def silhouetteFrom(e: DataFrame): DataFrame = {
    val cent = e
      .select(col("label").as("cl"), posexplode(quantize(col("embedding"))))
      .select(col("cl"), col("pos"), col("col").as("q"))
      .groupBy("cl", "pos")
      .agg(sum(col("q")).as("csum"), count(lit(1)).as("cn"))
    val dmass = e
      .select(col("vec_id"), col("label"),
        posexplode(quantize(col("embedding"))))
      .select(col("vec_id"), col("label"), col("pos"), col("col").as("q"))
      .join(broadcast(cent), Seq("pos"))
      .groupBy(col("vec_id"), col("label"), col("cl"), col("cn"))
      .agg(sum((col("cn") * col("q") - col("csum")).cast("decimal(38,0)")
        * (col("cn") * col("q") - col("csum"))).as("dd"))
      .select(col("vec_id"), col("label"), col("cl"),
        sqrt(col("dd").cast("double")
          / (col("cn") * col("cn")).cast("double")).as("d"))
    dmass.groupBy("vec_id", "label")
      .agg(max(when(col("cl") === col("label"), col("d"))).as("a_dist"),
        min(when(col("cl") =!= col("label"), col("d"))).as("b_dist"))
      .select(col("vec_id"), col("label"), col("a_dist"), col("b_dist"),
        when(greatest(col("a_dist"), col("b_dist")) > 0,
          (col("b_dist") - col("a_dist"))
            / greatest(col("a_dist"), col("b_dist"))).as("sil"))
      .orderBy("vec_id")
  }

  val silhouetteSimplifiedSql: String =
    s"""WITH qv AS (SELECT vec_id, label,
                      unnest(${sqlQuantize("embedding")}) AS q,
                      CAST(generate_subscripts(embedding, 1) AS INT) AS pos
                    FROM embeddings),
       cent AS (SELECT label AS cl, pos,
                       CAST(SUM(q) AS HUGEINT) AS csum,
                       CAST(COUNT(*) AS HUGEINT) AS cn
                FROM qv GROUP BY 1, 2),
       dm AS (SELECT v.vec_id, v.label, c.cl,
                     sqrt(CAST(CAST(SUM((c.cn * v.q - c.csum)
                              * (c.cn * v.q - c.csum)) AS VARCHAR)
                         AS DOUBLE)
                       / CAST(CAST(c.cn * c.cn AS BIGINT) AS DOUBLE)) AS d
              FROM qv v JOIN cent c ON c.pos = v.pos
              GROUP BY 1, 2, 3, c.cn),
       ab AS (SELECT vec_id, label,
                     MAX(CASE WHEN cl = label THEN d END) AS a_dist,
                     MIN(CASE WHEN cl <> label THEN d END) AS b_dist
              FROM dm GROUP BY 1, 2)
       SELECT vec_id, label, a_dist, b_dist,
              CASE WHEN greatest(a_dist, b_dist) > 0 THEN
                (b_dist - a_dist) / greatest(a_dist, b_dist)
              END AS sil
       FROM ab ORDER BY vec_id"""

  def queries: Seq[Q] = Seq(
    Q("embedding_norm_stats",
      Some(embeddingNormStatsSql))(embeddingNormStats),
    Q("silhouette_simplified",
      Some(silhouetteSimplifiedSql))(silhouetteSimplified),
    Q("cluster_balance_weights",
      Some(clusterBalanceWeightsSql))(clusterBalanceWeights),
    Q("embedding_centroids", Some(embeddingCentroidsSql))(embeddingCentroids),
    Q("dedup_semantic", Some(dedupSemanticSql))(dedupSemantic),
    Q("knn_label_vote", Some(knnLabelVoteSql))(knnLabelVote),
    Q("knn_confusion_matrix", Some(knnConfusionMatrixSql))(knnConfusionMatrix),
    Q("ann_topk_bruteforce", Some(annTopkBruteforceSql), bench = true)(annTopkBruteforce),
    Q("ann_topk_lsh", Some(annTopkLshSql))(annTopkLsh),
    Q("hard_negatives_lsh", Some(hardNegativesLshSql))(hardNegativesLsh),
    Q("hard_negatives_recall", Some(hardNegativesRecallSql))(
      hardNegativesRecall),
    Q("ann_topk_ivf", Some(annTopkIvfSql))(annTopkIvf),
    Q("ann_topk_pq", Some(annTopkPqSql))(annTopkPq),
    Q("ann_topk_ivfpq", Some(annTopkIvfPqSql))(annTopkIvfPq),
    Q("ann_recall_lsh", Some(annRecallLshSql))(annRecallLsh),
    Q("ann_recall_ivf", Some(annRecallIvfSql))(annRecallIvf),
    Q("ann_recall_pq", Some(annRecallPqSql))(annRecallPq))

  /** Recall@k for the PQ tier — with [[annRecallLsh]] and
    * [[annRecallIvf]] every approximate index ships with its drift
    * monitor. PQ's recall losses come from quantization error in the
    * 8-byte codes (not candidate pruning), so this is the metric that
    * sizes the codebook geometry. (round 4)
    */
  def annRecallPq(s: SparkSession, dir: String): DataFrame = {
    val bf = annTopkBruteforce(s, dir).select(col("q_id"), col("vec_id"))
    val pq = annTopkPq(s, dir).select(col("q_id"), col("vec_id"))
    val inter = bf.join(pq, Seq("q_id", "vec_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    bf.select("q_id").distinct()
      .join(inter, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / TopK).as("recall"))
      .orderBy("q_id")
  }

  lazy val annRecallPqSql: String =
    s"""WITH bf AS (SELECT q_id, vec_id FROM ($annTopkBruteforceSql)),
       pqk AS (SELECT q_id, vec_id FROM ($annTopkPqSql)),
       inter AS (SELECT q_id, COUNT(*) AS n_hit
                 FROM bf JOIN pqk USING (q_id, vec_id) GROUP BY q_id),
       qs AS (SELECT DISTINCT q_id FROM bf)
       SELECT qs.q_id, CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
              CAST(COALESCE(n_hit, 0) AS DOUBLE) / $TopK AS recall
       FROM qs LEFT JOIN inter USING (q_id) ORDER BY q_id"""

  /** Recall@k monitor for the IVF tier — completes the eval story
    * ([[annRecallLsh]] covers the LSH tier): per query, how many of the
    * exact brute-force top-k the probed-IVF candidate route recovers.
    * Recall lost here is exactly the mass assigned to unprobed cells,
    * so this is THE metric that tunes ivfProbe per deployment. Same
    * composition shape as the LSH monitor: both rankings are
    * pair-selective frames; the semi-join and per-query counts are
    * query-cardinality. (round 4)
    */
  def annRecallIvf(s: SparkSession, dir: String): DataFrame =
    annRecallIvf(s, dir, D)

  /** Config-parameterized recall monitor: the gate a deployment runs
    * after re-sizing `ivfK`/`ivfProbe` (the spec pins a floor for
    * K ∈ {16, 64} at every test scale). */
  def annRecallIvf(s: SparkSession, dir: String,
      cfg: SimilarityConfig): DataFrame = {
    val bf = annTopkBruteforce(s, dir).select(col("q_id"), col("vec_id"))
    val iv = annTopkIvf(s, dir, cfg).select(col("q_id"), col("vec_id"))
    val inter = bf.join(iv, Seq("q_id", "vec_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    bf.select("q_id").distinct()
      .join(inter, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / TopK).as("recall"))
      .orderBy("q_id")
  }

  lazy val annRecallIvfSql: String =
    s"""WITH bf AS (SELECT q_id, vec_id FROM ($annTopkBruteforceSql)),
       ivfk AS (SELECT q_id, vec_id FROM ($annTopkIvfSql)),
       inter AS (SELECT q_id, COUNT(*) AS n_hit
                 FROM bf JOIN ivfk USING (q_id, vec_id) GROUP BY q_id),
       qs AS (SELECT DISTINCT q_id FROM bf)
       SELECT qs.q_id, CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
              CAST(COALESCE(n_hit, 0) AS DOUBLE) / $TopK AS recall
       FROM qs LEFT JOIN inter USING (q_id) ORDER BY q_id"""
}
