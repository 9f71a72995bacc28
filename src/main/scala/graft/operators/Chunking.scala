package graft.operators

import graft.Q
import graft.functions.Text._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-window chunking and the chunk-granularity corpus operators
  * built on it — the segmentation layer of an LLM training-data
  * pipeline (context-window packing wants fixed-token pieces, dedup and
  * boilerplate removal want sub-document granularity). The reference
  * corpus has no paragraph markers (documents are flat token streams),
  * so the unit is a fixed-size token window, exactly like
  * context-window chunking in retrieval/training preprocessing.
  *
  * Scale shape shared by all three: the only exploded stream is one row
  * per CHUNK (corpus_tokens / stride rows), never one per token; every
  * corpus-wide group/join keys on a 32-hex md5 of the chunk, so the
  * shuffled payload is bounded regardless of chunk text size. All
  * arithmetic is integer-exact (BIGINT), division appears only in
  * final projections — DuckDB-hash-portable per SURVEY.md §5.
  */
object Chunking {

  /** Tokens per chunk. */
  val ChunkSize = 32

  /** Stride for the overlapping read-context form: 24 ⇒ 8-token
    * overlap between consecutive chunks.
    */
  val Stride = 24

  /** Chunk document-frequency at or above which a chunk is considered
    * boilerplate (appears verbatim in >= this many distinct docs).
    */
  val BoilerplateDf = 2

  /** One row per (doc, window start): doc_id, chunk_id, chunk_text,
    * n_tok. Starts are 0, stride, 2*stride, ... < n_tokens, so a doc
    * with at least one token always yields its prefix chunk and no
    * empty tail chunk is emitted. Implemented as explode over the
    * START LIST only (`sequence` of ~n/stride longs), with the token
    * array sliced per start — the token array itself is never
    * exploded.
    */
  private def chunks(s: SparkSession, dir: String, stride: Int): DataFrame = {
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .withColumn("n", size(col("tk")).cast("long"))
      .filter(col("n") >= 1) // Spark sequence() rejects 0 > n-1
    t.select(col("doc_id"), col("tk"), col("n"),
        explode(sequence(lit(0L), col("n") - 1L, lit(stride.toLong)))
          .as("start"))
      .select(
        col("doc_id"),
        expr(s"CAST(start div $stride AS INT)").as("chunk_id"),
        array_join(
          slice(col("tk"), (col("start") + 1L).cast("int"), lit(ChunkSize)),
          " ").as("chunk_text"),
        least(lit(ChunkSize.toLong), col("n") - col("start")).as("n_tok"))
  }

  /** SQL twin of [[chunks]] as DuckDB CTE text (range() excludes the
    * stop bound exactly like the Spark `sequence(0, n-1, stride)`
    * inclusive form: both emit every multiple of stride < n; list
    * slices clamp at the array end in both engines).
    */
  private def chunksSql(stride: Int): String =
    s"""t AS (SELECT doc_id, ${sqlToks("text")} AS tk FROM documents),
       c AS (SELECT doc_id, tk, len(tk) AS n,
               unnest(range(0, len(tk), $stride)) AS start
             FROM t),
       chunk AS (SELECT doc_id,
               CAST(start // $stride AS INT) AS chunk_id,
               array_to_string(list_slice(tk, start + 1, start + $ChunkSize),
                 ' ') AS chunk_text,
               least($ChunkSize, n - start) AS n_tok
             FROM c)"""

  /** Overlapping context-window chunking (reading form: stride <
    * size). This is the exploded surface other stages consume; emitted
    * as a query so the contract itself is oracle-gated.
    */
  def chunkDocuments(s: SparkSession, dir: String): DataFrame =
    chunks(s, dir, Stride).orderBy("doc_id", "chunk_id")

  val chunkDocumentsSql: String =
    s"""WITH ${chunksSql(Stride)}
       SELECT doc_id, chunk_id, chunk_text, n_tok FROM chunk
       ORDER BY doc_id, chunk_id"""

  /** Corpus-wide exact dedup at chunk granularity (non-overlapping
    * stride = size, so survivors reconstruct text without double
    * counting): canonical occurrence = lexicographically least
    * (doc_id, chunk_id) per chunk hash. The min is taken over a single
    * packed BIGINT key, so the whole query is one map-side-combinable
    * aggregation over (hash → packed key) — no window, no self-join,
    * and only 32-hex hashes + two BIGINTs ever shuffle.
    */
  def chunkDedupExact(s: SparkSession, dir: String): DataFrame =
    chunks(s, dir, ChunkSize)
      .select(col("doc_id"), col("chunk_id"),
        md5(col("chunk_text")).as("h"))
      .groupBy("h")
      .agg(min(col("doc_id") * 1000000L + col("chunk_id")).as("k"),
        count(lit(1)).as("n_dups"))
      .select(expr("k div 1000000").as("doc_id"),
        expr("CAST(k % 1000000 AS INT)").as("chunk_id"),
        col("h"), col("n_dups"))
      .orderBy("doc_id", "chunk_id")

  val chunkDedupExactSql: String =
    s"""WITH ${chunksSql(ChunkSize)},
       g AS (SELECT md5(chunk_text) AS h,
               min(doc_id * 1000000 + chunk_id) AS k,
               CAST(COUNT(*) AS BIGINT) AS n_dups
             FROM chunk GROUP BY 1)
       SELECT k // 1000000 AS doc_id, CAST(k % 1000000 AS INT) AS chunk_id,
              h, n_dups
       FROM g ORDER BY doc_id, chunk_id"""

  /** Boilerplate removal: a chunk whose verbatim text occurs in >=
    * [[BoilerplateDf]] DISTINCT documents (site chrome, license
    * headers, nav text at web scale) is dropped from every document;
    * each document is re-assembled from its surviving non-overlapping
    * chunks in order. Every doc keeps a row (n_kept = 0 when fully
    * boilerplate). The document-frequency table keys on md5, so the
    * wide chunk text crosses the wire once (explode → hash), and the
    * verdict join is hash-to-hash.
    */
  def stripBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val seg = chunks(s, dir, ChunkSize)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"),
        md5(col("chunk_text")).as("h"))
    val dfreq = seg.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("df"))
    val kept = seg.join(dfreq, "h")
      .filter(col("df") < BoilerplateDf)
    val tot = seg.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("chunk_id"),
              col("chunk_text")))),
            x => x.getField("chunk_text")),
          " ").as("kept_text"))
    tot.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
      .orderBy("doc_id")
  }

  val stripBoilerplateSql: String =
    s"""WITH ${chunksSql(ChunkSize)},
       seg AS (SELECT doc_id, chunk_id, chunk_text, md5(chunk_text) AS h
               FROM chunk),
       dfreq AS (SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                 FROM seg GROUP BY 1),
       kept AS (SELECT s.doc_id, s.chunk_id, s.chunk_text
                FROM seg s JOIN dfreq USING (h)
                WHERE dfreq.df < $BoilerplateDf),
       tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
               FROM seg GROUP BY 1),
       rebuilt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                     string_agg(chunk_text, ' ' ORDER BY chunk_id)
                       AS kept_text
                   FROM kept GROUP BY 1)
       SELECT tot.doc_id, tot.n_chunks,
              COALESCE(rebuilt.n_kept, 0) AS n_kept,
              COALESCE(rebuilt.kept_text, '') AS kept_text
       FROM tot LEFT JOIN rebuilt USING (doc_id)
       ORDER BY doc_id"""

  def queries: Seq[Q] = Seq(
    Q("chunk_documents", Some(chunkDocumentsSql))(chunkDocuments),
    Q("chunk_dedup_exact", Some(chunkDedupExactSql))(chunkDedupExact),
    Q("strip_boilerplate", Some(stripBoilerplateSql))(stripBoilerplate))
}
