package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Warehouse sink — the reference loads its star schema into Postgres
  * row-by-row (insert_to_postgres.py `get_or_create` + INSERT per fact).
  * The Spark-native load is a partitioned columnar write; a JDBC
  * warehouse would take the exact same frames via `df.write.jdbc` (the
  * shaping below — partition alignment, file sizing — is what matters
  * at scale, not the wire format).
  */
object Warehouse {

  /** Write a fact table partitioned by a derived date column.
    *
    * Scale mechanics: `repartition(partition cols)` aligns shuffle
    * partitions with output partitions so every Hive partition is
    * written by ONE task — without it, every task writes a sliver of
    * every partition and a 1000-executor job emits millions of tiny
    * files. `sortWithinPartitions` on the clustering key gives parquet
    * row-group locality for key lookups.
    */
  def writeFactPartitioned(fact: DataFrame, path: String,
      partitionCol: String, clusterCol: String): Unit =
    fact
      .repartition(col(partitionCol))
      .sortWithinPartitions(clusterCol)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Write a small dimension as a single file (dims broadcast on read;
    * one file avoids pointless parallel-read overhead).
    */
  def writeDim(dim: DataFrame, path: String): Unit =
    dim.coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
}
