package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins — the storage-side
  * answer to "this join shuffles 100 TB every run".
  *
  * A bucketed table is hash-partitioned into a fixed number of files
  * per partition AT WRITE TIME (and optionally sorted within each
  * bucket). When two tables are bucketed on the same keys with the
  * same bucket count, Catalyst recognizes the co-location and plans
  * their join WITHOUT an Exchange on either side — the per-run
  * shuffle cost is paid once, at layout time, instead of on every
  * query. This is the right trade for the engine's repeated
  * heavy-join workloads: pair generation re-joining on `block_key`,
  * near-dup candidate joins on band/bucket ids, fact-to-fact joins on
  * `doc_id`/`vec_id`.
  *
  * Sizing at 100 TB: pick `buckets` so one bucket ≈ 100–500 MB
  * (e.g. 100 TB / 256 MB ≈ 400k buckets is too many files — bucket
  * WITHIN date/source partitions instead, `partitionBy` + `bucketBy`,
  * so each partition holds a manageable bucket count). Bucket counts
  * should be a power of two so differently-sized tables can still
  * co-join via Spark's bucket coalescing
  * (`spark.sql.bucketing.coalesceBucketsInJoin.enabled`). */
object Bucketed {

  /** Write `df` as a bucketed (and bucket-sorted) parquet table at an
    * explicit `path`, registered as `table` in the session catalog.
    * Equality predicates on the bucket keys additionally prune the
    * scan to the matching bucket's files. Within-bucket sorting keeps
    * merge-join sorts cheap (nearly-sorted input); Spark only elides
    * the Sort entirely when each bucket is a single file AND
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` is on —
    * leave that to deployment tuning. */
  def write(df: DataFrame, table: String, path: String, buckets: Int,
      keys: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key")
    df.write.mode(mode).format("parquet").option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** The bucketed table as a DataFrame (scans carry the bucket spec,
    * which is what lets the planner elide the join Exchange). */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
