package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism floor for heavy per-row map work that sits
  * directly on a narrow scan (guide §2.5 "input skew: one huge unsplittable
  * file … repartition immediately after the read").
  *
  * The bench tables are each ONE parquet row group, so every scan is a
  * single task no matter what `maxPartitionBytes`/`minPartitionNum` say —
  * parquet assigns a row group to the split holding its midpoint, so a
  * one-row-group file is one working task at any split size. Any expensive
  * per-row expression chained onto the scan (per-shingle md5, tokenizer
  * regexes, explodes) therefore runs single-threaded while the other
  * cores idle.
  *
  * `widen` inserts a hash repartition to the session's default parallelism
  * ONLY when the scan's actual partition count is below it — at production
  * scale a 100 TB table scans as thousands of splits, the guard sees
  * partitions >= cores, and the operator is a no-op (no exchange added);
  * the guard itself costs one physical planning of the narrow scan, no job.
  * Hash partitioning on the row key (not round-robin) keeps the placement
  * deterministic under task retry (SPARK-38388) and skips the
  * sort-before-repartition a keyless round-robin pays.
  *
  * Use ONLY where downstream results are partitioning-order-immune
  * (per-row outputs, integer/exact arithmetic, or aggregations already
  * keyed by the repartition key) — every judged adoption is re-proven
  * against the DuckDB oracle.
  */
object Par {
  def widen(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }
}
