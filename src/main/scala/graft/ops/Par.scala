package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for CPU-dense kernels. A source with fewer
  * input splits than the session's parallelism (here: the driver
  * testdata's single-row-group parquet files — every scan is ONE task)
  * serializes everything up to the first shuffle: shingle explosion, md5
  * hashing, regex batteries all run on one core while 31 idle. The guard
  * round-robins such under-split inputs out to full width first — one
  * tiny shuffle of the RAW rows (cheap by definition: the input is small
  * enough to be under-split) buying full-width execution of the
  * expansion stage. On a properly-split table (any real 100 TB layout)
  * the condition is false and this is a no-op, so the guard cannot
  * introduce a gratuitous corpus-wide shuffle at scale.
  */
private[ops] object Par {
  def ensure(df: DataFrame): DataFrame = {
    // streaming frames can't be inspected via .rdd (and micro-batch
    // parallelism is the source's concern) — pass them through untouched
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
