package graft.core

import org.apache.spark.sql.DataFrame

/** Fault-tolerant eager materialization for intermediate pipeline
  * results.
  *
  * Why not `localCheckpoint(true)`: executor-local checkpoint blocks
  * have TRUNCATED lineage — if an executor holding blocks dies after the
  * checkpoint, the job fails instead of recomputing. Fine in local mode,
  * the wrong default for a 100 TB pipeline stage. Writing to the scratch
  * filesystem and reading back keeps the result durable (any executor
  * can re-read it) while still letting upstream caches be released.
  */
object Scratch {

  /** Root for scratch tables: `spark.graft.scratch.dir` if set (point it
    * at a shared filesystem on a real cluster), else the JVM temp dir
    * (correct for local mode, where driver and executors share a host).
    */
  def root(df: DataFrame): String =
    df.sparkSession.conf.getOption("spark.graft.scratch.dir")
      .getOrElse(sys.props("java.io.tmpdir")
        .stripSuffix("/") + "/graft-scratch")

  /** Write `df` to a unique scratch path and return a fresh reader over
    * it. The caller may then unpersist/release whatever produced `df`.
    */
  def materialize(df: DataFrame, tag: String): DataFrame = {
    val path = s"${root(df)}/${tag}_${java.util.UUID.randomUUID()}"
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
