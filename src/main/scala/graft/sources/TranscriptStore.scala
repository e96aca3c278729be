package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materializes the synthesized transcripts table to local parquet once per
  * (sfDir, rep) and serves all pipeline reads from that scan.
  *
  * This mirrors the production shape of the north rule — the engine reads an
  * Iceberg/Parquet *table* of transcripts, it does not evaluate a generator
  * expression — and it keeps every query plan a plain columnar scan with
  * predicate pushdown and column pruning, instead of replicating the
  * (large) synthesis expression tree into every branch of every plan.
  */
object TranscriptStore {

  /** Template fingerprint: the store silently serves stale text across
    * code changes otherwise (the synthesis is deterministic ONLY for a
    * fixed template set, and the SQL rendering is part of the contract).
    */
  private lazy val templateVersion: String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(Payloads.textSql.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    digest.take(4).map("%02x".format(_)).mkString
  }

  private def storePath(dir: String, rep: Int): String = {
    val key = dir.replaceAll("[^a-zA-Z0-9.]", "_") +
      (if (rep > 1) s"_x$rep" else "") + s"_v$templateVersion"
    s"/root/repo/target/transcripts/$key"
  }

  /** Synthesize-if-needed, then return the parquet-backed transcripts scan. */
  def table(spark: SparkSession, dir: String, rep: Int = 1): DataFrame = {
    val path = storePath(dir, rep)
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) synchronized {
      if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
        // events.parquet is a single small file -> one input split; spread
        // the synthesis (and the store layout) across the cluster so the
        // render isn't single-threaded and downstream scans parallelize.
        val parts = math.max(spark.sparkContext.defaultParallelism, 8)
        Transcripts.transcripts(spark, dir, rep)
          .repartition(parts)
          .write.mode("overwrite").parquet(path)
      }
    }
    spark.read.parquet(path)
  }
}
