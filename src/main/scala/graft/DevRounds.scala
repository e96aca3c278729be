package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: round count + per-round wall of the star contraction on
  * the real candidate graphs (q32's LSH graph and q52's cosine graph).
  * Mirrors clustersFromEdgesStar's loop with timers. Not part of the
  * contract.
  */
object DevRounds {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    operators.Pipeline.configure(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(math.max(spark.sparkContext.defaultParallelism, 8))

    def loop(candName: String, cand: org.apache.spark.sql.DataFrame): Unit = {
      var t0 = System.nanoTime()
      def lap(name: String): Unit = {
        System.err.println(f"[devrounds] $candName $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
      }
      var edges = cand.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .filter(col("src") =!= col("dst"))
        .localCheckpoint(true)
      lap("init checkpoint")
      def star(e: org.apache.spark.sql.DataFrame, large: Boolean) = {
        val gamma = e.select(col("src").as("u"), col("dst").as("v"))
          .unionByName(e.select(col("dst").as("u"), col("src").as("v")))
        val g = gamma.withColumn("m",
          least(min(col("v")).over(org.apache.spark.sql.expressions.Window.partitionBy("u")), col("u")))
        val emitted =
          if (large) g.filter(col("v") > col("u")).select(col("v"), col("m"))
          else g.select(col("m"), explode(filter(array(
              when(col("v") <= col("u"), col("v")), col("u")),
              x => x.isNotNull)).as("v"))
            .select(col("v"), col("m"))
        val links = emitted.filter(col("v") =!= col("m"))
          .select(col("m").as("src"), col("v").as("dst"))
        if (large) links else links.distinct()
      }
      def checksum(e: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = e.agg(count(lit(1)), sum(xxhash64(col("src"), col("dst")))).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      var sig = checksum(edges)
      lap("init checksum")
      var iter = 0
      var converged = false
      while (!converged && iter < 25) {
        val next = star(star(edges, large = true), large = false).localCheckpoint(true)
        lap(s"round ${iter + 1} star+checkpoint")
        val nextSig = checksum(next)
        lap(s"round ${iter + 1} checksum")
        converged = nextSig == sig && next.except(edges).isEmpty
        if (converged) lap(s"round ${iter + 1} except confirm")
        edges = next
        sig = nextSig
        iter += 1
      }
      System.err.println(s"[devrounds] $candName rounds=$iter edges=${edges.count()}")
    }
    loop("lsh", operators.DedupOps.lshCandidates(docs))
    operators.Intermediates.release(spark)
    spark.stop()
  }
}
