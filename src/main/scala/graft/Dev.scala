package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing probe for individual queries. Not part of the contract. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    if (args.lift(1).contains("--train-pq")) {
      // one-off: train the per-subspace product-quantizer codebooks and
      // print them as Scala literals (frozen into PqModel so the DuckDB
      // oracle can replay encode + ADC lookup bit-for-bit)
      import org.apache.spark.sql.functions.{col, slice}
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").repartition(8)
      val (mSub, subLen) = (8, 8)
      println("  val codebooks: Array[Array[Array[Double]]] = Array(")
      (0 until mSub).foreach { m =>
        val sub = emb.select(col("vec_id"),
          slice(col("embedding"), m * subLen + 1, subLen).as("embedding"))
        val (cents, costs) = operators.SimilarityOps.trainCentroids(spark, sub, k = 8, iters = 4)
        System.err.println(s"subspace $m costs: ${costs.mkString(", ")}")
        println("    Array(")
        cents.foreach(c => println(c.map(_.toString)
          .mkString("      Array(", ", ", "),")))
        println("    ),")
      }
      println("  )")
      spark.stop(); return
    }
    if (args.lift(1).contains("--train-ivf")) {
      // one-off: train the coarse quantizer and print it as Scala literals
      // (frozen into IvfModel so the DuckDB oracle can replay assignment)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").repartition(8)
      val (cents, costs) = operators.SimilarityOps.trainCentroids(spark, emb, k = 8, iters = 4)
      System.err.println(s"costs: ${costs.mkString(", ")}")
      println("  val centroids: Array[Array[Double]] = Array(")
      cents.foreach { c =>
        println(c.map(_.toString).grouped(6).map(_.mkString(", "))
          .mkString("    Array(", ",\n      ", "),"))
      }
      println("  )")
      spark.stop(); return
    }
    args.drop(1).foreach { q =>
      (1 to 2).foreach { r =>
        // codegen compile-time deltas adjudicate whether a slow first run
        // is janino/JIT compilation (one-time) or engine steady-state
        import org.apache.spark.metrics.source.CodegenMetrics._
        def cg(): (Long, Double) =
          (METRIC_COMPILATION_TIME.getCount,
           METRIC_COMPILATION_TIME.getSnapshot.getMean * METRIC_COMPILATION_TIME.getCount)
        val (c0, m0) = cg()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, dir).count()
        val tc = (System.nanoTime() - t0) / 1e9
        val (c1, m1) = cg()
        spark.catalog.clearCache()
        val t1 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
        val te = (System.nanoTime() - t1) / 1e9
        val (c2, m2) = cg()
        spark.catalog.clearCache()
        println(f"[time] $q run$r: count ${tc}%.1f s (rows=$n, ${c1 - c0} compiles ~${(m1 - m0) / 1000}%.1f s), " +
          f"exec ${te}%.1f s (${c2 - c1} compiles ~${(m2 - m1) / 1000}%.1f s)")
      }
    }
    spark.stop()
  }
}
