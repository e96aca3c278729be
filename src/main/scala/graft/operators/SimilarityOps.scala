package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over the `embeddings` table
  * (vec_id, embedding: array<float>, label).
  *
  * Dot products are strict left-folds in double precision so the DuckDB
  * oracle (list_reduce) reproduces results bit-for-bit; outputs round to 6
  * decimals as belt-and-braces.
  */
object SimilarityOps {

  /** Strict left-fold dot product in double (bit-identical to DuckDB's
    * list_reduce over the same element order: 0.0 + x1 == x1 exactly).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Shuffle-free partial top-k: keep at most `k` rows per key per INPUT
    * partition (bounded heap, ordered score desc / tie asc — the same order
    * the final rank uses), so the global per-key rank that follows sees at
    * most k * nKeys * nPartitions rows instead of the full scored set.
    *
    * This is the scale-safe reduction: a row_number() window straight over
    * the scored set hash-shuffles EVERY scored row into <= nKeys reducer
    * partitions and fully sorts each — the textbook single-reducer collapse
    * at 100 TB. The bounded-heap pass is narrow (no exchange), and the
    * global top-k of the union of per-partition top-k's is exactly the
    * global top-k of the input, so results are bit-identical.
    *
    * mapPartitions is justified here (same argument as Multimodal): a
    * bounded per-key heap has no Catalyst equivalent that avoids buffering
    * unbounded groups (collect_list partials carry ALL elements through the
    * shuffle).
    */
  private[graft] def localTopKPerKey(scored: DataFrame, keyCol: String,
                                     scoreCol: String, tieCol: String,
                                     k: Int): DataFrame = {
    val schema = scored.schema
    val ki = schema.fieldIndex(keyCol)
    val si = schema.fieldIndex(scoreCol)
    val ti = schema.fieldIndex(tieCol)
    def score(r: Row): Double =
      if (r.isNullAt(si)) Double.NegativeInfinity else r.getDouble(si)
    def tie(r: Row): Long = r.getAs[Number](ti).longValue()
    // dequeue order = "worst kept row first": lowest score, then largest
    // tie. Doubles compare via java.lang.Double.compare so NaN sorts as
    // GREATER than every value — exactly how the final rank window orders
    // `desc` (NaN first, nulls last); a tuple Ordering on -score would
    // invert NaN and evict rows the window keeps.
    val evictFirst: Ordering[Row] = new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        val s = java.lang.Double.compare(score(b), score(a)) // lower score = worse = larger
        if (s != 0) s else java.lang.Long.compare(tie(a), tie(b)) // larger tie = worse
      }
    }
    implicit val enc = Encoders.row(schema)
    scored.mapPartitions { it =>
      val heaps = collection.mutable.HashMap
        .empty[Any, collection.mutable.PriorityQueue[Row]]
      it.foreach { r =>
        val h = heaps.getOrElseUpdate(r.get(ki),
          collection.mutable.PriorityQueue.empty[Row](evictFirst))
        if (h.size < k) h.enqueue(r)
        else if (evictFirst.lt(r, h.head)) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  /** Global exact top-k per key: narrow partial top-k, then a rank window
    * over the (tiny) survivor set only.
    */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val local = localTopKPerKey(scored, "query_id", "cos", "neighbor_id", k)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    local.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Brute-force cosine top-k: the first `nQueries` vectors against the
    * whole table, broadcast on the (small) query side. The correctness
    * baseline: exact, O(nQueries * N), scales by broadcasting queries and
    * scanning the big side once — no shuffle except the final per-query
    * top-k (tiny after the rank filter).
    */
  def bruteTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("embedding")).as("cos"))
    topK(scored, k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Sign-LSH bucket over the first `bits` dimensions: 2^bits buckets. */
  def signBucket(v: Column, bits: Int = 8): Column =
    (0 until bits).map(i =>
      when(element_at(v, i + 1) > 0f, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)

  /** Bucketed ANN (IVF-style scale path): queries probe only their own
    * sign-LSH bucket. At 100 TB the bucket id becomes the partition key of
    * the vector table, so a probe touches 1/2^bits of the data; candidates
    * join on bucket (shuffle on a small key), exact rerank inside.
    */
  def lshTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3, bits: Int = 8): DataFrame = {
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), bits).as("bucket"))
    val q = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket"))
    val scored = bucketed.join(broadcast(q), "bucket")
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("bucket"),
        cosine(col("qv"), col("embedding")).as("cos"))
    topK(scored, k)
      .select(col("query_id"), col("neighbor_id"), col("bucket"), col("rank"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** IVF-style index: the vector table written partitioned by sign-LSH
    * bucket. At 100 TB this is the difference between scanning the table
    * per probe and reading 1/2^bits of it: the bucket equality predicate
    * becomes PARTITION PRUNING at the source (visible as `PartitionFilters`
    * in explain), so a probe's IO is bounded by its bucket.
    */
  def buildIvfIndex(emb: DataFrame, path: String, bits: Int = 8): Unit =
    emb.select(col("vec_id"), col("embedding"),
        signBucket(col("embedding"), bits).as("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Probe the IVF index: per query, read ONLY its bucket partition and
    * rerank exactly. Equivalent results to lshTopK (asserted in tests);
    * different physical plan (pruned scans instead of a shuffle join).
    */
  def ivfTopK(spark: org.apache.spark.sql.SparkSession, indexPath: String,
              queries: DataFrame, k: Int = 3, bits: Int = 8): DataFrame = {
    val idx = spark.read.parquet(indexPath)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      signBucket(col("embedding"), bits).as("bucket"))
    // the join key is the partition column -> dynamic partition pruning /
    // pushed partition filters bound each probe's scan to one bucket
    val scored = idx.join(broadcast(q), "bucket")
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("bucket"),
        cosine(col("qv"), col("embedding")).as("cos"))
    topK(scored, k)
      .select(col("query_id"), col("neighbor_id"), col("bucket"), col("rank"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, via the same
    * sign-LSH bucketing (candidates must share a bucket).
    */
  def cosineDupPairs(emb: DataFrame, threshold: Double, bits: Int = 8): DataFrame = {
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), bits).as("bucket"))
    bucketed.as("x").join(bucketed.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        cosine(col("x.embedding"), col("y.embedding")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos_sim"))
  }
}
