package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps.{tokenSig, tokens}

/** Deduplication operators for the training-data pipeline: exact hash
  * dedup, n-gram Jaccard near-dup via an inverted shingle index, and
  * MinHash+LSH banding — the shapes that scale to 100 TB (shingle-join,
  * band-bucket-join; never an O(n^2) cross product).
  *
  * Hash constants are engine-portable integer arithmetic so the DuckDB
  * oracle replicates signatures exactly (graft.Oracle).
  */
object DedupOps {

  val P = 1000000007L

  /** Exact dedup: every doc mapped to the keeper (min doc_id) of its
    * identical-text group. At scale this is a single hash shuffle on a text
    * digest; here text itself is the key (the digest would be xxhash64).
    */
  def exactDups(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("text")
    docs.select(
      col("doc_id"),
      min("doc_id").over(w).as("keeper_doc_id"),
      (count("*").over(w) > 1).as("is_dup"))
  }

  /** Distinct word-3-gram shingle codes per document (polynomial over
    * token signatures; values < P so no overflow). Use `withShingles` in
    * plans: referencing `sigs` inside the per-element lambda would re-derive
    * the whole signature array per shingle otherwise.
    */
  def shingleCodes(text: Column): Column =
    shingleCodesFrom(transform(tokens(text), tokenSig(_)))

  private def shingleCodesFrom(sigs: Column): Column =
    // sequence() descends when start > stop, so guard short documents
    when(size(sigs) < 3, array().cast("array<bigint>")).otherwise(
      array_distinct(
        transform(sequence(lit(1), size(sigs) - 2), i =>
          pmod(element_at(sigs, i) * lit(131L * 131L)
            + element_at(sigs, i + 1) * lit(131L)
            + element_at(sigs, i + 2), lit(P)))))

  /** docs + a materialized `_codes` column: the signature array lands in
    * its own projection first, so the shingle lambda's three element_at
    * references share ONE evaluation per row instead of re-deriving the
    * array per element (a >100x per-row blowup otherwise; CollapseProject
    * keeps multi-referenced non-cheap aliases materialized).
    */
  def withShingles(docs: DataFrame): DataFrame =
    docs
      .withColumn("_sigs", transform(tokens(col("text")), tokenSig(_)))
      .withColumn("_codes", shingleCodesFrom(col("_sigs")))
      .drop("_sigs")

  /** doc_id -> exploded distinct shingle codes (the inverted index). */
  def shingleIndex(docs: DataFrame): DataFrame =
    withShingles(docs).select(col("doc_id"), explode(col("_codes")).as("shingle"))

  /** n-gram Jaccard near-dup pairs above `threshold`, via shingle-join:
    * candidates share >=1 shingle, intersection counted by the join,
    * |union| = |A| + |B| - |inter|. Scales as a shuffle on shingle code
    * (hot shingles would be frequency-capped at 100 TB; the synthetic
    * corpus needs no cap).
    */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sizes = withShingles(docs).select(col("doc_id"),
      size(col("_codes")).cast("long").as("n_shingles"))
    val idx = shingleIndex(docs)
    val a = idx.as("a")
    val b = idx.as("b")
    val inter = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count("*").as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")
  }

  /** MinHash parameter table: K independent affine hashes (a_i, b_i) mod P,
    * derived from a fixed formula so the oracle regenerates them.
    */
  def minhashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map(i => (123457L * i + 100003L, 987643L * i + 31L))

  /** K-wide MinHash signature per document as an array column. The shingle
    * array is computed once into its own projection so the K per-hash mins
    * reference it instead of inlining K copies of the shingling expression
    * (a 16x planning/execution blowup otherwise).
    */
  def minhashSignature(docs: DataFrame, k: Int = 16): DataFrame = {
    val sig = array(minhashParams(k).map { case (a, b) =>
      array_min(transform(col("_codes"), c => pmod(c * a + b, lit(P))))
    }: _*)
    withShingles(docs).select(col("doc_id"), sig.as("minhash"))
  }

  /** LSH banding: K/r bands of r rows; docs sharing any band bucket are
    * candidate pairs. Returns distinct (doc_a < doc_b) candidates. The
    * band-bucket join is the 100 TB-scale path: shuffle keyed on
    * (band, bucket), no cross product.
    */
  def lshCandidates(docs: DataFrame, k: Int = 16, r: Int = 4): DataFrame = {
    val sigs = minhashSignature(docs, k)
    val bands = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(k / r - 1)), bnd =>
        concat_ws(":", transform(
          slice(col("minhash"), (bnd * r + 1).cast("int"), lit(r)),
          x => x.cast("string"))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }
}
