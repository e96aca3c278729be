package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
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
    * identical-text group.
    *
    * Shuffle key is a 128-bit md5 digest of the text, NOT the text itself:
    * nothing wider than (doc_id, 16-byte digest) ever crosses an exchange,
    * and 128 bits keeps the collision birthday bound negligible at 10^12
    * docs (~10^24 pairs vs 2^128). The group aggregate is narrow
    * (digest -> keeper, count) and the join back is digest-keyed, so the
    * plan at 100 TB is two narrow hash shuffles — never a window holding
    * full-text rows.
    */
  def exactDups(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"), md5(col("text").cast("binary")).as("_digest"))
    val groups = keyed.groupBy("_digest")
      .agg(min("doc_id").as("keeper_doc_id"), (count("*") > 1).as("is_dup"))
    keyed.join(groups, "_digest")
      .select("doc_id", "keeper_doc_id", "is_dup")
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

  /** n-gram Jaccard near-dup pairs above `threshold`, via a frequency-capped
    * inverted shingle index:
    *
    *   1. the exploded index (doc_id, shingle) is computed ONCE and
    *      persisted — the tokenize+shingle pass dominates cost and would
    *      otherwise re-run for every branch that references it (both join
    *      sides + sizes + the hot-shingle census: 4x in the uncached plan).
    *      At 100 TB this is the standard materialized shingle-index
    *      artifact (persist -> a parquet/Iceberg intermediate table).
    *   2. shingles with doc-frequency > `maxShingleDocFreq` are DROPPED
    *      before the self-join (standard stop-shingle preconditioning): a
    *      stop-shingle in f docs emits f^2 join rows, so one uncapped hot
    *      shingle is the thing that dies at 100 TB; the cap bounds every
    *      shingle's fan-out to maxShingleDocFreq^2. Hot shingles are few by
    *      definition -> broadcast anti-join, no extra shuffle of the index.
    *   3. sizes and intersections are both computed over the CAPPED shingle
    *      space, so the emitted jaccard is the similarity over
    *      discriminative shingles. Tradeoff (documented, standard): when
    *      the cap activates, (a) pairs sharing ONLY stop-shingles are not
    *      candidates (recall loss on non-discriminative overlap — the pairs
    *      near-dup detection deliberately ignores), and (b) jaccard values
    *      exclude stop-shingle mass from numerator and denominator alike.
    *
    * On the synthetic corpora nothing reaches the default cap (max observed
    * shingle doc-frequency: 29 at sf0.01, 236 at sf0.1), so the output is
    * row-identical to the uncapped oracle.
    */
  def jaccardPairs(docs: DataFrame, threshold: Double,
                   maxShingleDocFreq: Int = 500): DataFrame = {
    val idx = shingleIndex(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val hot = idx.groupBy("shingle").agg(count("*").as("_df"))
      .filter(col("_df") > maxShingleDocFreq).select("shingle")
    val capped = idx.join(broadcast(hot), Seq("shingle"), "left_anti")
    val sizes = capped.groupBy("doc_id").agg(count("*").as("n_shingles"))
    val inter = capped.as("a").join(capped.as("b"),
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
