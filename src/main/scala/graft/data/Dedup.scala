package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact
  * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join),
  * SimHash, and exact n-gram Jaccard.
  *
  * Portability: content hashes are md5 hex STRINGS and minhash takes
  * lexicographic minima of md5 strings — both engines (and any oracle)
  * produce identical values, unlike engine-private hash functions
  * (xxhash64 vs DuckDB's hash()).
  *
  * Scale: every operator is a hash-aggregate + equi-join — no windows over
  * whole partitions, no driver-side loops. The keeper-per-group joins use
  * the group hash as join key (shuffle-hash/SMJ territory at 100 TB; the
  * group table is the same cardinality as the input, so it is NOT
  * broadcast). LSH turns the quadratic all-pairs problem into an equi-join
  * on (band, bucket) — the only pairs materialized are real candidates.
  */
object Dedup {

  /** Exact dedup: md5 content hash, keeper = min(id) per hash group. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.withColumn("content_hash", md5(col(textCol)))
    val groups = hashed.groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("group_size"))
    hashed.join(groups, Seq("content_hash"))
      .withColumn("is_dup", col(idCol) =!= col("keeper_id"))
  }

  /** MinHash signature: k lexicographic-min md5("<seed>|<shingle>") strings. */
  def minhashSig(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => md5(concat(i.cast("string"), lit("|"), s)))))

  /** LSH band buckets: b bands of r signature rows, bucket = md5 of the
    * joined slice. Returns array of (band, bucket) structs. */
  def bandBuckets(sig: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)),
      j => struct(j.as("band"),
        md5(concat_ws("|", slice(sig, j * r + 1, lit(r)))).as("bucket")))

  /** Estimated Jaccard from two equal-length signatures: matching fraction. */
  def estJaccard(sigA: Column, sigB: Column, k: Int): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b)).cast("double") / k

  /** 16-bit SimHash as a '0'/'1' string: per bit position p, each word
    * votes ±1 by the high bit of hex digit p of its md5; bit = votes > 0. */
  def simhash16(words: Column): Column =
    array_join(
      transform(sequence(lit(1), lit(16)), p =>
        when(aggregate(words, lit(0), (acc, w) =>
          acc + when(lit("89abcdef").contains(md5(w).substr(p, lit(1))), 1).otherwise(-1)
        ) > 0, "1").otherwise("0")),
      "")

  /** Exact Jaccard over distinct shingle sets (int/int division — identical
    * doubles in every engine). */
  def jaccard(shA: Column, shB: Column): Column =
    size(array_intersect(shA, shB)).cast("double") /
      size(array_union(shA, shB)).cast("double")

  /** Connected components over an undirected edge list by iterative
    * min-label propagation: every node repeatedly adopts the minimum label
    * among itself and its neighbors until fixpoint; the component id is the
    * minimum node id in the component. This is the step that turns
    * near-dup CANDIDATE PAIRS into dedup GROUPS (pick one keeper per
    * component), i.e. the transitive closure the pairwise queries alone
    * don't give.
    *
    * Scale shape: a Pregel-style fixpoint — each iteration is ONE shuffle
    * (messages grouped by node) over O(edges) rows, and the iteration
    * count is the component DIAMETER, which for near-dup clusters is small
    * (dup groups are dense). The driver loop holds only the convergence
    * counter (one long per iteration), never data; intermediate label
    * tables are persisted and released generation-by-generation. For
    * web-scale graphs with long chains the same loop takes the
    * large-star/small-star contraction, which this formulation is the
    * degenerate (star-free) case of.
    *
    * Determinism: min() is order-free, so labels are independent of
    * partitioning and iteration interleaving.
    *
    * @return one row per node appearing in `edges`: (id, component). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    require(maxIter > 0, s"maxIter must be positive, got $maxIter")
    val bi = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .union(edges.select(col(dstCol).as("s"), col(srcCol).as("d")))
      .persist()
    var labels = bi.select(col("s").as("id")).distinct()
      .withColumn("component", col("id")).persist()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val msgs = bi.join(labels, bi("s") === labels("id"))
        .select(col("d").as("id"), col("component"))
      val next = labels.select(col("id"), col("component")).union(msgs)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .persist()
      changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .where(col("component") =!= col("old")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    bi.unpersist()
    // Loud failure beats silently-split components. Exiting on the
    // iteration cap with changed > 0 leaves the result UNPROVEN — the last
    // permitted iteration may or may not have reached the fixpoint (a
    // converged run always exits via a final zero-change iteration, so the
    // usable propagation depth is maxIter - 1) — and an unproven component
    // labeling can silently diverge from any transitive-closure oracle.
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not provably converge within $maxIter " +
          s"iterations (last iteration still changed $changed labels); " +
          "raise maxIter above the expected component diameter + 1")
    labels
  }
}
