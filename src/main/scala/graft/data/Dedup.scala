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
}
