package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for 100 TB-scale shuffles. AQE's skew-join handling
  * (spark.sql.adaptive.skewJoin) covers sort-merge joins at runtime; these
  * operators cover the cases AQE does not: skewed AGGREGATIONS and
  * broadcast-infeasible joins against a replicable small side.
  */
object Skew {

  /** Deterministic salt in [0, n): hash of the whole row's listed columns.
    * (Not rand() — deterministic retries/speculative tasks matter.) */
  def saltCol(cols: Seq[Column], n: Int): Column =
    pmod(xxhash64(cols: _*), lit(n.toLong)).cast("int")

  /** Two-phase salted count: groupBy (key, salt) — spreading one hot key
    * over `n` reducers — then re-aggregate per key. Works for any
    * algebraic aggregate; count/sum shown. */
  def saltedCounts(df: DataFrame, key: String, saltFrom: Seq[String],
                   n: Int): DataFrame =
    df.withColumn("_salt", saltCol(saltFrom.map(col), n))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("cnt"))

  /** Salted join: the big side gets a deterministic salt, the small side is
    * replicated once per salt value, and the join runs on (key, salt) —
    * one hot key now lands on `n` reducers instead of one. Use when the
    * small side is too large to broadcast but cheap to replicate n×. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int,
                 joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      saltCol(big.columns.map(col).toSeq, n))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedBig.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
