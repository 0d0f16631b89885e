package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join helpers for the 100 TB path (SURVEY.md §4
  * shuffle/partitioning row; builder directive "salting for skew").
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most cases
  * at runtime; explicit salting remains necessary when (a) the skewed
  * relation feeds an aggregation before the join so AQE cannot split it,
  * or (b) a single hot key exceeds what one task can hold even after AQE
  * splitting. These helpers implement the classic salt-and-replicate
  * scheme declaratively so Catalyst still owns the physical plan.
  */
object SkewTools {

  /** Equi-join `big ⋈ small` on `key`, salting the big side into
    * `saltFactor` sub-keys and replicating the small side across them.
    * Results are identical to `big.join(small, key)` — the salt only
    * splits hash-partition buckets. Inner joins only (the replicate side
    * must not produce null-extended rows per salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    val salted = big.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = small
      .withColumn("__salts", sequence(lit(0), lit(saltFactor - 1)))
      .withColumn("__salt", explode(col("__salts")))
      .drop("__salts")
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Aggregate-then-merge for skewed groupBy: pre-aggregate on
    * (key, salt), then merge partials on key. Identical result to a
    * direct `groupBy(key).agg(sum)` but the first shuffle spreads a hot
    * key over `saltFactor` reducers. Works for any commutative,
    * associative aggregate expressed as (partial, merge) column pairs. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int = 8, resultName: String = "total"): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * saltFactor).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(resultName))

  /** Top-frequency keys — the diagnostic used to decide whether a key
    * needs salting (run on a sample at scale). */
  def keyHistogram(df: DataFrame, key: String, topK: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topK)
}
