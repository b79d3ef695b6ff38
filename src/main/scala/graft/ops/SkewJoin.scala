package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-salting for large joins (builder contract: "skewed keys
  * → salting or AQE skew-join"). AQE's skew-join split handles most
  * cases at runtime; this helper is the explicit variant for when the
  * skew is known up front (a handful of hot keys holding a large
  * fraction of a 100 TB fact table).
  *
  * The big side gets a random salt in [0, buckets); the small side is
  * exploded `buckets`× with every salt value; the join key becomes
  * (key, salt), spreading each hot key over `buckets` reducers. Row
  * multiplication happens only on the small side — the big side never
  * duplicates.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 8, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = big.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(exploded,
        salted(key) === exploded(key) && salted("__salt") === exploded("__salt"),
        joinType)
      .drop(exploded(key)).drop("__salt")
  }

  /** Convenience predicate for hot-key detection: keys above `frac` of
    * the table (driver-side result is tiny by construction).
    */
  def hotKeys(df: DataFrame, key: Column, frac: Double = 0.01): DataFrame = {
    val total = df.count()
    df.groupBy(key).count()
      .filter(col("count") > lit(total * frac))
  }
}
