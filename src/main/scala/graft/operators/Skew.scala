package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has heavy hitters
  * (AQE's skew-join split handles sort-merge joins adaptively; explicit
  * salting is the deterministic fallback and works for any join shape).
  *
  * saltedJoin replicates the small side `salts` times and scatters the
  * big side's hot keys across the replicas: the hot key's rows land in
  * `salts` different tasks instead of one straggler. Output equals the
  * plain inner join (the salt column never leaves the operator).
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // deterministic per-row scatter: any well-mixed function of the row
    // position works — correctness never depends on the salt value
    val saltedBig = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
