package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * A hot key sends its entire row population to one reducer; AQE's skew
  * split handles most cases automatically (on by default in Spark 4), but
  * when a single KEY (not just partition) is hot, salting is the standard
  * fix: spray the big side's hot key across `salts` sub-keys and replicate
  * the small side once per sub-key. Shuffle balance improves by ~`salts`×
  * at the cost of replicating the small side.
  */
object Skew {

  /** Salted inner equi-join on `key`: `big` gets a content-hash salt in
    * [0, salts), `small` is replicated for every salt value. Result equals
    * `big.join(small, key)` exactly (verified in SkewSpec). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)),
        lit(salts.toLong)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
