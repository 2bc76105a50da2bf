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
  *
  * WHEN TO USE WHICH (the decision rule; `AqeSkewSpec` proves the AQE
  * half fires, `SkewSketchSpec` the salted half):
  *
  *  - **AQE skew split** (`OptimizeSkewedJoin`, on by default) is the
  *    FIRST resort and usually enough: it detects an oversized shuffle
  *    PARTITION at runtime from map output sizes and splits it across
  *    tasks, with zero query changes. It handles hot keys in JOINS —
  *    the matching small-side partition is replicated per split — and
  *    costs nothing when data is balanced. Let it work: don't pre-salt
  *    a join "just in case".
  *  - **Salting** ([[saltedJoin]]) is for what AQE cannot split:
  *    (a) a hot key under an AGGREGATION or window (AQE never splits a
  *    partition whose consumer needs all rows of a key together —
  *    pre-aggregate on (key, salt), then re-aggregate); (b) joins AQE
  *    won't touch — a skew split that would break a required child
  *    distribution (the join feeds a same-key aggregate/bucketed
  *    write) unless `forceOptimizeSkewedJoin` accepts the extra
  *    shuffle, and full outer joins (neither side splittable);
  *    (c) planner-stage certainty: a KNOWN pathological key (the q100
  *    audit's output) where per-run re-planning is unwanted.
  *  - At 100 TB prefer AQE + a raised
  *    `skewJoin.skewedPartitionThresholdInBytes` review over blanket
  *    salting: salting replicates the small side `salts`× and poisons
  *    every downstream equi-optimization on the original key.
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
