package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salting. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) splits
  * oversized partitions at runtime and is the first line of defense;
  * explicit salting is the deterministic fallback when a single JOIN KEY
  * (not just a partition) is hot — e.g. one card number generating 1% of
  * 100 TB — because no partition split can separate rows that share a
  * key.
  *
  * `saltedEquiJoin` spreads each key of the large side over `numSalts`
  * shuffle sub-keys and replicates the matching small-side rows across
  * all salt values, so a hot key's rows land on `numSalts` reducers
  * instead of one. Equivalent to the plain equi-join row-for-row
  * (verified against a DuckDB oracle and a plain-join spec).
  */
object Skew {

  /** Inner equi-join of `large ⋈ small` on `largeKey == smallKey`, with
    * the large side salted into `numSalts` sub-keys. The small side is
    * exploded ×numSalts (only acceptable because it is small — that
    * asymmetry is the point of the pattern).
    */
  def saltedEquiJoin(large: DataFrame, small: DataFrame,
                     largeKey: String, smallKey: String,
                     numSalts: Int): DataFrame = {
    // salt derivation must not depend on the join key (that would undo
    // the spread); a per-row id mod numSalts is uniform and cheap
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(numSalts.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated,
      salted(largeKey) === replicated(smallKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
