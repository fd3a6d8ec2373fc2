package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Explicit skew tooling for joins whose hot keys exceed what AQE's
  * skew-join splitting handles (a single key holding a double-digit share
  * of a 100 TB table ends up on one reducer no matter how AQE splits the
  * partition, because splitting happens at shuffle-block granularity on ONE
  * side).
  *
  * `saltedJoin` shards each hot key S ways: the skewed side gets a uniform
  * salt in [0, S) (derived from `monotonically_increasing_id`, so it's
  * data-independent and uniform within every partition), the other side is
  * replicated S× with all salts, and the join key becomes (keys, salt).
  * Results are exactly those of the unsalted join; cost is S× the small
  * side's shuffle volume — the standard trade for unsharded stragglers.
  */
object Skew {

  /** Join types where replicating `other` cannot fabricate output rows:
    * inner/left/semi/anti only. right/full outer would emit the S−1
    * unmatched salt copies of every `other` row as spurious null-extended
    * rows — flip the call (salt the other side) for those. */
  private val safeJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")

  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(safeJoinTypes(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti; " +
        "for right/full outer, salt the other side instead")
    val salted = skewed.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast(IntegerType))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
