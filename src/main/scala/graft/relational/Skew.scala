package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation helpers — the manual tools for when AQE's runtime
  * skew-join splitting isn't available (e.g. a skewed broadcast-infeasible
  * join) or an aggregation hot key dominates a partition. Both are
  * result-identical to their naive forms; only the exchange changes.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Salted equi-join: the big (skewed) side gets a per-row salt; the
    * small side is replicated `salts` times so every (key, salt) bucket
    * finds its match. Hot keys spread over `salts` reducers instead of
    * one. The salt derives from a hash of the whole row (deterministic
    * given row content; any assignment yields the same join result). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn(SaltCol,
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salts)).cast("int"))
    val replicated = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Two-phase salted aggregation: partial count per (key, salt), then
    * re-aggregate per key. Spark's map-side partial aggregation already
    * does this for plain counts; the explicit form matters for
    * high-cardinality combiners (collect-like, distinct-heavy) where the
    * partial-agg hash map degrades on a hot key. */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    df.withColumn(SaltCol,
        pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(salts)).cast("int"))
      .groupBy(col(key), col(SaltCol)).agg(count(lit(1)).as("partial_n"))
      .groupBy(col(key)).agg(sum(col("partial_n")).as("n"))
  }
}
