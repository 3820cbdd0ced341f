package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Plan-shaping helpers shared by the pipeline operators. */
object Stage {

  /** Optimization BARRIER around an expensive computed column — see
    * [[graft.functions.BarrierExpression]] for why and how. Use on
    * columns that are (a) expensive (regex chains, HOF metrics — these
    * run interpreted, where Catalyst does no common subexpression
    * elimination) and (b) filtered on downstream. Measured effect:
    * quality_passed 18.2 s -> 1.7 s at the 50k-doc probe; the inlining
    * cost ~2x per-row metric evaluation on the scan's (possibly single)
    * split. */
  def once(c: Column): Column = graft.functions.Barrier(c)
}
