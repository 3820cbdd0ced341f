package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Relational operator pack over the driver's TPC-H-ish tables
  * (SURVEY.md §2.9: the reference has no relational layer; the driver's
  * north star asks for general query capability designed for 100 TB).
  *
  * Float determinism policy (applies to every oracle-compared query here):
  * sums of doubles are order-dependent in the last ulps, and the driver
  * hash-compares values. So every aggregate over a double column goes
  * through a DECIMAL cast — exact, associative, order-independent — and is
  * cast back to DOUBLE for output. Per-row double arithmetic is IEEE-
  * deterministic and needs no such treatment.
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(28, 6))

  /** TPC-H Q1-style pricing summary. Map-side partial aggregation into a
    * 6-group shuffle — the canonical "scales to any size" aggregate. */
  def q1(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))))
          .cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r_q1_pricing_summary" -> ((s, d) => q1(Tables.lineitem(s, d))))

  def oracles: Map[String, String] = Map(
    "r_q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
}
