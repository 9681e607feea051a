package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A group of named queries plus (where SQL-expressible) their DuckDB
  * oracle SQL. SparkEntry unions all modules into the driver contract.
  *
  * Contract rules (SURVEY.md §5/§7.4):
  *  - every query ends in an explicit total `orderBy` so the hash compare
  *    is deterministic;
  *  - float columns are `round(_, 4)` on BOTH sides;
  *  - column names match between the Spark result and the oracle SQL
  *    (the driver sorts columns by name before hashing).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
