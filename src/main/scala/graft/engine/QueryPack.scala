package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of engine queries plus their DuckDB oracle SQL.
  *
  * Every oracle-checked query follows the determinism contract
  * (SURVEY.md §7, hard part 1):
  *   - total ORDER BY on a unique key set, mirrored in the oracle SQL;
  *   - double columns are produced only by (a) passthrough of stored
  *     values, (b) exact DECIMAL arithmetic cast to double at the end,
  *     or (c) identical-operand IEEE float/double ops on both engines;
  *   - aggregate/computed columns carry the same alias on both sides
  *     (the driver sorts columns by name before hashing).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}
