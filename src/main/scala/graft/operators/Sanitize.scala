package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String sanitization and lenient coercion (reference P8–P10,
  * run_exports_query.py:47-73 and merge_all_lenders.py:58-59).
  */
object Sanitize {

  /** The reference's Tableau-safety strip: removes `[ ] { } " \ ,`
    * (run_exports_query.py:60). */
  val StripPattern = "[\\[\\]\\{\\}\"\\\\,]"

  def stripSpecialChars(c: Column): Column = regexp_replace(c, StripPattern, "")

  /** pandas `to_numeric(errors='coerce')` ≡ try_cast: invalid → NULL.
    * (Plain `.cast` under Spark 4's default ANSI mode would throw.) */
  def coerceDouble(c: Column): Column = c.try_cast("double")

  /** pandas `to_datetime(errors='coerce')` ≡ try parse, invalid → NULL. */
  def coerceTimestamp(c: Column): Column = c.try_cast("timestamp")

  /** Data-quality counters the reference logs as warnings
    * (run_exports_query.py:64-67): rows still containing commas or
    * JSON-ish characters after sanitization. */
  def looksJsonish(c: Column): Column = c.rlike("[\\[\\]\\{\\}]")
}
