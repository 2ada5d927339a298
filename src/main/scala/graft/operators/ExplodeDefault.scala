package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Explode-with-default-element (reference O5, exports_results.sql:117-134:
  * `unnest(COALESCE(NULLIF(array_filter(results, …), []), [stub]))`) —
  * one output row per array element, but a single `default` row when the
  * array is NULL or empty, so every input row survives the explode.
  */
object ExplodeDefault {

  /** `explode(arr)` with a fallback single `default` element for NULL/empty
    * arrays. `size(NULL)` is NULL under Spark's non-legacy setting, so the
    * `when` falls through to the default for NULL arrays exactly like
    * DuckDB's `COALESCE(NULLIF(a, []), [stub])` (NULLIF(NULL, []) is NULL).
    */
  def explodeWithDefault(arr: Column, default: Column): Column =
    explode(when(size(arr) > 0, arr).otherwise(array(default)))
}
