package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatVecDot, FloatVecSqDist}

/** SparkSessionExtensions entry point: makes the engine's custom functions
  * available to ANY session via config, no code changes —
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * This is the library-integration path (preference order (c) in the
  * build guide) — the same hook a custom Rule/Strategy would use if a
  * future operator needs one; today only expression injection is
  * required (SURVEY.md §2.8: the reference surface needs zero custom
  * plans).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      graft.functions.VectorFunctions.binaryBuilder("vec_dot", FloatVecDot.apply)))
    ext.injectFunction((
      FunctionIdentifier("vec_sqdist"),
      new ExpressionInfo(classOf[FloatVecSqDist].getName, "vec_sqdist"),
      graft.functions.VectorFunctions.binaryBuilder("vec_sqdist",
        FloatVecSqDist.apply)))
    // the media codec surface (decode/values/dhash/resize + encoders)
    graft.functions.MediaFunctions.builders.foreach { case (name, cls, build) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        build))
    }
  }
}
