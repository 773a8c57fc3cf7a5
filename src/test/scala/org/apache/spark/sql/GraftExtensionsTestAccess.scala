package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge: `SparkSessionExtensions.registerFunctions` is
  * private[sql], but it's exactly the seam that proves injected
  * builders land in a registry without constructing a whole session. */
object GraftExtensionsTestAccess {
  def registered(ext: SparkSessionExtensions, reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}
