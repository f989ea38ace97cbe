package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry

/** Test-only accessor for the private[sql] SparkSessionExtensions
  * registration path: applies the injected functions to a fresh registry —
  * exactly what SparkSession construction does with the
  * `spark.sql.extensions` static conf (which can't be re-applied on the
  * suite's already-running SparkContext). */
object GraftExtensionsProbe {
  def registeredFunctionNames(e: SparkSessionExtensions): Seq[String] = {
    val reg = new SimpleFunctionRegistry
    e.registerFunctions(reg)
    reg.listFunction().map(_.funcName)
  }
}
