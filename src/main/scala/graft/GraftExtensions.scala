package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: enable with
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  * Registers the native sketch/vector functions (SURVEY.md §2.11) and
  * the redundant-quantizer optimizer rule
  * ([[graft.plans.RoundBinSimplify]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.inject(ext)
    ext.injectOptimizerRule(_ => graft.plans.RoundBinSimplify)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
