package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point:
  * `--conf spark.sql.extensions=graft.GraftExtensions` injects the
  * engine's SQL functions ([[graft.functions.GraftFunctions]]) into
  * every session built by the cluster — the standard way to ship custom
  * Catalyst surface with a library jar.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.descriptions.foreach(ext.injectFunction)
}
