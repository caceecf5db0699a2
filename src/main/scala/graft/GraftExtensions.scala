package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: build sessions with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` to get
  * the library's native expressions (`graft_dot`, …) registered at
  * session construction. Sessions built without it can call
  * [[graft.functions.NativeVectorExprs.register]] instead — both paths
  * install the same builders. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    graft.functions.NativeVectorExprs.injectables.foreach(extensions.injectFunction)
}
