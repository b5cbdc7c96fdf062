package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: enables
  * `--conf spark.sql.extensions=graft.sql.GraftExtensions` so every graft
  * operator is SQL-available in any session of the cluster without
  * programmatic registration (the deployment-idiomatic variant of
  * [[GraftFunctions.register]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    for ((name, builder) <- GraftFunctions.registry)
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.sql", name), builder))
}
