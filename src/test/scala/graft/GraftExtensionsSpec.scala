package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftaccess.ExtensionsAccess

/** The spark.sql.extensions deployment path: a session built with
  * .config("spark.sql.extensions", "graft.GraftExtensions") must get the
  * native cosine expression AND the as-of join strategy. The test JVM
  * holds one shared SparkContext, so instead of building a second
  * session we apply the extensions class to a fresh
  * SparkSessionExtensions and read back what it injected. */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions class injects graft_cosine and the as-of strategy") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(ExtensionsAccess.registeredFunctionNames(ext) == Seq("graft_cosine"))
    assert(ExtensionsAccess.plannerStrategies(ext, spark)
      == Seq(graft.plans.AsOfJoinStrategy))
  }
}
