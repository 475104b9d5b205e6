import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Session-free `$"col"` interpolator for library modules (the
  * spark.implicits._ one needs a live SparkSession; column refs don't).
  * Files use chained `package graft; package ops` clauses to pick it up.
  */
package object graft {
  implicit final class ColStr(private val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
