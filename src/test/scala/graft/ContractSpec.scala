package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract integrity: every oracle key must name a real query (a
  * typo would silently degrade that query to the weaker rows-only check),
  * and the rows-only set stays explicit so additions are deliberate.
  */
class ContractSpec extends AnyFunSuite {

  // Round 4: v5/m2/m3 left this set — the stub codec became portable md5
  // hex-slices and the IVF oracle consumes the persisted centroid table.
  private val RowsOnly = Set.empty[String]

  test("every oracle key names an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("rows-only queries are exactly the documented set") {
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual === RowsOnly,
      s"unexpected rows-only queries: ${actual -- RowsOnly}; " +
        s"missing: ${RowsOnly -- actual}")
  }

  test("oracle SQL is non-empty and free of unescaped tabs") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"$k oracle empty")
      assert(!sql.contains("\t"), s"$k oracle contains a literal tab")
    }
  }
}
