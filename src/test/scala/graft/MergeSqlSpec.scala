package graft

import graft.operators.MergeImport
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable
import org.scalatest.funsuite.AnyFunSuite

/** The lakehouse MERGE statement generator: the copy-paste port of
  * upsert()'s semantics onto Delta/Iceberg, pinned textually and parsed
  * with Spark's own SQL grammar (no lakehouse runtime exists in this
  * sandbox, so the parser is the strongest executable check). */
class MergeSqlSpec extends AnyFunSuite {

  private def parsed(sql: String) = CatalystSqlParser.parsePlan(sql)

  test("star form emits the documented MERGE statement") {
    val sql = MergeImport.mergeSql("lake.orders", "updates", Seq("o_orderkey"))
    assert(sql ==
      """MERGE INTO lake.orders AS t
        |USING updates AS u
        |ON t.`o_orderkey` = u.`o_orderkey`
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(parsed(sql).isInstanceOf[MergeIntoTable])
  }

  test("explicit form lists every column, keys never assigned") {
    val sql = MergeImport.mergeSql("t1", "u1", Seq("k"),
      columns = Seq("k", "price", "status"))
    assert(sql.contains(
      "WHEN MATCHED THEN UPDATE SET t.`price` = u.`price`, t.`status` = u.`status`"))
    assert(sql.contains(
      "WHEN NOT MATCHED THEN INSERT (`k`, `price`, `status`) " +
        "VALUES (u.`k`, u.`price`, u.`status`)"))
    // the key is equal by the ON predicate and must not be re-assigned
    assert(!sql.contains("t.`k` = u.`k`,") && !sql.contains("SET t.`k`"))
    assert(parsed(sql).isInstanceOf[MergeIntoTable])
  }

  test("composite keys AND-ed in the ON predicate") {
    val sql = MergeImport.mergeSql("t1", "u1", Seq("a", "b"),
      columns = Seq("a", "b", "v"))
    assert(sql.contains("ON t.`a` = u.`a` AND t.`b` = u.`b`"))
    assert(parsed(sql).isInstanceOf[MergeIntoTable])
  }

  test("BC-style display names survive via backtick quoting") {
    val sql = MergeImport.mergeSql("lake.sales", "inc", Seq("No."),
      columns = Seq("No.", "Amount Incl. VAT", "2. Priority"))
    assert(sql.contains("ON t.`No.` = u.`No.`"))
    assert(sql.contains("t.`Amount Incl. VAT` = u.`Amount Incl. VAT`"))
    assert(parsed(sql).isInstanceOf[MergeIntoTable])
  }

  test("key-only table has no WHEN MATCHED branch (nothing to update)") {
    val sql = MergeImport.mergeSql("t1", "u1", Seq("k"), columns = Seq("k"))
    assert(!sql.contains("WHEN MATCHED"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT (`k`) VALUES (u.`k`)"))
    assert(parsed(sql).isInstanceOf[MergeIntoTable])
  }

  test("invalid inputs fail loudly") {
    intercept[IllegalArgumentException] {
      MergeImport.mergeSql("t", "u", Seq.empty)
    }
    val err = intercept[IllegalArgumentException] {
      MergeImport.mergeSql("t", "u", Seq("k"), columns = Seq("v"))
    }
    assert(err.getMessage.contains("k"))
  }

  test("facade delegates with a single key") {
    assert(graft.api.Graft.mergeSql("tgt", "upd", "id")
      == MergeImport.mergeSql("tgt", "upd", Seq("id")))
  }

  test("full-sync form appends the BY SOURCE delete branch and parses") {
    val sql = graft.api.Graft.mergeSyncSql("tgt", "snap", "id")
    assert(sql.endsWith("WHEN NOT MATCHED BY SOURCE THEN DELETE"))
    assert(sql.startsWith(MergeImport.mergeSql("tgt", "snap", Seq("id"))))
    assert(parsed(sql).isInstanceOf[MergeIntoTable])
  }
}
