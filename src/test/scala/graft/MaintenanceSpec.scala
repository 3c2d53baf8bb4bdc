package graft

import org.apache.spark.sql.functions._
import graft.operators.{ExportImport, Maintenance}

class MaintenanceSpec extends SparkSpec {

  private def parquetFiles(dir: String): Int =
    new java.io.File(dir).listFiles
      .count(_.getName.endsWith(".parquet"))

  test("compact_files: file count drops, data is lossless") {
    val r = Maintenance.compactFiles(spark, sf).collect().head
    val nFrag = parquetFiles(ExportImport.scratch("frag-orders"))
    val nComp = parquetFiles(ExportImport.scratch("compact-orders"))
    assert(nFrag == 32, s"fragmented dir should have 32 files, has $nFrag")
    assert(nComp == 4, s"compacted dir should have 4 files, has $nComp")
    val orders = Tables.load(spark, sf, "orders")
    assert(r.getAs[Long]("n_rows") == orders.count())
    assert(r.getAs[Long]("n_keys") == orders.select("o_orderkey").distinct().count())
  }

  test("schema_evolution: merged read surfaces v1 rows with null new column") {
    val rows = Maintenance.schemaEvolution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val keys = Tables.load(spark, sf, "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
    assert(rows("unknown") == keys.count(_ % 2 == 0))
    assert(rows("web") == keys.count(k => k % 2 != 0 && k % 3 == 0))
    assert(rows("store") == keys.count(k => k % 2 != 0 && k % 3 != 0))
  }

  test("schema_diff: added/removed/retyped columns surface as data") {
    import org.apache.spark.sql.types._
    val v1 = StructType(Seq(StructField("k", LongType),
      StructField("gone", StringType), StructField("t", IntegerType)))
    val v2 = StructType(Seq(StructField("k", LongType),
      StructField("fresh", DoubleType), StructField("t", LongType)))
    val d = Maintenance.diffSchemas(spark, v1, v2).collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3))))
    assert(d.toSeq == Seq(
      ("fresh", "added", None, Some("double")),
      ("gone", "removed", Some("string"), None),
      ("t", "retyped", Some("int"), Some("bigint"))))
    // identical schemas diff to zero rows
    assert(Maintenance.diffSchemas(spark, v1, v1).count() == 0)
  }

  test("zorder_layout: on a full grid z-tiles are squares, linear is stripes") {
    import spark.implicits._
    // full 16x16 grid, 4-bit coords, 16 files: Morton tiles are exact
    // 4x4 squares; linear-on-x files are 1x16 columns
    val grid = for { x <- 0 until 16; y <- 0 until 16 }
      yield (x.toLong, y.toLong)
    val got = Maintenance
      .zorderLayoutFrom(grid.toDF("xr", "yr"), bits = 4, nFiles = 16)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("linear", 16L, 256L, 1.0, 16.0, 16.0),
      ("zorder", 16L, 256L, 4.0, 4.0, 16.0)))
    // a date-range (y) predicate touches 4/16 z-tiles but 16/16 stripes:
    // that factor-4 avg_y_span gap is the pruning evidence
  }
}
