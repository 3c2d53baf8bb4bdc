package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Package-shaped source/sink: a directory with a `_manifest.json`
  * describing each table (name, columns, types, row count) plus one
  * parquet dir per table.
  *
  * Reference semantics: the "configuration package" container —
  * Codeunit 60000 - Config. XML Exchange.al:267 `ExportPackageXML`
  * (whole-package export) and Codeunit 60001:600
  * `AddPackageAndTableInformation` (package/table metadata cells).
  * Spark-first: data is written as partitioned parquet via the
  * DataFrameWriter (streams through executors, never the driver);
  * only the tiny manifest is driver-side.
  */
object PackageIO {

  case class TableMeta(name: String, columns: Seq[(String, String)], rows: Long)

  def writePackage(spark: SparkSession, dir: String,
                   tables: Map[String, DataFrame]): Seq[TableMeta] = {
    val metas = tables.toSeq.sortBy(_._1).map { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/data/$name")
      // re-read for the authoritative count: cheap (parquet footers only)
      val rows = spark.read.parquet(s"$dir/data/$name").count()
      TableMeta(name, df.schema.fields.map(f => f.name -> f.dataType.sql), rows)
    }
    val json = metas.map { m =>
      val cols = m.columns
        .map { case (n, t) => s"""{"name":"$n","type":"$t"}""" }
        .mkString("[", ",", "]")
      s"""{"table":"${m.name}","rows":${m.rows},"columns":$cols}"""
    }.mkString("[", ",", "]")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_manifest.json"), json)
    metas
  }

  def readTable(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/data/$name")

  def manifest(dir: String): String =
    java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/_manifest.json"))
}
