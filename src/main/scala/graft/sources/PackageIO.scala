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

  case class TableMeta(name: String, columns: Seq[(String, String)],
                       rows: Long, procOrder: Int)

  /** Write a package. `processingOrder` is the reference's per-table
    * `"Processing Order"` (Codeunit 60000:615, 60001:307): the apply
    * sequence — parents before children — persisted in the manifest so
    * a later [[graft.operators.MergeImport.applyPackageOrdered]] replays
    * tables in the order the package author declared, not in whatever
    * order a directory listing yields. Tables absent from the map get
    * their 1-based alphabetical position (a deterministic default). */
  def writePackage(spark: SparkSession, dir: String,
                   tables: Map[String, DataFrame],
                   processingOrder: Map[String, Int] = Map.empty)
      : Seq[TableMeta] = {
    val metas = tables.toSeq.sortBy(_._1).zipWithIndex
      .map { case ((name, df), idx) =>
        df.write.mode("overwrite").parquet(s"$dir/data/$name")
        // re-read for the authoritative count: cheap (parquet footers only)
        val rows = spark.read.parquet(s"$dir/data/$name").count()
        TableMeta(name, df.schema.fields.map(f => f.name -> f.dataType.sql),
          rows, processingOrder.getOrElse(name, idx + 1))
      }.sortBy(m => (m.procOrder, m.name))
    val json = metas.map { m =>
      val cols = m.columns
        .map { case (n, t) => s"""{"name":"$n","type":"$t"}""" }
        .mkString("[", ",", "]")
      s"""{"table":"${m.name}","rows":${m.rows},"proc_order":${m.procOrder},"columns":$cols}"""
    }.mkString("[", ",", "]")
    val conf = spark.sparkContext.hadoopConfiguration
    FsIO.mkdirs(dir, conf)
    FsIO.writeString(s"$dir/_manifest.json", json, conf)
    metas
  }

  def readTable(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/data/$name")

  def manifest(dir: String): String =
    FsIO.readString(s"$dir/_manifest.json", FsIO.sessionConf)

  /** Package tables in ascending processing order (then name), parsed
    * back from the manifest the package was written with — the apply
    * loop's `SETCURRENTKEY(..., "Processing Order")` equivalent.
    *
    * Parsed with a real JSON parser (json4s, shipped with Spark), not a
    * field-order-sensitive regex: a manifest produced by another writer,
    * a reordered field, or an extra field must still round-trip — and a
    * manifest with no readable table entries fails LOUDLY instead of
    * silently applying nothing. */
  def tablesInOrder(dir: String): Seq[(String, Int)] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val path = s"$dir/_manifest.json"
    val parsed = JsonMethods.parseOpt(manifest(dir)).getOrElse(
      throw new IllegalArgumentException(
        s"package manifest at $path is not valid JSON"))
    val entries = parsed match {
      case JArray(items) => items.map {
        case obj: JObject =>
          val fields = obj.obj.toMap
          (fields.get("table"), fields.get("proc_order")) match {
            case (Some(JString(name)), Some(JInt(ord))) => (name, ord.toInt)
            case _ => throw new IllegalArgumentException(
              s"package manifest at $path: entry missing " +
                s""""table"/"proc_order": ${JsonMethods.compact(obj)}""")
          }
        // a non-object entry is corruption, not something to skip — a
        // partially-applied package is the silent failure mode this
        // parser exists to eliminate
        case other => throw new IllegalArgumentException(
          s"package manifest at $path: non-object entry " +
            JsonMethods.compact(other))
      }
      case _ => throw new IllegalArgumentException(
        s"package manifest at $path must be a JSON array of table entries")
    }
    require(entries.nonEmpty,
      s"package manifest at $path lists no tables — nothing to apply")
    entries.sortBy { case (n, o) => (o, n) }
  }
}
