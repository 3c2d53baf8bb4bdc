package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** DataFrame ↔ .xlsx directory exchange built on [[XlsxIO]].
  *
  * Layout mirrors every other graft sink: a directory of part files, one
  * per partition, written executor-side — `part-00007.xlsx` is a small,
  * complete, Excel-openable workbook. A single workbook cannot be the
  * unit of scale (2^20-row sheet cap, non-splittable zip), so the
  * directory is the dataset, exactly as with csv/parquet.
  *
  * Each part file carries the data worksheet plus a `_package` metadata
  * worksheet (package code, table name, column count) — the analog of
  * the reference's package/table information cells
  * (Codeunit 60001:600 `AddPackageAndTableInformation`).
  */
object XlsxTables {

  /** Export `df` as .xlsx part files under `dir` (executor-parallel).
    * Part files open through the Hadoop FileSystem of `dir`'s scheme
    * with the DRIVER's configuration ([[FsIO.SerializableConf]]), so
    * the directory sink targets HDFS/S3 exactly like the parquet
    * sinks. */
  def write(df: DataFrame, dir: String, table: String,
            packageCode: String): Unit = {
    val names = df.schema.fieldNames.toSeq
    val n = names.length
    val sconf = FsIO.serializable(
      df.sparkSession.sparkContext.hadoopConfiguration)
    // Excel-legal worksheet name (31-char cap, forbidden chars) — the
    // reference's GetExcelWorksheetName contract (Codeunit 60001:758)
    val sheet = XlsxIO.sheetName(table, table.hashCode.abs.toString)
    df.foreachPartition { rows: Iterator[Row] =>
      val pid = TaskContext.getPartitionId()
      val out = FsIO.create(f"$dir/part-$pid%05d.xlsx", sconf.value)
      try XlsxIO.writeWorkbook(out, Seq(
        XlsxIO.WorkSheet(sheet, names,
          rows.map(r => (0 until n).map(r.get))),
        XlsxIO.WorkSheet("_package",
          Seq("package_code", "table_name", "n_cols"),
          Iterator(Seq(packageCode, table, n)))))
      finally out.close()
    }
  }

  /** Single-workbook convenience export: the WHOLE frame into ONE
    * Excel-openable .xlsx file at `path` — the reference's actual
    * headline deliverable (Codeunit 60001:96 `ExportExcel` hands the
    * user one workbook to open). A single worksheet caps at 2^20 rows
    * (header + 1,048,575 data rows); the cap is checked DURING the
    * single-task streaming write and fails LOUDLY mid-job, because a
    * silently truncated export is data loss. The directory form
    * ([[write]]) remains the unit of scale — this is the last-mile
    * artifact for human-sized tables. `maxRows` is parameterized for
    * tests; production callers keep the Excel-limit default. */
  def writeSingle(df: DataFrame, path: String, table: String,
                  packageCode: String,
                  maxRows: Long = (1L << 20) - 1): Unit = {
    val names = df.schema.fieldNames.toSeq
    val n = names.length
    val sheet = XlsxIO.sheetName(table, table.hashCode.abs.toString)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val sconf = FsIO.serializable(conf)
    FsIO.delete(path, conf)
    df.coalesce(1).foreachPartition { rows: Iterator[Row] =>
      var count = 0L
      val guarded = rows.map { r =>
        count += 1
        if (count > maxRows)
          throw new IllegalStateException(
            s"writeSingle: '$table' exceeds $maxRows data rows — one xlsx " +
              "worksheet caps at 2^20 rows; use XlsxTables.write (a " +
              "directory of part workbooks) for datasets of scale")
        (0 until n).map(r.get)
      }
      val out = FsIO.create(path, sconf.value)
      try XlsxIO.writeWorkbook(out, Seq(
        XlsxIO.WorkSheet(sheet, names, guarded),
        XlsxIO.WorkSheet("_package",
          Seq("package_code", "table_name", "n_cols"),
          Iterator(Seq(packageCode, table, n)))))
      finally out.close()
    }
    if (!FsIO.exists(path, conf)) {
      // Distinguish the two ways the file can be missing. An EMPTY
      // frame can schedule no task — deliver a valid header-only
      // workbook. A NON-empty frame whose task ran but whose file is
      // not visible here means the executor does not share the
      // driver's filesystem: failing loudly is the method's contract
      // (a silently empty "successful" export is data loss).
      if (df.isEmpty) {
        val out = FsIO.create(path, conf)
        try XlsxIO.writeWorkbook(out, Seq(
          XlsxIO.WorkSheet(sheet, names, Iterator.empty),
          XlsxIO.WorkSheet("_package",
            Seq("package_code", "table_name", "n_cols"),
            Iterator(Seq(packageCode, table, n)))))
        finally out.close()
      } else
        throw new IllegalStateException(
          s"writeSingle: the task wrote $path on an executor that does " +
            "not share the driver's filesystem — single-workbook export " +
            "needs a shared/local target; use XlsxTables.write (a " +
            "directory sink) on cluster deployments")
    }
  }

  /** Import a directory of .xlsx part files: binaryFile scan →
    * per-partition StAX parse → typed cast against `schema`. Columns
    * align by worksheet header name, so column order in the file does
    * not matter (Codeunit 60001:687 `InitColumnMapping` semantics).
    *
    * `permissive = false` (default): an unparseable workbook fails the
    * job loudly. `permissive = true`: corrupt files contribute zero
    * rows — pair it with [[corruptFiles]], which reports exactly which
    * files were quarantined (no silent drop, per SURVEY §4). */
  def read(spark: SparkSession, dir: String, schema: StructType,
           sheetName: Option[String] = None,
           permissive: Boolean = false): DataFrame = {
    import spark.implicits._
    val names = schema.fieldNames.toSeq
    val parsed = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(dir)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        if (!permissive) XlsxIO.readSheetAligned(bytes, names, sheetName)
        else
          try XlsxIO.readSheetAligned(bytes, names, sheetName)
          catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    parsed.select(names.zipWithIndex.map { case (nm, i) =>
      col("value")(i).cast(schema.fields(i).dataType).as(nm)
    }: _*)
  }

  /** The quarantine report for [[read]]'s permissive mode: one row per
    * workbook that fails to parse (path + error), executor-parallel. */
  def corruptFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        try { XlsxIO.readWorkbook(bytes); None }
        catch {
          case scala.util.control.NonFatal(e) =>
            Some((p, Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
      .toDF("path", "error")
  }

  /** The `_package` metadata rows of every part file (deduped: all parts
    * of one export carry the same package stamp). */
  def readPackageMeta(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir,
      StructType.fromDDL(
        "package_code STRING, table_name STRING, n_cols INT"),
      sheetName = Some("_package"))
      .distinct()

  /** Remove stale part files so re-exports have overwrite semantics.
    * Resolves through the path's Hadoop FileSystem under the session's
    * hadoopConfiguration ([[FsIO.sessionConf]]) so credentialed stores
    * (S3) delete through the same settings the writers use. */
  def clearDir(dir: String): Unit =
    FsIO.clearChildren(dir, FsIO.sessionConf)(_.endsWith(".xlsx"))
}
