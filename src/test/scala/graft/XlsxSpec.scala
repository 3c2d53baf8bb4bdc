package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{ExportImport, SchemaTools}
import graft.sources.{XlsxIO, XlsxTables}

class XlsxSpec extends SparkSpec {

  test("XlsxIO: mixed types, escaping, and multibyte text survive a write/read cycle") {
    val rows: Seq[Seq[Any]] = Seq(
      Seq(1L, "plain", 3.25, true),
      Seq(2L, "esc &<>\" done", -7.0, false),
      Seq(3L, "mixed 漢字 ünïcode", 0.5, true),
      Seq(4L, null, 125.0, false))
    val bytes = XlsxIO.workbookBytes(Seq(
      XlsxIO.WorkSheet("t", Seq("id", "txt", "x", "flag"), rows.iterator)))
    val got = XlsxIO.readWorkbook(bytes)
    assert(got.map(_._1) == Seq("t"))
    val data = got.head._2
    assert(data.head.toSeq == Seq("id", "txt", "x", "flag"))
    assert(data(1).toSeq == Seq("1", "plain", "3.25", "true"))
    assert(data(2)(1) == "esc &<>\" done")
    assert(data(3)(1) == "mixed 漢字 ünïcode")
    assert(data(4)(1) == null) // null cell skipped, gap preserved
    assert(data(4)(2) == "125.0")
  }

  test("XlsxIO: column letters round-trip past Z") {
    Seq(0 -> "A", 25 -> "Z", 26 -> "AA", 51 -> "AZ", 52 -> "BA",
      701 -> "ZZ", 702 -> "AAA").foreach { case (i, ref) =>
      assert(XlsxIO.colLetters(i) == ref, s"col $i")
      assert(XlsxIO.refToCol(ref + "1") == i, s"ref $ref")
    }
  }

  test("XlsxIO reader: externally-shaped workbook (sharedStrings, r-less cells)") {
    // hand-built minimal workbook the way OTHER producers write them:
    // shared-string cells (t="s") and no r attributes anywhere
    val decl = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos, UTF_8)
    def entry(n: String, c: String): Unit = {
      zip.putNextEntry(new ZipEntry(n)); zip.write(c.getBytes(UTF_8)); zip.closeEntry()
    }
    entry("[Content_Types].xml",
      s"""$decl<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
    entry("_rels/.rels",
      s"""$decl<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    entry("xl/workbook.xml",
      s"""$decl<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="ext" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      s"""$decl<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    entry("xl/sharedStrings.xml",
      s"""$decl<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2"><si><t>name</t></si><si><t>shared hello</t></si></sst>""")
    entry("xl/worksheets/sheet1.xml",
      s"""$decl<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row><c t="s"><v>0</v></c><c t="inlineStr"><is><t>num</t></is></c></row><row><c t="s"><v>1</v></c><c><v>42</v></c></row></sheetData></worksheet>""")
    zip.finish()

    val rows = XlsxIO.readWorkbook(bos.toByteArray)
    assert(rows.map(_._1) == Seq("ext"))
    assert(rows.head._2.map(_.toSeq) ==
      Seq(Seq("name", "num"), Seq("shared hello", "42")))
    // header alignment also works when asking columns in another order
    val aligned = XlsxIO.readSheetAligned(bos.toByteArray,
      Seq("num", "name")).toSeq
    assert(aligned.map(_.toSeq) == Seq(Seq("42", "shared hello")))
  }

  test("xlsx_roundtrip: re-imported aggregate equals source aggregate") {
    val got = ExportImport.xlsxRoundtrip(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    val src = Tables.load(spark, sf, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(graft.operators.Filtering.cents(col("o_totalprice")))
          .as("sum_price_c"),
        date_format(min("o_orderdate"), "yyyy-MM-dd").as("first_day"),
        date_format(max("o_orderdate"), "yyyy-MM-dd").as("last_day"))
      .orderBy("o_orderstatus").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    assert(got.toSeq == src.toSeq)
  }

  test("xlsx part files carry the _package metadata worksheet") {
    ExportImport.xlsxRoundtrip(spark, sf).collect() // ensure exported
    val dir = ExportImport.scratch("xlsx-orders")
    val meta = XlsxTables.readPackageMeta(spark, dir).collect()
    assert(meta.length == 1, meta.mkString(","))
    val m = meta.head
    assert(m.getString(0) == "GRAFT.ORDERS")
    assert(m.getString(1) == "orders")
    assert(m.getInt(2) == 6)
  }

  test("corrupt workbook: loud by default, quarantined-and-reported in permissive mode") {
    import java.nio.file.{Files, Paths}
    ExportImport.xlsxRoundtrip(spark, sf).collect() // fresh clean export
    val dir = ExportImport.scratch("xlsx-orders")
    val schema = StructType(Seq(StructField("o_orderkey", LongType)))
    val cleanCount = XlsxTables.read(spark, dir, schema).count()

    // plant a truncated workbook (a real prefix, so it LOOKS like a zip)
    val good = Files.readAllBytes(Paths.get(s"$dir/part-00000.xlsx"))
    Files.write(Paths.get(s"$dir/zz-truncated.xlsx"), good.take(100))
    try {
      intercept[org.apache.spark.SparkException] {
        XlsxTables.read(spark, dir, schema).count() // default: fail loudly
      }
      val lenient = XlsxTables.read(spark, dir, schema, permissive = true)
      assert(lenient.count() == cleanCount, "corrupt file contributes 0 rows")
      val bad = XlsxTables.corruptFiles(spark, dir).collect()
      assert(bad.length == 1 && bad.head.getString(0).endsWith("zz-truncated.xlsx"),
        s"quarantine must name exactly the corrupt file: ${bad.mkString(",")}")
    } finally Files.deleteIfExists(Paths.get(s"$dir/zz-truncated.xlsx"))
  }

  test("template_export: schema-only workbook parses back to the declared manifest") {
    val rows = SchemaTools.templateExport(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(rows.take(5).toSeq == Seq(
      ("customer", 1, "c_custkey"), ("customer", 2, "c_name"),
      ("customer", 3, "c_nationkey"), ("customer", 4, "c_acctbal"),
      ("customer", 5, "c_mktsegment")))
    assert(rows.count(_._1 == "orders") == 6)
    // every header cell carries its field-type annotation as a REAL
    // cell comment, read back from the workbook's comments parts
    // through the worksheet rels (60001:569/:580 template metadata)
    val cmts = SchemaTools.templateExport(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(3)))
    assert(cmts.forall { case (_, _, c) => c != null && c.startsWith("Type: xsd:") },
      s"every header must be annotated: ${cmts.mkString(",")}")
    assert(cmts.toSeq.contains(("customer", "c_acctbal", "Type: xsd:double")))
    assert(cmts.toSeq.contains(("orders", "o_orderdate", "Type: xsd:dateTime")))
    // the template's data region is genuinely empty: reading the orders
    // sheet as a table yields zero rows
    val dir = ExportImport.scratch("xlsx-template")
    val asTable = XlsxTables.read(spark, dir,
      StructType(Seq(StructField("o_orderkey", LongType))),
      sheetName = Some("orders"))
    assert(asTable.count() == 0)
  }

  test("worksheet names obey Excel rules (31-char cap, forbidden chars) per 60001:758") {
    assert(XlsxIO.sheetName("orders", "42") == "orders")
    assert(XlsxIO.sheetName("a/b:c?d*e[f]g\\h", "1") == "a_b_c_d_e_f_g_h")
    val long = "Customer Ledger Entry Dimension Overflow Caption"
    val capped = XlsxIO.sheetName(long, "379")
    assert(capped.length == 31 && capped.startsWith("379 "))
    assert(XlsxIO.sheetName("", "99") == "99")
    // a hostile table name still round-trips end-to-end
    import spark.implicits._
    val dir = ExportImport.scratch("xlsx-hostile-name")
    XlsxTables.clearDir(dir)
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    XlsxTables.write(df.repartition(1), dir,
      "Really:Long/Caption?That*Needs[Truncation]And Then Some More", "PKG")
    val back = XlsxTables.read(spark, dir,
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "x"), (2L, "y")))
  }

  test("writeSingle: ONE Excel-openable workbook, equal roundtrip, loud 2^20 guard") {
    // the single-file roundtrip aggregate equals the directory form's
    val single = ExportImport.xlsxRoundtripSingle(spark, sf).collect().toSeq
    val dirForm = ExportImport.xlsxRoundtrip(spark, sf).collect().toSeq
    assert(single == dirForm, "single-workbook roundtrip must be lossless")
    // the artifact is exactly one file and parses as a workbook with the
    // data sheet AND the _package metadata sheet (Excel-openable zip)
    val path = ExportImport.scratch("xlsx-orders-single") + "/orders.xlsx"
    val f = new java.io.File(path)
    assert(f.isFile, "deliverable must be a single file")
    val sheets = XlsxIO.readWorkbook(
      java.nio.file.Files.readAllBytes(f.toPath)).map(_._1)
    assert(sheets.contains("orders") && sheets.contains("_package"),
      s"workbook sheets: $sheets")
    val meta = XlsxTables.readPackageMeta(spark, path).collect()
    assert(meta.map(_.getString(0)).toSeq == Seq("GRAFT.ORDERS"))
    // the sheet-row cap fails the job LOUDLY mid-write, never truncates
    import spark.implicits._
    val big = (1 to 50).map(i => (i.toLong, s"row$i")).toDF("k", "v")
    val capped = ExportImport.scratch("xlsx-capped") + "/capped.xlsx"
    val e = intercept[org.apache.spark.SparkException] {
      XlsxTables.writeSingle(big, capped, "t", "PKG", maxRows = 10)
    }
    assert(e.getMessage != null)
    val cause = Option(e.getCause).map(_.toString).getOrElse(e.toString)
    assert(cause.contains("caps at 2^20 rows") || e.toString.contains("caps at 2^20 rows"),
      s"guard must explain the cap: $cause")
  }
}
