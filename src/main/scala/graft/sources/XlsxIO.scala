package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** Minimal OpenXML (ECMA-376) .xlsx workbook writer/reader on JDK-only
  * APIs (`java.util.zip` + StAX) — no external spreadsheet library.
  *
  * Reference semantics: Codeunit 60001 - Config. Excel Exchange.al:96
  * `ExportExcel` / :326 `ImportExcel` / :369 `ReadWorksheetData` — the
  * extension's headline "Export BLOB to Excel / Import BLOB from Excel"
  * surface (PageExt60000-Page8625.al:8,21). The reference drives the
  * OpenXML SDK row-at-a-time on one workbook; here each executor
  * partition writes/parses its own bounded workbook part-file, which is
  * the shape that scales (a single .xlsx cannot: the format caps a
  * worksheet at 2^20 rows and zips are not splittable).
  *
  * Writer: inline strings (`t="inlineStr"`), numbers (`t="n"`), booleans
  * (`t="b"`); multi-worksheet; proper `r` refs. Reader: streams entries
  * from the zip, then StAX-parses worksheets; handles `inlineStr`,
  * shared strings (`t="s"`, for externally-produced files), `n`, `b`,
  * and `str` cells; aligns columns by header name.
  */
object XlsxIO {

  /** One worksheet: name, header row, data rows (any null cell skipped).
    * Supported cell types: String, Long, Int, Double, Boolean.
    * `headerComments` (optional, aligned with `header`; null/empty =
    * none) become real OpenXML cell comments on the header cells — the
    * reference's template-mode field annotations (Codeunit 60001:569
    * `SetCellComment` + :580 `CreateCommentVmlShapeXml`). */
  case class WorkSheet(name: String, header: Seq[String],
                       rows: Iterator[Seq[Any]],
                       headerComments: Seq[String] = Nil)

  /** Excel worksheet-name rules, per the reference's
    * GetExcelWorksheetName (Codeunit 60001:758): names are capped at 31
    * chars (Excel's hard limit; over-long captions get the table id
    * prefixed before the cut so truncated names stay unique). On top of
    * the cap, the characters Excel forbids (: \ / ? * [ ]) are replaced
    * with '_' and an empty result falls back to the id. */
  def sheetName(caption: String, tableId: String): String = {
    val clean = caption.map {
      case c if ":\\/?*[]".indexOf(c.toInt) >= 0 => '_'
      case c => c
    }
    val capped =
      if (clean.length > 31) (tableId + " " + clean).take(31) else clean
    if (capped.isEmpty) tableId.take(31) else capped
  }

  // ---------------------------------------------------------------- write

  private def xmlEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      case c => b.append(c)
    }
    b.toString
  }

  /** 0-based column index → A1-style letters. */
  private[graft] def colLetters(i: Int): String = {
    var n = i
    val b = new StringBuilder
    while (n >= 0) { b.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    b.toString
  }

  /** A1-style ref → 0-based column index. */
  private[graft] def refToCol(ref: String): Int = {
    var c = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i) - 'A' + 1); i += 1
    }
    c - 1
  }

  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case n @ (_: Long | _: Int | _: Short | _: Byte | _: Double | _: Float) =>
      s"""<c r="$ref" t="n"><v>$n</v></c>"""
    case s =>
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(s.toString)}</t></is></c>"""
  }

  /** Write a complete workbook to `out`. Rows stream through one at a
    * time — nothing is buffered beyond the zip deflater. */
  def writeWorkbook(out: OutputStream, sheets: Seq[WorkSheet]): Unit = {
    val zip = new ZipOutputStream(out, UTF_8)
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(UTF_8))
      zip.closeEntry()
    }
    val decl = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    def hasComments(s: WorkSheet): Boolean =
      s.headerComments.exists(c => c != null && c.nonEmpty)
    val overrides = sheets.zipWithIndex.map { case (s, i) =>
      s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        (if (hasComments(s))
          s"""<Override PartName="/xl/comments${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.comments+xml"/>"""
        else "")
    }.mkString
    val vmlDefault =
      if (sheets.exists(hasComments))
        """<Default Extension="vml" ContentType="application/vnd.openxmlformats-officedocument.vmlDrawing"/>"""
      else ""
    entry("[Content_Types].xml",
      s"""$decl<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/>$vmlDefault<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>$overrides</Types>""")
    entry("_rels/.rels",
      s"""$decl<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    val sheetTags = sheets.zipWithIndex.map { case (s, i) =>
      s"""<sheet name="${xmlEscape(s.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    entry("xl/workbook.xml",
      s"""$decl<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheetTags</sheets></workbook>""")
    val rels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    entry("xl/_rels/workbook.xml.rels",
      s"""$decl<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>""")

    sheets.zipWithIndex.foreach { case (s, i) =>
      val withComments = hasComments(s)
      zip.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${i + 1}.xml"))
      val w = new java.io.OutputStreamWriter(zip, UTF_8)
      w.write(s"""$decl<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheetData>""")
      var rowIdx = 1
      def writeRow(cells: Seq[Any]): Unit = {
        w.write(s"""<row r="$rowIdx">""")
        cells.zipWithIndex.foreach { case (v, c) =>
          w.write(cellXml(s"${colLetters(c)}$rowIdx", v))
        }
        w.write("</row>")
        rowIdx += 1
      }
      writeRow(s.header)
      s.rows.foreach(writeRow)
      w.write("</sheetData>")
      // a commented sheet references its VML note shapes (ECMA-376's
      // legacy-drawing mechanism — the only one Excel renders comments
      // through, hence the reference's CreateCommentVmlShapeXml)
      if (withComments) w.write("""<legacyDrawing r:id="rIdVml"/>""")
      w.write("</worksheet>")
      w.flush()
      zip.closeEntry()

      if (withComments) {
        val commented = s.header.zip(
          s.headerComments.padTo(s.header.length, null: String))
          .zipWithIndex
          .collect { case ((_, c), idx) if c != null && c.nonEmpty =>
            (idx, c)
          }
        // per-sheet rels: the comments part + the VML drawing part
        entry(s"xl/worksheets/_rels/sheet${i + 1}.xml.rels",
          s"""$decl<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rIdCmt" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/comments" Target="../comments${i + 1}.xml"/><Relationship Id="rIdVml" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/vmlDrawing" Target="../drawings/vmlDrawing${i + 1}.vml"/></Relationships>""")
        val commentXml = commented.map { case (idx, c) =>
          s"""<comment ref="${colLetters(idx)}1" authorId="0"><text><r><t xml:space="preserve">${xmlEscape(c)}</t></r></text></comment>"""
        }.mkString
        entry(s"xl/comments${i + 1}.xml",
          s"""$decl<comments xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><authors><author>graft</author></authors><commentList>$commentXml</commentList></comments>""")
        // one hidden note shape per commented cell — the reference's
        // CommentVmlShapeXmlTxt/VmlShapeAnchorTxt layout (Codeunit
        // 60001:33,36): anchor columns (col, col+2), 0-based Row/Column
        // ClientData pointing at the annotated cell
        val shapes = commented.zipWithIndex.map { case ((idx, _), n) =>
          val anchor = s"${idx + 1},15,0,10,${idx + 3},31,8,9"
          s"""<v:shape id="note${i + 1}_${n + 1}" type="#_x0000_t202" style="position:absolute;margin-left:59.25pt;margin-top:1.5pt;width:96pt;height:55.5pt;z-index:1;visibility:hidden" fillcolor="#ffffe1" o:insetmode="auto"><v:fill color2="#ffffe1"/><v:shadow color="black" obscured="t"/><v:path o:connecttype="none"/><v:textbox style="mso-direction-alt:auto"><div style="text-align:left"/></v:textbox><x:ClientData ObjectType="Note"><x:MoveWithCells/><x:SizeWithCells/><x:Anchor>$anchor</x:Anchor><x:AutoFill>False</x:AutoFill><x:Row>0</x:Row><x:Column>$idx</x:Column></x:ClientData></v:shape>"""
        }.mkString
        entry(s"xl/drawings/vmlDrawing${i + 1}.vml",
          s"""<xml xmlns:v="urn:schemas-microsoft-com:vml" xmlns:o="urn:schemas-microsoft-com:office:office" xmlns:x="urn:schemas-microsoft-com:office:excel"><o:shapelayout v:ext="edit"><o:idmap v:ext="edit" data="${i + 1}"/></o:shapelayout><v:shapetype id="_x0000_t202" coordsize="21600,21600" o:spt="202" path="m,l,21600r21600,l21600,xe"><v:stroke joinstyle="miter"/><v:path gradientshapeok="t" o:connecttype="rect"/></v:shapetype>$shapes</xml>""")
      }
    }
    zip.finish()
  }

  /** Convenience: whole workbook as bytes (part files are bounded by
    * the partition that writes them). */
  def workbookBytes(sheets: Seq[WorkSheet]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    writeWorkbook(bos, sheets)
    bos.toByteArray
  }

  // ----------------------------------------------------------------- read

  private def staxFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** All zip entries of a workbook (bytes are already in memory when
    * coming from the `binaryFile` source). */
  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes), UTF_8)
    val out = mutable.Map.empty[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
      zin.closeEntry()
      e = zin.getNextEntry
    }
    out.toMap
  }

  private def collectText(r: XMLStreamReader): String = {
    // positioned ON a start element; gathers all character data until
    // its matching end element
    val b = new StringBuilder
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          b.append(r.getText)
        case _ =>
      }
    }
    b.toString
  }

  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = staxFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
    val out = mutable.ArrayBuffer.empty[String]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT
          && r.getLocalName == "si") out += collectText(r)
    }
    r.close()
    out.toIndexedSeq
  }

  /** Worksheet XML → rows of raw cell strings (null = absent cell). */
  private def parseSheet(bytes: Array[Byte],
                         shared: IndexedSeq[String]): Seq[Array[String]] = {
    val r = staxFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
    val rows = mutable.ArrayBuffer.empty[Array[String]]
    var cells: mutable.ArrayBuffer[(Int, String)] = null
    var nextCol = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" =>
            cells = mutable.ArrayBuffer.empty
            nextCol = 0
          case "c" if cells != null =>
            val ref = Option(r.getAttributeValue(null, "r"))
            val typ = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            val colIdx = ref.map(refToCol).getOrElse(nextCol)
            nextCol = colIdx + 1
            val raw = collectText(r)
            val v = typ match {
              case "s" => shared(raw.trim.toInt)
              case "b" => if (raw.trim == "1") "true" else "false"
              case _ => raw // n, str, inlineStr: the raw text
            }
            cells += ((colIdx, v))
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT
            if r.getLocalName == "row" && cells != null =>
          val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
          val arr = new Array[String](width)
          cells.foreach { case (i, v) => arr(i) = v }
          rows += arr
          cells = null
        case _ =>
      }
    }
    r.close()
    rows.toSeq
  }

  /** Sheet name → rows of raw strings, for every worksheet in the file. */
  def readWorkbook(bytes: Array[Byte]): Seq[(String, Seq[Array[String]])] = {
    val entries = zipEntries(bytes)
    val shared = entries.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)

    // sheet order + names from workbook.xml, rIds resolved via the rels
    val wb = staxFactory.createXMLStreamReader(
      new ByteArrayInputStream(entries("xl/workbook.xml")))
    val sheetsMeta = mutable.ArrayBuffer.empty[(String, String)] // (name, rId)
    while (wb.hasNext) {
      if (wb.next() == XMLStreamConstants.START_ELEMENT
          && wb.getLocalName == "sheet") {
        val name = wb.getAttributeValue(null, "name")
        val rid = (0 until wb.getAttributeCount)
          .find(i => wb.getAttributeLocalName(i) == "id")
          .map(wb.getAttributeValue).getOrElse("")
        sheetsMeta += ((name, rid))
      }
    }
    wb.close()
    val rels = staxFactory.createXMLStreamReader(
      new ByteArrayInputStream(entries("xl/_rels/workbook.xml.rels")))
    val targets = mutable.Map.empty[String, String]
    while (rels.hasNext) {
      if (rels.next() == XMLStreamConstants.START_ELEMENT
          && rels.getLocalName == "Relationship")
        targets(rels.getAttributeValue(null, "Id")) =
          rels.getAttributeValue(null, "Target")
    }
    rels.close()

    sheetsMeta.toSeq.map { case (name, rid) =>
      val target = targets(rid).stripPrefix("/xl/").stripPrefix("./")
      val path = if (target.startsWith("xl/")) target else s"xl/$target"
      name -> parseSheet(entries(path), shared)
    }
  }

  /** Cell comments per sheet: sheetName -> (A1-ref -> comment text).
    * Resolution goes through each worksheet's OWN rels part (never a
    * naming convention), so externally-produced workbooks parse too. */
  def readComments(bytes: Array[Byte]): Map[String, Map[String, String]] = {
    val entries = zipEntries(bytes)
    // sheet name -> worksheet part path (same resolution as readWorkbook)
    val wb = staxFactory.createXMLStreamReader(
      new ByteArrayInputStream(entries("xl/workbook.xml")))
    val sheetsMeta = mutable.ArrayBuffer.empty[(String, String)]
    while (wb.hasNext) {
      if (wb.next() == XMLStreamConstants.START_ELEMENT
          && wb.getLocalName == "sheet") {
        val name = wb.getAttributeValue(null, "name")
        val rid = (0 until wb.getAttributeCount)
          .find(i => wb.getAttributeLocalName(i) == "id")
          .map(wb.getAttributeValue).getOrElse("")
        sheetsMeta += ((name, rid))
      }
    }
    wb.close()
    def relTargets(path: String): Map[String, (String, String)] = {
      entries.get(path).map { b =>
        val r = staxFactory.createXMLStreamReader(new ByteArrayInputStream(b))
        val out = mutable.Map.empty[String, (String, String)]
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT
              && r.getLocalName == "Relationship")
            out(r.getAttributeValue(null, "Id")) =
              (r.getAttributeValue(null, "Type"),
                r.getAttributeValue(null, "Target"))
        }
        r.close()
        out.toMap
      }.getOrElse(Map.empty)
    }
    val wbRels = relTargets("xl/_rels/workbook.xml.rels")
    sheetsMeta.toSeq.flatMap { case (name, rid) =>
      val target = wbRels.get(rid).map(_._2).getOrElse("")
      val sheetPath = {
        val t = target.stripPrefix("/xl/").stripPrefix("./")
        if (t.startsWith("xl/")) t else s"xl/$t"
      }
      val relsPath = {
        val slash = sheetPath.lastIndexOf('/')
        s"${sheetPath.take(slash)}/_rels/${sheetPath.drop(slash + 1)}.rels"
      }
      relTargets(relsPath).values
        .find(_._1.endsWith("/comments")).map(_._2)
        .flatMap { cmtTarget =>
          // targets are relative to the worksheet part's directory
          val norm = cmtTarget.replace("../", "")
          val path = if (norm.startsWith("xl/")) norm else s"xl/$norm"
          entries.get(path)
        }
        .map { cmtBytes =>
          val r = staxFactory.createXMLStreamReader(
            new ByteArrayInputStream(cmtBytes))
          val cmts = mutable.Map.empty[String, String]
          while (r.hasNext) {
            if (r.next() == XMLStreamConstants.START_ELEMENT
                && r.getLocalName == "comment") {
              val ref = r.getAttributeValue(null, "ref")
              cmts(ref) = collectText(r)
            }
          }
          r.close()
          name -> cmts.toMap
        }
    }.toMap
  }

  /** Read one sheet (by name, or the first), aligning columns to
    * `wanted` header names via the sheet's own header row. Rows come
    * back as raw strings in `wanted` order (missing column → null). */
  def readSheetAligned(bytes: Array[Byte], wanted: Seq[String],
                       sheetName: Option[String] = None): Iterator[Array[String]] = {
    val all = readWorkbook(bytes)
    val rows = sheetName match {
      case Some(n) => all.find(_._1 == n)
        .getOrElse(throw new IllegalArgumentException(s"no sheet $n")) ._2
      case None => all.head._2
    }
    if (rows.isEmpty) Iterator.empty
    else {
      val header = rows.head.toSeq
      val idx: Map[String, Int] = header.zipWithIndex
        .collect { case (h, i) if h != null => h -> i }.toMap
      val positions = wanted.map(w => idx.getOrElse(w, -1))
      rows.iterator.drop(1).map { raw =>
        positions.map(p => if (p >= 0 && p < raw.length) raw(p) else null)
          .toArray
      }
    }
  }
}
