package graft.recipe

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal hand-rolled XLSX writer (K4). The container image has no
  * spreadsheet library (POI is absent by design), but .xlsx is just a
  * zip of OOXML parts — this emits exactly the parts Excel/LibreOffice
  * need: content types, relationships, a workbook, one worksheet per
  * sheet, and a styles part carrying the indicator fill colors.
  * Strings are inline (`t="inlineStr"`), so no sharedStrings table.
  *
  * Mirrors the reference's pandas ExcelWriter usage
  * (aggregate.py:792-830): a `summary` sheet with per-variant header
  * blocks + pivot tables (indicator color bands per value column) and a
  * `data` sheet with the full aggregated frame.
  */
object Xlsx {

  /** A single cell: text or number, with an optional style id. */
  sealed trait Cell
  case class Str(s: String) extends Cell
  case class Num(x: Double, style: Int = 0) extends Cell
  case object Blank extends Cell

  case class Sheet(name: String, rows: Seq[Seq[Cell]])

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '&' => "&amp;"
      case '"' => "&quot;"
      case c => c.toString
    }

  /** 0-based column index -> A1-style letters. */
  private[recipe] def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def sheetXml(sheet: Sheet): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n")
    sb.append("<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    for ((row, ri) <- sheet.rows.zipWithIndex if row.nonEmpty) {
      sb.append(s"""<row r="${ri + 1}">""")
      for ((cell, ci) <- row.zipWithIndex) {
        val ref = s"${colRef(ci)}${ri + 1}"
        cell match {
          case Str(s) =>
            sb.append(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(s)}</t></is></c>""")
          case Num(x, style) if !x.isNaN =>
            val st = if (style > 0) s""" s="$style"""" else ""
            sb.append(s"""<c r="$ref"$st><v>$x</v></c>""")
          case Num(_, style) => // NaN -> empty styled cell (white band)
            val st = if (style > 0) s""" s="$style"""" else ""
            sb.append(s"""<c r="$ref"$st/>""")
          case Blank => ()
        }
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  /** styles.xml with one solid fill + cellXf per color ('#rrggbb').
    * Style id for colors(i) is i + 1 (0 = default). */
  private def stylesXml(colors: Seq[String]): String = {
    val fills = colors.map { c =>
      val argb = "FF" + c.stripPrefix("#").toUpperCase
      s"""<fill><patternFill patternType="solid"><fgColor rgb="$argb"/><bgColor rgb="$argb"/></patternFill></fill>"""
    }
    val xfs = colors.indices.map { i =>
      s"""<xf numFmtId="0" fontId="0" fillId="${i + 2}" borderId="0" xfId="0" applyFill="1"/>"""
    }
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="${colors.size + 2}"><fill><patternFill patternType="none"/></fill><fill><patternFill patternType="gray125"/></fill>${fills.mkString}</fills>
<borders count="1"><border><left/><right/><top/><bottom/><diagonal/></border></borders>
<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>
<cellXfs count="${colors.size + 1}"><xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>${xfs.mkString}</cellXfs>
</styleSheet>"""
  }

  /** Write a workbook. `styleColors(i)` backs style id i+1. */
  def write(path: String, sheets: Seq[Sheet], styleColors: Seq[String]): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    try {
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
""" + sheets.indices.map(i =>
          s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
          .mkString("\n") + "\n</Types>")
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>""")
      entry("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
          sheets.zipWithIndex.map { case (s, i) =>
            s"""<sheet name="${xmlEscape(s.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString + "</sheets></workbook>")
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          sheets.indices.map(i =>
            s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""")
            .mkString +
          s"""<Relationship Id="rId${sheets.size + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
          "</Relationships>")
      entry("xl/styles.xml", stylesXml(styleColors))
      for ((s, i) <- sheets.zipWithIndex)
        entry(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(s))
    } finally zos.close()
  }
}
