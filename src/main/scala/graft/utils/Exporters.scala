package graft.utils

import org.apache.spark.sql.DataFrame

/** Result exporters, mirroring de_polars/utils/exports.py (S8-S11 in
  * SURVEY.md §2.1). Two shapes:
  *  - distributed sinks (parquet/csv writers) for large results;
  *  - driver-side strings (JSON rows / CSV text) for API-sized results —
  *    the reference always collects (its results are post-aggregation and
  *    small); we keep that split explicit so nobody collects a 100 TB scan.
  */
object Exporters {

  /** Distributed snappy-parquet sink (data_partitioner.py:38-52). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "snappy").parquet(path)

  /** Partition-layout parquet sink: `<col>=<value>/` directories matching
    * the CUR export layout (S6's mirrored structure, data_config.py:18-23).
    * Repartitioned on the partition column first so each partition writes
    * one file per shuffle task that holds it — at scale, set
    * `spark.sql.shuffle.partitions` (or add a salt column) to control
    * file counts per partition. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.repartition(org.apache.spark.sql.functions.col(partitionCol))
      .write.mode("overwrite")
      .option("compression", "snappy")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Distributed CSV sink (exports.py:46-68). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Driver-side JSON array string (exports.py:16-44: df.to_dicts →
    * json.dumps). Caller is responsible for having limited the result. */
  def toJsonString(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  /** Driver-side CSV string with header (exports.py:46-68 StringIO path). */
  def toCsvString(df: DataFrame): String = {
    val cols = df.columns
    def cell(v: Any): String = v match {
      case null => ""
      case s: String if s.contains(",") || s.contains("\"") || s.contains("\n") =>
        "\"" + s.replace("\"", "\"\"") + "\""
      case other => other.toString
    }
    val header = cols.mkString(",")
    val rows = df.collect().map(r => cols.indices.map(i => cell(r.get(i))).mkString(","))
    (header +: rows).mkString("\n")
  }

  /** Driver-side Excel (.xlsx) sink (exports.py:70-89, S11). The
    * reference shells out to openpyxl; an xlsx file is just a zip of XML
    * parts, so this writes the OOXML worksheet directly (inline strings,
    * numbers as native cells) with zero dependencies. API-sized results
    * only — same collect contract as the other driver-side exporters. */
  def writeExcel(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit = {
    val cols = df.columns
    val rows = df.collect()
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
    def cellXml(ref: String, v: Any): String = v match {
      case null => ""
      case n: Number => s"""<c r="$ref"><v>$n</v></c>"""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case other => s"""<c r="$ref" t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>"""
    }
    def colRef(i: Int): String = { // 0 -> A, 25 -> Z, 26 -> AA ...
      var n = i; var s = ""
      while (n >= 0) { s = ('A' + n % 26).toChar.toString + s; n = n / 26 - 1 }
      s
    }
    val headerXml = cols.zipWithIndex.map { case (c, i) =>
      cellXml(s"${colRef(i)}1", c)
    }.mkString
    val bodyXml = rows.zipWithIndex.map { case (r, ri) =>
      val cells = cols.indices.map(ci => cellXml(s"${colRef(ci)}${ri + 2}", r.get(ci))).mkString
      s"""<row r="${ri + 2}">$cells</row>"""
    }.mkString
    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData><row r="1">$headerXml</row>$bodyXml</sheetData></worksheet>""".stripMargin
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
         | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin
    val zip = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    try {
      Seq("[Content_Types].xml" -> contentTypes, "_rels/.rels" -> rootRels,
        "xl/workbook.xml" -> workbook, "xl/_rels/workbook.xml.rels" -> workbookRels,
        "xl/worksheets/sheet1.xml" -> sheet).foreach { case (name, content) =>
        zip.putNextEntry(new java.util.zip.ZipEntry(name))
        zip.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        zip.closeEntry()
      }
    } finally zip.close()
  }

  /** Markdown table (exports.py report path). */
  def toMarkdown(df: DataFrame): String = {
    val cols = df.columns
    val header = cols.mkString("| ", " | ", " |")
    val sep = cols.map(_ => "---").mkString("| ", " | ", " |")
    val rows = df.collect().map(r =>
      cols.indices.map(i => Option(r.get(i)).map(_.toString).getOrElse("")).mkString("| ", " | ", " |"))
    (Seq(header, sep) ++ rows).mkString("\n")
  }
}
