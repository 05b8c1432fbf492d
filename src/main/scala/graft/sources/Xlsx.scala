package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.io.{ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.parsers.DocumentBuilderFactory
import scala.collection.mutable

/** Minimal, dependency-free XLSX source/sink (S2 scan + O1 multi-sheet
  * sink in SURVEY.md §2.1 — the reference's native formats,
  * app.py:88 / outputs.py:9-20). An .xlsx file is a zip of XML parts;
  * this reads sheet1 + sharedStrings via the JDK's DOM parser and
  * writes workbooks with inline strings — no POI, works offline.
  *
  * Scope: string/number cells, first row = header, all columns read
  * as strings (cast downstream). Workbook files are driver-side by
  * nature (one small file, like the reference's uploads) — the
  * DataFrame is parallelized after parsing; large-data paths should
  * use Parquet/CSV. */
object Xlsx {

  private val ColRef = "([A-Z]+)([0-9]+)".r

  private def colIndex(ref: String): Int = ref match {
    case ColRef(letters, _) =>
      letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
    case _ => 0
  }

  /** Read the first worksheet into a DataFrame of string columns. */
  def read(spark: SparkSession, path: String): DataFrame =
    readImpl(spark, path, typed = false)

  /** Read the first worksheet with pandas-style dtype inference
    * (app.py:88 reads via pandas): a column whose data cells are all
    * numeric becomes LongType (all integral) or DoubleType, everything
    * else stays StringType. Inference looks at the cell TYPE in the
    * workbook (shared/inline strings stay strings even when they look
    * numeric, exactly like pandas' object dtype). */
  def readTyped(spark: SparkSession, path: String): DataFrame =
    readImpl(spark, path, typed = true)

  private def readImpl(spark: SparkSession, path: String, typed: Boolean): DataFrame = {
    val parts = mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new FileInputStream(path))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == "xl/sharedStrings.xml" ||
          e.getName.matches("xl/worksheets/sheet1\\.xml")) {
          val bos = new ByteArrayOutputStream()
          zin.transferTo(bos)
          parts(e.getName) = bos.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()

    // XXE/entity-expansion hardening: workbook XML is untrusted user
    // input — no doctypes, no external entities, no xinclude.
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setFeature("http://xml.org/sax/features/external-general-entities", false)
    dbf.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    dbf.setXIncludeAware(false)
    dbf.setExpandEntityReferences(false)
    dbf.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
    def parse(bytes: Array[Byte]) =
      dbf.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(bytes))

    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml").map { b =>
      val doc = parse(b)
      val sis = doc.getElementsByTagName("si")
      (0 until sis.getLength).map { i =>
        val ts = sis.item(i).asInstanceOf[org.w3c.dom.Element].getElementsByTagName("t")
        (0 until ts.getLength).map(j => ts.item(j).getTextContent).mkString
      }
    }.getOrElse(IndexedSeq.empty)

    val sheet = parse(parts.getOrElse("xl/worksheets/sheet1.xml",
      throw new IllegalArgumentException(s"no sheet1 in $path")))
    val rowNodes = sheet.getElementsByTagName("row")
    // cell -> (column index, raw value, cell-typed-as-number)
    val rows: Seq[Seq[(Int, String, Boolean)]] = (0 until rowNodes.getLength).map { i =>
      val cells = rowNodes.item(i).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("c")
      (0 until cells.getLength).flatMap { j =>
        val c = cells.item(j).asInstanceOf[org.w3c.dom.Element]
        val rAttr = c.getAttribute("r")
        // dense writers (ours) omit cell refs -> positional fallback
        val idx = if (rAttr.isEmpty) j else colIndex(rAttr)
        val t = c.getAttribute("t")
        val vNodes = c.getElementsByTagName("v")
        val value: Option[(String, Boolean)] =
          if (t == "inlineStr") {
            val ts = c.getElementsByTagName("t")
            if (ts.getLength > 0) Some((ts.item(0).getTextContent, false)) else None
          } else if (vNodes.getLength > 0) {
            val raw = vNodes.item(0).getTextContent
            if (t == "s") Some((shared(raw.toInt), false))
            // no type attr / t="n" = a number cell in OOXML
            else Some((raw, t.isEmpty || t == "n"))
          } else None
        value.map { case (v, num) => (idx, v, num) }
      }
    }

    val header = rows.headOption.getOrElse(Seq.empty).sortBy(_._1)
    val nCols = (rows.map(r => r.map(_._1).maxOption.getOrElse(-1)).maxOption.getOrElse(-1)) + 1
    val names = (0 until nCols).map { i =>
      header.find(_._1 == i).map(_._2).getOrElse(s"_c$i")
    }
    val body = rows.drop(1)

    def cellMap(r: Seq[(Int, String, Boolean)]): Map[Int, (String, Boolean)] =
      r.map { case (i, v, n) => i -> (v, n) }.toMap

    // pandas-style per-column dtype: all data cells numeric -> Long if
    // every value is integral, else Double; anything else -> String.
    val colTypes: IndexedSeq[org.apache.spark.sql.types.DataType] =
      (0 until nCols).map { i =>
        if (!typed) StringType
        else {
          val vals = body.flatMap(r => cellMap(r).get(i))
          if (vals.isEmpty || vals.exists(!_._2)) StringType
          else if (vals.forall(v => scala.util.Try(v._1.toLong).isSuccess))
            org.apache.spark.sql.types.LongType
          else org.apache.spark.sql.types.DoubleType
        }
      }

    val data = body.map { r =>
      val m = cellMap(r)
      Row.fromSeq((0 until nCols).map { i =>
        m.get(i).map { case (v, _) =>
          colTypes(i) match {
            case org.apache.spark.sql.types.LongType => v.toLong
            case org.apache.spark.sql.types.DoubleType => v.toDouble
            case _ => v
          }
        }.orNull
      })
    }
    val schema = StructType(names.zip(colTypes).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** xlsx's own hard per-sheet row limit (2^20); also our driver-OOM
    * guard — a frame bigger than this cannot be a report and must
    * fail loudly instead of silently building a corrupt workbook or
    * exhausting driver memory. */
  val MaxSheetRows: Long = 1048576L

  /** Write a multi-sheet workbook (sheet name -> DataFrame), inline
    * strings, header row first — the reference's report layout
    * (outputs.py:44-48). Driver-side sink for bounded REPORTS (the
    * reference builds its workbooks in memory too), but hardened for
    * misuse: rows stream through `toLocalIterator` (one partition
    * resident at a time, bytes flushed straight to the zip stream —
    * never the whole frame or the whole sheet XML in driver memory),
    * and a sheet exceeding [[MaxSheetRows]] (the xlsx format's own
    * 2^20 ceiling, header included) aborts with an error naming the
    * sheet rather than OOMing or truncating. */
  def write(sheets: Seq[(String, DataFrame)], path: String): Unit =
    write(sheets, path, MaxSheetRows)

  /** `maxRows` is package-visible so the over-cap path is testable
    * without materializing 2^20 rows. */
  private[sources] def write(sheets: Seq[(String, DataFrame)], path: String,
      maxRows: Long): Unit = {
    val zout = new ZipOutputStream(new FileOutputStream(path))
    try writeTo(zout, sheets, maxRows) finally zout.close()
  }

  private def writeTo(zout: ZipOutputStream,
      sheets: Seq[(String, DataFrame)], maxRows: Long): Unit = {
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    val n = sheets.size
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
          .mkString + "</Types>")
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>")
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString + "</sheets></workbook>")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
          .mkString + "</Relationships>")
    sheets.zipWithIndex.foreach { case ((name, df), si) =>
      zout.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${si + 1}.xml"))
      def emit(s: String): Unit = zout.write(s.getBytes("UTF-8"))
      emit("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      emit("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      val header = df.columns
      def rowXml(values: Seq[Any]): String =
        "<row>" + values.map {
          case null => "<c t=\"inlineStr\"><is><t></t></is></c>"
          case d: Double => s"<c><v>$d</v></c>"
          case l: Long => s"<c><v>$l</v></c>"
          case i: Int => s"<c><v>$i</v></c>"
          case v => s"<c t=\"inlineStr\"><is><t>${xmlEscape(v.toString)}</t></is></c>"
        }.mkString + "</row>"
      emit(rowXml(header.toSeq))
      var rows = 1L // header occupies a sheet row
      val it = df.toLocalIterator()
      while (it.hasNext) {
        rows += 1
        if (rows > maxRows)
          throw new IllegalArgumentException(
            s"xlsx sheet '$name' exceeds the format's $maxRows-row " +
              "limit (header included); xlsx is a bounded-report sink — " +
              "write large frames to parquet instead")
        emit(rowXml(it.next().toSeq))
      }
      emit("</sheetData></worksheet>")
      zout.closeEntry()
    }
  }
}
