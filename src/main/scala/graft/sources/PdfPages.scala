package graft.sources

import java.util.zip.Inflater

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** PDF → per-page text (reference app/main.py:19-27: pypdf
  * `PdfReader(path).pages[i].extract_text()` feeding the page-window
  * stage).
  *
  * This is a dependency-free extractor for well-formed "simple" PDFs —
  * classic cross-reference tables, uncompressed or FlateDecode content
  * streams (`java.util.zip.Inflater` is in the JDK) — which covers
  * text-first PDFs produced by common generators. Out of scope, by
  * documented contract: encrypted files, xref/object streams
  * (PDF 1.5+ compressed object tables), non-Flate filters, and glyph
  * programs (a page whose content uses them extracts as empty text, the
  * same degrade-to-empty stance pypdf takes on unextractable content).
  *
  * Extraction walks the real document structure — trailer-less scan of
  * `N 0 obj … endobj` bodies, catalog → /Pages tree → /Kids recursion
  * for PAGE ORDER (object numbering is not page order), /Contents
  * ref-or-array per page — then tokenizes the content stream and emits
  * text-show operators (`Tj`, `'`, `"`, `TJ` elements, literal and hex
  * strings with full escape handling), inserting newlines at line-move
  * operators (`Td TD T* '`).
  *
  * Spark shape: `binaryFile` scan (bytes never parsed on the driver) →
  * `mapPartitions` parse → one row per page, ready for the
  * q_window_pages stage. Per-file work is independent — partition-
  * parallel at any corpus size.
  */
object PdfPages {

  /** One extracted page (the reference's `(file, page, text)` lineage). */
  final case class Page(source_file: String, page_index: Int, text: String)

  // ------------------------------------------------------------ file parse

  /** Extract all pages of one PDF, in page-tree order. */
  def extract(fileName: String, bytes: Array[Byte]): Seq[Page] = {
    // latin-1 view: 1 char == 1 byte, so string offsets are byte offsets
    val s = new String(bytes, "ISO-8859-1")
    val objs = parseObjects(s)
    val rootPagesRef = findCatalogPagesRef(objs).orElse(
      // damaged/absent catalog: fall back to the lowest-numbered /Pages
      // node — sort first; Map iteration order is not deterministic
      objs.toSeq.sortBy(_._1).collectFirst { case (n, o)
        if dictType(o.dict) == Some("Pages") => n })
    val pageOrder: Seq[Int] = rootPagesRef match {
      case Some(root) => collectKids(root, objs, Set.empty)
      case None => objs.toSeq.sortBy(_._1).collect {
        case (n, o) if dictType(o.dict) == Some("Page") => n
      }
    }
    pageOrder.zipWithIndex.map { case (objNum, idx) =>
      val text = objs.get(objNum).map(pageText(_, objs)).getOrElse("")
      Page(fileName, idx, text)
    }
  }

  private final case class Obj(dict: String, stream: Option[Array[Byte]])

  private val ObjStart = java.util.regex.Pattern.compile("""(\d+)\s+\d+\s+obj""")

  /** Scan `N G obj … endobj` bodies; split each into dict part + raw
    * stream bytes (between `stream\r?\n` and `endstream`). Single
    * forward pass via Matcher.find(from) — no per-object substring of
    * the remaining file (quadratic on many-object PDFs).
    */
  // direct-integer /Length only (indirect "N 0 R" lengths fall back to
  // the textual scan)
  private val DirectLength =
    java.util.regex.Pattern.compile("""/Length\s+(\d+)(?!\s+\d+\s+R)""")

  private def parseObjects(s: String): Map[Int, Obj] = {
    val out = Map.newBuilder[Int, Obj]
    val m = ObjStart.matcher(s)
    var from = 0
    while (from < s.length) {
      if (!m.find(from)) from = s.length
      else {
        val num = m.group(1).toInt
        val bodyStart = m.end
        val idxEndobj = s.indexOf("endobj", bodyStart)
        val idxStream = s.indexOf("stream", bodyStart)
        if (idxStream >= 0 && (idxEndobj < 0 || idxStream < idxEndobj)) {
          val dict = s.substring(bodyStart, idxStream)
          var dataStart = idxStream + "stream".length
          if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
          val lm = DirectLength.matcher(dict)
          val dataEnd =
            if (lm.find()) {
              // authoritative byte count: immune to 'endstream'/'endobj'
              // sequences or EOL-looking bytes inside the compressed data
              math.min(s.length, dataStart + lm.group(1).toInt)
            } else {
              // no direct /Length: textual fallback, minus one trailing EOL
              val e = s.indexOf("endstream", dataStart)
              val stop = if (e < 0) s.length else e
              var d = stop
              if (d > dataStart && s.charAt(d - 1) == '\n') d -= 1
              if (d > dataStart && s.charAt(d - 1) == '\r') d -= 1
              d
            }
          out += num -> Obj(dict,
            Some(s.substring(dataStart, math.max(dataStart, dataEnd)).getBytes("ISO-8859-1")))
          val afterStream = s.indexOf("endstream", dataEnd)
          val tail = s.indexOf("endobj", if (afterStream < 0) dataEnd else afterStream)
          from = if (tail < 0) s.length else tail + "endobj".length
        } else {
          val bodyEnd = if (idxEndobj < 0) s.length else idxEndobj
          out += num -> Obj(s.substring(bodyStart, bodyEnd), None)
          from = if (idxEndobj < 0) s.length else idxEndobj + "endobj".length
        }
      }
    }
    out.result()
  }

  private def dictType(dict: String): Option[String] =
    """/Type\s*/(\w+)""".r.findFirstMatchIn(dict).map(_.group(1))

  private def findCatalogPagesRef(objs: Map[Int, Obj]): Option[Int] =
    objs.values.find(o => dictType(o.dict) == Some("Catalog")).flatMap(o =>
      """/Pages\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(o.dict).map(_.group(1).toInt))

  /** Depth-first /Kids walk — leaf /Page objects in display order. */
  private def collectKids(num: Int, objs: Map[Int, Obj], seen: Set[Int]): Seq[Int] = {
    if (seen(num)) return Nil // defensive: cyclic page tree
    objs.get(num) match {
      case None => Nil
      case Some(o) => dictType(o.dict) match {
        case Some("Page") => Seq(num)
        case _ =>
          val kids = """/Kids\s*\[([^\]]*)\]""".r.findFirstMatchIn(o.dict)
            .map(_.group(1)).getOrElse("")
          """(\d+)\s+\d+\s+R""".r.findAllMatchIn(kids).map(_.group(1).toInt).toSeq
            .flatMap(collectKids(_, objs, seen + num))
      }
    }
  }

  /** Resolve /Contents (single ref or ref array), decode, extract. */
  private def pageText(page: Obj, objs: Map[Int, Obj]): String = {
    val contents = """/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)""".r
      .findFirstMatchIn(page.dict).map(_.group(1)).getOrElse("")
    val refs = """(\d+)\s+\d+\s+R""".r.findAllMatchIn(contents).map(_.group(1).toInt)
    val data = refs.flatMap(objs.get).flatMap(o => o.stream.map(decode(o.dict, _)))
      .foldLeft(Array.emptyByteArray)(_ ++ _)
    extractText(new String(data, "ISO-8859-1"))
  }

  private def decode(dict: String, raw: Array[Byte]): Array[Byte] =
    if (dict.contains("/FlateDecode")) inflate(raw)
    else if (dict.contains("/Filter")) Array.emptyByteArray // unsupported filter
    else raw

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray // truncated
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch { case _: java.util.zip.DataFormatException => Array.emptyByteArray }
    finally inf.end()
  }

  // --------------------------------------------------- content-stream text

  /** Tokenize a content stream; emit shown strings in order, newline at
    * line-move operators. Handles literal strings (nested parens, all
    * escapes, octal), hex strings, and TJ arrays (kerning numbers
    * skipped).
    */
  private[sources] def extractText(cs: String): String = {
    val out = new StringBuilder
    var pending: List[String] = Nil // strings since last operator token
    // layout newlines (Td/TD/T*/'/BT/ET) are LAZY: materialized only
    // when further text is actually shown — so they separate text runs
    // without ever trailing the page or shadowing a shown "\n"
    var needNl = false
    def show(): Unit = {
      if (needNl && out.nonEmpty) out += '\n'
      needNl = false
      pending.reverse.foreach(out ++= _)
      pending = Nil
    }
    var i = 0
    while (i < cs.length) {
      cs.charAt(i) match {
        case '(' =>
          val (str, next) = literalString(cs, i)
          pending ::= str; i = next
        case '<' if i + 1 < cs.length && cs.charAt(i + 1) != '<' =>
          val (str, next) = hexString(cs, i)
          pending ::= str; i = next
        case '<' => i += 2 // dict open
        case '%' => // comment to end of line
          while (i < cs.length && cs.charAt(i) != '\n') i += 1
        case c if c.isWhitespace || c == '[' || c == ']' || c == '/' ||
          c == '>' || c == '+' || c == '-' || c == '.' || c.isDigit =>
          // names/numbers/array markers — not operators; skip token
          if (c == '/') { i += 1; while (i < cs.length && !delim(cs.charAt(i))) i += 1 }
          else i += 1
        case _ =>
          val start = i
          while (i < cs.length && !delim(cs.charAt(i))) i += 1
          cs.substring(start, i) match {
            case "Tj" | "TJ" => show()
            case "'" | "\"" => needNl = true; show()
            case "Td" | "TD" | "T*" | "BT" | "ET" => needNl = true; pending = Nil
            case _ => pending = Nil // any other operator consumes operands
          }
      }
    }
    out.result()
  }

  private def delim(c: Char): Boolean =
    c.isWhitespace || "()<>[]{}/%".indexOf(c) >= 0

  /** `(...)` literal with nesting and escapes; returns (text, nextIndex). */
  private def literalString(cs: String, open: Int): (String, Int) = {
    val b = new StringBuilder
    var depth = 1
    var i = open + 1
    while (i < cs.length && depth > 0) {
      cs.charAt(i) match {
        case '\\' if i + 1 < cs.length =>
          cs.charAt(i + 1) match {
            case 'n' => b += '\n'; i += 2
            case 'r' => b += '\r'; i += 2
            case 't' => b += '\t'; i += 2
            case 'b' => b += '\b'; i += 2
            case 'f' => b += '\f'; i += 2
            case '(' => b += '('; i += 2
            case ')' => b += ')'; i += 2
            case '\\' => b += '\\'; i += 2
            case '\n' => i += 2 // line continuation
            case '\r' => i += 2; if (i < cs.length && cs.charAt(i) == '\n') i += 1
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0
              while (j < cs.length && j < i + 4 && cs.charAt(j) >= '0' && cs.charAt(j) <= '7') {
                v = v * 8 + (cs.charAt(j) - '0'); j += 1
              }
              b += v.toChar; i = j
            case other => b += other; i += 2
          }
        case '(' => depth += 1; b += '('; i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) b += ')'
          i += 1
        case c => b += c; i += 1
      }
    }
    (b.result(), i)
  }

  /** `<48656C6C6F>` hex string; odd final digit padded with 0. */
  private def hexString(cs: String, open: Int): (String, Int) = {
    val close = cs.indexOf('>', open + 1)
    val end = if (close < 0) cs.length else close
    val hex = cs.substring(open + 1, end).filterNot(_.isWhitespace)
    val padded = if (hex.length % 2 == 0) hex else hex + "0"
    val b = new StringBuilder
    var i = 0
    while (i + 1 < padded.length + 1 && i + 2 <= padded.length) {
      b += Integer.parseInt(padded.substring(i, i + 2), 16).toChar
      i += 2
    }
    (b.result(), if (close < 0) cs.length else close + 1)
  }

  // ----------------------------------------------------------- synthesizer

  /** Fixture generator: one well-formed PDF with `pageTexts` as its
    * pages, each page a single escaped literal string shown by one `Tj`
    * — so [[extract]] round-trips every page text EXACTLY. Used by the
    * graded round-trip query (oracle = the source table) and specs; not
    * part of the ingestion surface (the reference only reads PDFs).
    * Text must be latin-1 representable (PDF literal strings are bytes).
    */
  def synthesize(pageTexts: Seq[String]): Array[Byte] = {
    def esc(t: String): String = t.flatMap {
      case '\\' => "\\\\"
      case '('  => "\\("
      case ')'  => "\\)"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c    => c.toString
    }
    val b = new StringBuilder
    b ++= "%PDF-1.4\n"
    b ++= "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
    val n = pageTexts.length
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    b ++= s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n"
    pageTexts.zipWithIndex.foreach { case (t, i) =>
      val pageNum = 3 + 2 * i
      val contNum = pageNum + 1
      val cs = s"BT (${esc(t)}) Tj ET"
      b ++= s"$pageNum 0 obj << /Type /Page /Parent 2 0 R /Contents $contNum 0 R >> endobj\n"
      b ++= s"$contNum 0 obj << /Length ${cs.length} >> stream\n$cs\nendstream endobj\n"
    }
    b ++= "trailer << /Root 1 0 R >>\n%%EOF\n"
    b.result().getBytes("ISO-8859-1")
  }

  // ------------------------------------------------------------ spark shape

  /** Directory of PDFs → one row per page: binaryFile scan, executor-side
    * parse, `(source_file, page_index, text)` — the exact input shape the
    * reference's page-window stage consumes.
    */
  def pages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").option("pathGlobFilter", "*.pdf").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        extract(path.split('/').last, bytes)
      })
      .toDF()
  }
}
