package graft.text

import java.nio.charset.StandardCharsets
import java.text.Normalizer

/** Document extraction — port of the reference's SimpleExtractor
  * (/root/reference/vechord/extract.py:18-88): extension dispatch
  * (.txt/.pdf/.html), script/style-skipping HTML text extraction, and
  * NFKC normalization of every result (extract.py:52-62).
  */
object Extract {

  /** NFKC unicode normalization (extract.py:62). */
  def nfkc(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFKC)

  private val ScriptStyle =
    "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>".r
  private val Comment = "(?s)<!--.*?-->".r
  private val Tag = "(?s)<[^>]*>".r
  private val Entities = Map(
    "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")

  private def decodeEntities(s: String): String =
    Entities.foldLeft(s) { case (acc, (k, v)) => acc.replace(k, v) }

  /** HTML → text: drop script/style subtrees and comments, strip tags,
    * keep each text node stripped, join non-empty nodes with "\n"
    * (extract.py:18-36,80-88 semantics). */
  def html(text: String): String = {
    val noScript = ScriptStyle.replaceAllIn(text, "")
    val noComment = Comment.replaceAllIn(noScript, "")
    Tag.split(noComment).iterator
      .map(t => decodeEntities(t).strip())
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  /** PDF text extraction — minimal pure-JVM implementation of the seat
    * the reference fills with pdfium (extract.py:71-78). Handles the
    * common simple-PDF class: literal and FlateDecode-compressed content
    * streams, text shown via Tj / ' / " / TJ with literal `(...)`
    * (escape + octal) and hex `<...>` strings, single-byte encodings.
    * Out of scope (returns whatever text IS recoverable): CID/Type0
    * composite fonts, encrypted PDFs, image-only pages — the full
    * renderer remains a swap-in point, but simple generated PDFs now
    * extract real text. Per-stream texts join with "\n" like the
    * reference's per-page join. */
  def pdf(data: Array[Byte]): String = {
    // latin-1 maps bytes 1:1 to chars, so string indices == byte offsets
    val raw = new String(data, StandardCharsets.ISO_8859_1)
    if (!raw.startsWith("%PDF")) return ""
    val out = new StringBuilder
    var from = 0
    var i = raw.indexOf("stream", from)
    while (i >= 0) {
      if (i >= 3 && raw.regionMatches(i - 3, "end", 0, 3)) {
        from = i + 6 // the "stream" inside an "endstream" keyword
      } else {
      val end = raw.indexOf("endstream", i)
      if (end < 0) { from = raw.length }
      else {
        // dict = text between the owning `obj` and `stream`
        val objAt = raw.lastIndexOf(" obj", i)
        val dict = raw.substring(math.max(0, objAt), i)
        var body = raw.substring(
          i + 6 + (if (raw.startsWith("\r\n", i + 6)) 2
                   else if (raw.startsWith("\n", i + 6)) 1 else 0), end)
        val isImage = dict.contains("/Image")
        val flate = dict.contains("/FlateDecode")
        val plain = !dict.contains("/Filter")
        if (!isImage && (flate || plain)) {
          if (flate) body = inflate(
            body.getBytes(StandardCharsets.ISO_8859_1))
          if (body.nonEmpty) {
            val t = contentText(body)
            if (t.nonEmpty) {
              if (out.nonEmpty) out.append('\n')
              out.append(t)
            }
          }
        }
        from = end + 9
      }
      }
      i = raw.indexOf("stream", from)
    }
    out.toString.strip
  }

  private def inflate(bytes: Array[Byte]): String =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(bytes)
      val buf = new Array[Byte](8192)
      val acc = new java.io.ByteArrayOutputStream()
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return "" // truncated/dict-needed
        acc.write(buf, 0, n)
      }
      inf.end()
      new String(acc.toByteArray, StandardCharsets.ISO_8859_1)
    } catch { case _: java.util.zip.DataFormatException => "" }

  /** Text-showing operators of a decoded content stream: strings are
    * buffered as parsed and emitted when a Tj / ' / " / TJ operator
    * consumes them; Td / TD / T* / ET line moves emit "\n". */
  private def contentText(content: String): String = {
    val out = new StringBuilder
    val pending = new StringBuilder
    var i = 0
    val n = content.length
    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out.append('\n')
    while (i < n) {
      content(i) match {
        case '(' =>
          // literal string: balanced parens, backslash escapes, octal
          var depth = 1; i += 1
          while (i < n && depth > 0) {
            content(i) match {
              case '\\' if i + 1 < n =>
                content(i + 1) match {
                  case 'n' => pending.append('\n'); i += 2
                  case 'r' => pending.append('\r'); i += 2
                  case 't' => pending.append('\t'); i += 2
                  case 'b' => pending.append('\b'); i += 2
                  case 'f' => pending.append('\f'); i += 2
                  case '(' => pending.append('('); i += 2
                  case ')' => pending.append(')'); i += 2
                  case '\\' => pending.append('\\'); i += 2
                  case '\n' => i += 2 // line continuation
                  case d if d >= '0' && d <= '7' =>
                    var v = 0; var k = 0; i += 1
                    while (k < 3 && i < n && content(i) >= '0' &&
                      content(i) <= '7') {
                      v = v * 8 + (content(i) - '0'); i += 1; k += 1
                    }
                    pending.append(v.toChar)
                  case c => pending.append(c); i += 2
                }
              case '(' => depth += 1; pending.append('('); i += 1
              case ')' =>
                depth -= 1
                if (depth > 0) pending.append(')')
                i += 1
              case c => pending.append(c); i += 1
            }
          }
        case '<' if i + 1 < n && content(i + 1) != '<' =>
          // hex string
          val close = content.indexOf('>', i)
          if (close < 0) i = n
          else {
            val hex = content.substring(i + 1, close)
              .filter(c => Character.digit(c, 16) >= 0)
            val padded = if (hex.length % 2 == 1) hex + "0" else hex
            padded.grouped(2).foreach(h =>
              pending.append(Integer.parseInt(h, 16).toChar))
            i = close + 1
          }
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          val start = i
          while (i < n && !content(i).isWhitespace &&
            !"()<>[]/%".contains(content(i))) i += 1
          content.substring(start, i) match {
            case "Tj" | "'" | "\"" | "TJ" =>
              out.append(pending); pending.clear()
            case "Td" | "TD" | "T*" | "ET" =>
              pending.clear(); newline()
            case _ => pending.clear()
          }
        case '%' => // comment to end of line
          while (i < n && content(i) != '\n') i += 1
        case _ => i += 1
      }
    }
    out.toString.strip
  }

  /** Extension dispatch + NFKC (extract.py:52-62); unknown extensions
    * yield "" (reference logs a warning and does the same). */
  def extract(ext: String, data: Array[Byte]): String = {
    val text = ext.toLowerCase match {
      case ".txt" | "txt" => new String(data, StandardCharsets.UTF_8)
      case ".pdf" | "pdf" => pdf(data)
      case ".html" | "html" =>
        html(new String(data, StandardCharsets.UTF_8))
      case _ => ""
    }
    nfkc(text)
  }
}

/** External-extraction provider seat (extract.py:103-169: Gemini OCR on
  * PDFs/images, LlamaParse document parsing). HTTP implementations are
  * interface parity only (zero egress); [[StubOcrExtractor]] is the
  * deterministic local implementation for pipeline tests. */
trait ExtractorProvider extends Serializable {
  def name: String
  def extractPdf(data: Array[Byte]): String
  def extractImage(data: Array[Byte]): String
}

/** Deterministic OCR stand-in: derives stable text from the payload
  * digest so pipelines built on the seat are testable end-to-end. */
final case class StubOcrExtractor() extends ExtractorProvider {
  def name: String = "stub_ocr"
  private def tag(kind: String, data: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(data).take(4).map("%02x".format(_)).mkString
    s"$kind $hex ${data.length} bytes"
  }
  def extractPdf(data: Array[Byte]): String = tag("pdf", data)
  def extractImage(data: Array[Byte]): String = tag("image", data)
}

/** Upload→poll completion harness — the LlamaParse polling loop
  * (/root/reference/vechord/provider.py:240-254: 30-minute deadline,
  * 5-second interval) with injectable clock/sleep so the deadline path
  * is unit-testable without waiting. */
final class Poller(deadlineMs: Long = 30L * 60 * 1000,
                   intervalMs: Long = 5000L,
                   now: () => Long = () => System.currentTimeMillis(),
                   sleep: Long => Unit = Thread.sleep) {
  /** Calls `check` until it yields a value or the deadline passes. */
  def await[T](check: () => Option[T]): T = {
    val start = now()
    var result = check()
    while (result.isEmpty) {
      if (now() - start >= deadlineMs)
        throw new java.util.concurrent.TimeoutException(
          s"poll deadline ${deadlineMs}ms exceeded")
      sleep(intervalMs)
      result = check()
    }
    result.get
  }
}
