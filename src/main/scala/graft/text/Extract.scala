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

  /** PDF text extraction STUB: the container has no PDF renderer (the
    * reference shells out to pdfium, extract.py:71-78). The dispatch and
    * plumbing are real; the decode itself returns "" and is the single
    * point to swap in a pdfbox/pdfium implementation. */
  def pdf(data: Array[Byte]): String = ""

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
