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
