package graft.text

import java.text.BreakIterator
import java.util.Locale

import scala.collection.mutable.ArrayBuffer

/** Text chunkers.
  *
  * [[RegexChunker]] is a faithful port of the reference's default ingest
  * segmenter (/root/reference/vechord/chunk.py:20-83): split on separator
  * runs, strip pieces, greedily re-pack into chunks of at most `size`
  * chars (by piece-length sum), carrying at least `overlap` trailing
  * chars of the previous chunk forward, joining pieces with `concat`.
  * Defaults size=1536 / overlap=200 match chunk.py:23-29.
  */
trait Chunker extends Serializable {
  def name: String
  def segment(text: String): Seq[String]
}

final case class RegexChunker(
    size: Int = 1536,
    overlap: Int = 200,
    separator: String = "[\\n\\r\\f\\x0B\\t?!.;]+",
    concat: String = ". ") extends Chunker {

  def name: String = s"regex_chunk_${size}_$overlap"

  /** Trailing pieces whose length sum first reaches `overlap`
    * (chunk.py:38-46). */
  private[text] def keepOverlap(pieces: List[String]): List[String] = {
    var length = 0
    var i = pieces.length - 1
    var found = false
    while (i >= 0 && !found) {
      length += pieces(i).length
      if (length >= overlap) found = true else i -= 1
    }
    pieces.drop(i + 1)
  }

  def segment(text: String): Seq[String] = {
    val chunks = ArrayBuffer[String]()
    var previous = List[String]()
    var current = List[String]()
    var totalLength = 0
    for (raw <- text.split(separator, -1)) {
      val piece = raw.strip()
      if (piece.nonEmpty) {
        if (totalLength + piece.length > size && current.nonEmpty) {
          chunks += (previous ++ current).mkString(concat)
          previous = keepOverlap(current)
          totalLength = previous.map(_.length).sum
          current = Nil
        }
        current = current :+ piece
        totalLength += piece.length
        if (totalLength > size) { // a single piece longer than `size`
          var overlapIndex = 0
          var fits = false
          while (overlapIndex < previous.length && !fits) {
            totalLength -= previous(overlapIndex).length
            if (totalLength <= size) fits = true else overlapIndex += 1
          }
          previous = previous.drop(overlapIndex + 1)
          chunks += (previous ++ current).mkString(concat)
          previous = keepOverlap(current)
          totalLength = previous.map(_.length).sum
          current = Nil
        }
      }
    }
    val remaining = (previous ++ current).mkString(concat)
    if (remaining.nonEmpty) (chunks :+ remaining).toSeq else chunks.toSeq
  }
}

/** Sentence chunker via `BreakIterator` — the JVM-native stand-in for the
  * reference's spaCy sentence segmenter (chunk.py:86-102). */
final case class SentenceChunker(localeTag: String = "en") extends Chunker {
  def name: String = s"sentence_chunk_$localeTag"
  def segment(text: String): Seq[String] = {
    val it = BreakIterator.getSentenceInstance(
      Locale.forLanguageTag(localeTag))
    it.setText(text)
    val out = ArrayBuffer[String]()
    var start = it.first()
    var end = it.next()
    while (end != BreakIterator.DONE) {
      val s = text.substring(start, end).strip()
      if (s.nonEmpty) out += s
      start = end
      end = it.next()
    }
    out.toSeq
  }
}
