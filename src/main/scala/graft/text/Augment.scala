package graft.text

/** Augmenters — the reference's contextual-retrieval stages
  * (/root/reference/vechord/augment.py:43-93: per-chunk situating
  * context given the whole document, synthetic query per chunk, document
  * summary) and the evaluator's query producer (evaluate.py:93-119).
  *
  * The reference backs these with Gemini; here they are a trait with a
  * deterministic local implementation (usable in tests and offline
  * pipelines) — an HTTP-LLM implementation would slot in behind the same
  * trait via a rate-limited mapPartitions stage.
  */
trait Augmenter extends Serializable {
  def name: String
  /** Context situating `chunk` within `doc` (augment.py:43-66). */
  def augmentContext(doc: String, chunk: String): String
  /** A search query a user might issue to find `chunk` (augment.py:68-80). */
  def augmentQuery(chunk: String): String
  /** Document summary (augment.py:82-93). */
  def summarizeDoc(doc: String): String
}

/** Deterministic local augmenter: context = the doc's lead sentence +
  * the chunk's position cue; query = the chunk's rarest-looking (longest)
  * tokens; summary = lead sentence truncated. */
final case class LocalAugmenter(maxLen: Int = 160) extends Augmenter {
  def name: String = "local_augment"

  private def lead(doc: String): String =
    doc.split("[.!?\\n]+").map(_.strip).find(_.nonEmpty).getOrElse("")

  def augmentContext(doc: String, chunk: String): String = {
    val l = lead(doc)
    val pos = doc.indexOf(chunk.take(24)) match {
      case i if i < 0 => "body"
      case 0 => "opening"
      case i if i > doc.length / 2 => "latter half"
      case _ => "first half"
    }
    s"From a document beginning \"${l.take(maxLen)}\" (${pos})."
  }

  def augmentQuery(chunk: String): String =
    chunk.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.length > 3)
      .distinct.sortBy(t => (-t.length, t)).take(5).mkString(" ")

  def summarizeDoc(doc: String): String = lead(doc).take(maxLen)
}
