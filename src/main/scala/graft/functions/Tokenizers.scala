package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenizer registry — the `create_tokenizer` / per-column model choice
  * twin (/root/reference/vechord/client.py:130-144, spec.py:265,276-278:
  * models `bert_base_uncased` and `wiki_tocken`).
  *
  * Each tokenizer has a column form (codegen'd, used in index builds)
  * and a Scala form (used for query strings on the driver); the two are
  * behavior-identical by construction and tested as such.
  */
object Tokenizers {

  final case class Tokenizer(name: String,
                             column: Column => Column,
                             scala: String => Seq[String])
    extends Serializable

  /** Lowercase alnum-run tokens (the engine default). */
  val Simple: Tokenizer = Tokenizer(
    "simple",
    c => filter(split(lower(c), "[^a-z0-9]+"), t => t =!= ""),
    s => s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)

  /** WordPiece-ish subwords: alnum runs cut into <= 4-char pieces,
    * digits standalone (the `bert_base_uncased` seat). */
  val Wordpiece: Tokenizer = Tokenizer(
    "bert_base_uncased",
    c => regexp_extract_all(lower(c), lit("[a-z]{1,4}|[0-9]"), lit(0)),
    s => "[a-z]{1,4}|[0-9]".r.findAllIn(s.toLowerCase).toSeq)

  /** Whitespace words with punctuation trimmed, case kept (the
    * `wiki_tocken` seat). */
  val Wiki: Tokenizer = Tokenizer(
    "wiki_tocken",
    c => filter(transform(split(c, "\\s+"),
      t => regexp_replace(t, "^\\p{Punct}+|\\p{Punct}+$", "")),
      t => t =!= ""),
    s => s.split("\\s+").map(_.replaceAll("^\\p{Punct}+|\\p{Punct}+$", ""))
      .filter(_.nonEmpty).toSeq)

  val all: Map[String, Tokenizer] =
    Seq(Simple, Wordpiece, Wiki).map(t => t.name -> t).toMap

  def byName(model: String): Tokenizer =
    all.getOrElse(model,
      throw new IllegalArgumentException(s"unknown tokenizer: $model"))
}
