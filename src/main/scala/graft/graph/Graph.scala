package graft.graph

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Registry, Txn}
import graft.core.Spec.TableDef
import graft.ops.Ann
import graft.text.{Embed, Embedder}

/** Graph (entity/relation) retrieval — Spark twin of the reference's
  * `graph_insert` merge-upsert (/root/reference/vechord/pipeline.py:345-392)
  * and 2-hop `graph_search` (pipeline.py:444-487), with the
  * entity/relation shapes of model/internal.py:8-31.
  *
  * Deviation (documented): entity uids are `sha256(text)` and relation
  * uids `sha256(sorted(source,target))` instead of fresh UUIDs per merge —
  * stable ids make the merge idempotent and distributed-safe (the
  * reference's delete-then-reinsert-with-new-uuid dance is a row-at-a-time
  * pattern; here the merge is one aggregation + one full-outer join).
  */
final case class GraphEntity(uid: String, text: String, label: String,
                             description: String, chunk_uuids: Seq[String],
                             vec: Seq[Float])
final case class GraphRelation(uid: String, source: String, target: String,
                               description: String, vec: Seq[Float])

/** Recognized (pre-embedding) extraction outputs (model/internal.py:8-31). */
final case class RecognizedEntity(text: String, label: String,
                                  description: String)
final case class RecognizedRelation(source: String, target: String,
                                    description: String)

/** NER + relation extraction seat (graph.py:29-223). [[SimpleRecognizer]]
  * is the deterministic local implementation (capitalized-token entities,
  * adjacent-pair relations) standing in for spaCy/Gemini. */
trait EntityRecognizer extends Serializable {
  def recognize(text: String): (Seq[RecognizedEntity], Seq[RecognizedRelation])
}

final case class SimpleRecognizer() extends EntityRecognizer {
  def recognize(text: String): (Seq[RecognizedEntity],
      Seq[RecognizedRelation]) = {
    val sentences = text.split("[.!?\\n]+").map(_.strip).filter(_.nonEmpty)
    val ents = scala.collection.mutable.LinkedHashMap[String, RecognizedEntity]()
    val rels = scala.collection.mutable.ArrayBuffer[RecognizedRelation]()
    sentences.foreach { s =>
      val caps = s.split("[^A-Za-z0-9]+").filter(t =>
        t.length > 1 && t.head.isUpper)
      caps.foreach(c =>
        if (!ents.contains(c)) ents(c) = RecognizedEntity(c, "ENT", s))
      caps.toSeq.sliding(2).foreach {
        case Seq(a, b) if a != b => rels += RecognizedRelation(a, b, s)
        case _ =>
      }
    }
    (ents.values.toSeq, rels.toSeq)
  }
}

/** Gazetteer NER (the local stand-in the reference's spaCy matcher plays,
  * graph.py:29-141): entities are occurrences of `vocab` terms (deduped
  * per chunk, first-occurrence order), relations are adjacent vocab-term
  * pairs within a sentence. Works on case-free corpora where the
  * capitalization heuristic finds nothing. */
final case class VocabRecognizer(vocab: Seq[String])
    extends EntityRecognizer {
  private val set = vocab.toSet
  // precompiled: String.split(regex) recompiles the Pattern per call,
  // and recognize runs per sentence per chunk
  @transient private lazy val sentRe = java.util.regex.Pattern
    .compile("[.!?\\n]+")
  @transient private lazy val tokRe = java.util.regex.Pattern
    .compile("[^A-Za-z0-9]+")
  def recognize(text: String): (Seq[RecognizedEntity],
      Seq[RecognizedRelation]) = {
    val sentences = sentRe.split(text).map(_.strip).filter(_.nonEmpty)
    val ents = scala.collection.mutable.LinkedHashMap[String, RecognizedEntity]()
    val rels = scala.collection.mutable.ArrayBuffer[RecognizedRelation]()
    sentences.foreach { s =>
      val hits = tokRe.split(s).filter(set.contains)
      hits.foreach(h =>
        if (!ents.contains(h)) ents(h) = RecognizedEntity(h, "TERM", s))
      hits.toSeq.sliding(2).foreach {
        case Seq(a, b) if a != b => rels += RecognizedRelation(a, b, s)
        case _ =>
      }
    }
    (ents.values.toSeq, rels.toSeq)
  }
}

/** Token-pattern relation extraction — the POS-free twin of the
  * reference's 5 spaCy matcher patterns (graph.py:36-94):
  * ENT_VERB_ENT, ENT_PREP_ENT, ENT_POSSESSIVE_ENT, ENT_APPOSITION_ENT,
  * ENT_ATTRIBUTE_ENT.
  *
  * ACCEPTED CONTRACT (not residue): spaCy's statistical tagger is
  * APPROXIMATED by the deterministic token classes below, by design.
  * A faithful trained tagger needs model weights learned from a
  * labeled corpus — a data dependency this zero-dependency engine
  * deliberately excludes (the same reasoning that makes the LLM/OCR
  * seats provider interfaces rather than bundled models). The
  * consequence, stated plainly: on open-domain text the extracted
  * relation SET can differ from the reference's where tagging is
  * genuinely ambiguous (e.g. noun/verb homographs outside the
  * enumerated lists); the five pattern SHAPES, the match semantics,
  * and the source/target selection are exact twins. Deterministic
  * output (no model drift) is part of this contract, and a trained
  * tagger remains a clean swap-in behind `classify`. Recorded in
  * SURVEY §8.
  *
  * spaCy's POS tags are approximated by
  * deterministic token classes: the closed classes (auxiliaries,
  * prepositions, determiners, punctuation, the possessive marker,
  * numbers, pronouns) are enumerated exactly; ENT is the
  * capitalized-token heuristic (∪ `vocab`, like [[VocabRecognizer]]);
  * VERB combines irregular + common-base-form lists with suffix
  * morphology (-ed/-ing/-s, each with noun exception lists — plural
  * derivational nouns like "cities"/"actions" stay NOUN); adverbs
  * (-ly) and derivational adjectives (-ous/-ful/-ive/...) get their
  * own non-NOUN classes so the NOUN-consuming patterns skip them,
  * as spaCy's tagger would.
  *
  * Match semantics mirror graph.py:113-139: for each pattern match
  * span, source = the first ENT token, target = the second (falling
  * back to the span's first/last token, graph.py:129-136), and the
  * relation description is the span's tokens joined by spaces
  * (graph.py:137). One (longest) match per pattern per start token.
  * Entities are the capitalized/vocab tokens per sentence, deduped in
  * first-occurrence order like [[SimpleRecognizer]]. */
final case class PatternRecognizer(vocab: Seq[String] = Nil)
    extends EntityRecognizer {
  import PatternRecognizer._
  private val vocabSet = vocab.toSet

  @transient private lazy val sentRe =
    java.util.regex.Pattern.compile("[.!?\\n]+")
  // tokens: the possessive clitic, words, or single punctuation marks
  @transient private lazy val tokRe =
    java.util.regex.Pattern.compile("'s\\b|[A-Za-z0-9]+|[,;:()\"“”—-]")

  private def classify(t: String): String = {
    val lower = t.toLowerCase(java.util.Locale.ROOT)
    if (t == "'s") "POSS"
    else if (!t.exists(_.isLetterOrDigit)) "PUNCT"
    else if (t.head.isDigit || NumWords(lower)) "NUM"
    else if (vocabSet.contains(t) ||
      (t.length > 1 && t.head.isUpper)) "ENT"
    else if (Aux(lower)) "AUX"
    else if (Adp(lower)) "ADP"
    else if (Det(lower)) "DET"
    else if (Pron(lower)) "PRON"
    else if (Irregular(lower) || BaseVerbs(lower)) "VERB"
    else if (lower.endsWith("ing") && !IngNouns(lower)) "VERB"
    else if (lower.endsWith("ed") && !EdNonVerbs(lower)) "VERB"
    else if (lower.length > 3 && lower.endsWith("s") &&
      !lower.endsWith("ss") && !NounPluralSuffix.exists(lower.endsWith))
      "VERB"
    else if (lower.endsWith("ly") && !LyNonAdverbs(lower)) "ADV"
    else if (AdjSuffix.exists(lower.endsWith)) "ADJ"
    else "NOUN"
  }

  /** Longest span of `pat` starting at `i`, or -1. Backtracking over the
    * tiny optional/repeat elements (patterns are ≤6 elements). */
  private def matchAt(toks: Array[(String, String)], i: Int,
                      pat: List[Elem]): Int = pat match {
    case Nil => i
    case Cls(c) :: rest =>
      if (i < toks.length && toks(i)._2 == c) matchAt(toks, i + 1, rest)
      else -1
    case Plus(c) :: rest =>
      var j = i
      while (j < toks.length && toks(j)._2 == c) j += 1
      // greedy with backoff: longest repeat first
      var e = -1
      while (e < 0 && j > i) { e = matchAt(toks, j, rest); j -= 1 }
      e
    case Star(c) :: rest =>
      var j = i
      while (j < toks.length && toks(j)._2 == c) j += 1
      var e = -1
      while (e < 0 && j >= i) { e = matchAt(toks, j, rest); j -= 1 }
      e
    case OptCls(c) :: rest =>
      val viaOne = if (i < toks.length && toks(i)._2 == c)
        matchAt(toks, i + 1, rest) else -1
      if (viaOne >= 0) viaOne else matchAt(toks, i, rest)
    case OptLit(w) :: rest =>
      val viaOne = if (i < toks.length && toks(i)._1.toLowerCase(java.util.Locale.ROOT) == w)
        matchAt(toks, i + 1, rest) else -1
      if (viaOne >= 0) viaOne else matchAt(toks, i, rest)
  }

  def recognize(text: String): (Seq[RecognizedEntity],
      Seq[RecognizedRelation]) = {
    val sentences = sentRe.split(text).map(_.strip).filter(_.nonEmpty)
    val ents = scala.collection.mutable.LinkedHashMap[String, RecognizedEntity]()
    val rels = scala.collection.mutable.ArrayBuffer[RecognizedRelation]()
    sentences.foreach { s =>
      val m = tokRe.matcher(s)
      val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
      while (m.find()) { val t = m.group(); buf += ((t, classify(t))) }
      val toks = buf.toArray
      toks.foreach { case (t, c) =>
        if (c == "ENT" && !ents.contains(t))
          ents(t) = RecognizedEntity(t, "ENT", s)
      }
      var i = 0
      while (i < toks.length) {
        Patterns.foreach { pat =>
          val end = matchAt(toks, i, pat)
          if (end > i) {
            val span = toks.slice(i, end)
            val entToks = span.collect { case (t, "ENT") => t }
            val source = entToks.headOption.getOrElse(span.head._1)
            val target = if (entToks.length > 1) entToks(1)
              else span.last._1
            rels += RecognizedRelation(source, target,
              span.map(_._1).mkString(" "))
          }
        }
        i += 1
      }
    }
    (ents.values.toSeq, rels.toSeq.distinct)
  }
}

object PatternRecognizer {
  sealed trait Elem
  final case class Cls(c: String) extends Elem
  final case class Plus(c: String) extends Elem
  final case class Star(c: String) extends Elem
  final case class OptCls(c: String) extends Elem
  final case class OptLit(w: String) extends Elem

  /** The 5 reference patterns (graph.py:37-94), POS → token class. */
  val Patterns: List[List[Elem]] = List(
    // ENT_VERB_ENT: {ENT_TYPE}, {POS: VERB, OP: +}, {ENT_TYPE}
    List(Cls("ENT"), Plus("VERB"), Cls("ENT")),
    // ENT_PREP_ENT: {ENT_TYPE}, {AUX *}, {VERB}, {ADP}, {ENT_TYPE}
    List(Cls("ENT"), Star("AUX"), Cls("VERB"), Cls("ADP"), Cls("ENT")),
    // ENT_POSSESSIVE_ENT: {ENT}, {PUNCT ?}, {'s ?}, {NOUN}, {is ?}, {ENT}
    List(Cls("ENT"), OptCls("PUNCT"), OptCls("POSS"), Cls("NOUN"),
      OptLit("is"), Cls("ENT")),
    // ENT_APPOSITION_ENT: {ENT}, {PUNCT ?}, {NOUN +}, {of ?}, {ENT}
    List(Cls("ENT"), OptCls("PUNCT"), Plus("NOUN"), OptLit("of"),
      Cls("ENT")),
    // ENT_ATTRIBUTE_ENT: {ENT}, {PUNCT ?}, {NOUN}, {LIKE_NUM}
    List(Cls("ENT"), OptCls("PUNCT"), Cls("NOUN"), Cls("NUM")))

  val Aux: Set[String] = Set("is", "are", "was", "were", "am", "be",
    "been", "being", "has", "have", "had", "do", "does", "did", "will",
    "would", "shall", "should", "can", "could", "may", "might", "must")
  val Adp: Set[String] = Set("of", "in", "on", "at", "by", "for",
    "with", "from", "to", "into", "onto", "over", "under", "about",
    "after", "before", "between", "through", "during", "against",
    "among", "around", "upon", "near", "within", "without", "across",
    "behind", "beyond", "toward", "towards")
  val Det: Set[String] = Set("the", "a", "an", "this", "that", "these",
    "those", "his", "her", "its", "their", "our", "my", "your", "some",
    "any", "each", "every", "no", "all", "both")
  val NumWords: Set[String] = Set("zero", "one", "two", "three", "four",
    "five", "six", "seven", "eight", "nine", "ten", "eleven", "twelve",
    "hundred", "thousand", "million", "billion", "first", "second",
    "third")
  /** Irregular/suffix-free verbs the -ed/-ing/-s heuristic misses. */
  val Irregular: Set[String] = Set("born", "met", "made", "wrote",
    "won", "ran", "led", "built", "became", "began", "bought", "sold",
    "took", "gave", "went", "saw", "said", "held", "kept", "knew",
    "left", "lost", "paid", "sent", "set", "told", "got", "grew",
    "drove", "chose", "spoke", "wore", "broke", "threw", "taught",
    "caught", "brought", "thought", "stood", "found")
  /** Common base-form verbs (suffix-free present tense: "they run
    * Acme") — without these every uninflected verb fell through to
    * NOUN and the VERB patterns missed plural-subject clauses. */
  val BaseVerbs: Set[String] = Set("go", "make", "take", "come", "see",
    "know", "get", "give", "find", "think", "tell", "become", "show",
    "leave", "feel", "put", "bring", "begin", "keep", "hold", "write",
    "stand", "hear", "let", "mean", "meet", "run", "pay", "sit",
    "speak", "lead", "read", "grow", "lose", "fall", "send", "build",
    "understand", "draw", "break", "spend", "cut", "rise", "drive",
    "buy", "wear", "choose", "seem", "help", "talk", "turn", "start",
    "play", "move", "like", "live", "believe", "happen", "include",
    "continue", "serve", "die", "expect", "stay", "reach", "kill",
    "remain", "suggest", "raise", "pass", "sell", "require", "report",
    "decide", "pull", "return", "explain", "hope", "develop", "carry",
    "drink", "eat", "sleep", "walk", "win", "offer", "remember",
    "love", "consider", "appear", "wait", "cover", "create", "open",
    "change", "watch", "follow", "stop", "need", "want", "use", "work",
    "call", "try", "ask", "add", "learn", "study", "visit", "join",
    "acquire", "found", "establish", "own", "operate", "manage",
    "direct", "produce", "release", "launch", "announce", "employ",
    "hire", "merge")
  /** -ing words that are ordinary nouns, not gerunds/participles. */
  val IngNouns: Set[String] = Set("morning", "evening", "thing",
    "king", "ring", "spring", "string", "wing", "building", "feeling",
    "meeting", "nothing", "something", "anything", "everything",
    "ceiling", "wedding", "clothing")
  /** -ed words where "ed" is not the past-tense suffix (or the word is
    * an adjective spaCy would not tag VERB). */
  val EdNonVerbs: Set[String] = Set("bed", "red", "hundred", "seed",
    "speed", "deed", "indeed", "sacred", "naked", "wicked")
  /** Pluralized derivational-NOUN suffixes: words like "cities",
    * "actions", "movements", "teachers" are confidently plural nouns —
    * without this carve-out the -s rule tagged every plural VERB and
    * the NOUN patterns (apposition, possessive) missed them. */
  val NounPluralSuffix: Seq[String] = Seq("ions", "ments", "nesses",
    "ities", "ers", "ists", "isms", "ances", "ences", "ships", "hoods",
    "ages", "ures", "ogies", "ields")
  /** -ly words that are not adverbs. */
  val LyNonAdverbs: Set[String] = Set("family", "fly", "supply",
    "reply", "butterfly", "assembly", "july", "italy", "monopoly",
    "anomaly", "jelly", "belly", "rally", "ally", "early")
  /** Derivational ADJECTIVE suffixes — classified ADJ (not NOUN) so
    * the NOUN-consuming patterns skip them, matching spaCy's tags. */
  val AdjSuffix: Seq[String] = Seq("ous", "ful", "ive", "able", "ible",
    "ish", "less")
  /** Personal pronouns — PRON (not NOUN), so "Alice , it is Bob" does
    * not fake a possessive-pattern NOUN slot. */
  val Pron: Set[String] = Set("he", "she", "it", "they", "we", "i",
    "you", "him", "them", "us", "me", "who", "whom", "himself",
    "herself", "itself", "themselves")
}

object Graph {

  def entityDef(name: String = "entity"): TableDef[GraphEntity] = {
    implicit val enc: org.apache.spark.sql.Encoder[GraphEntity] =
      Encoders.product[GraphEntity]
    TableDef[GraphEntity](name, primaryKey = Some("uid"))
  }
  def relationDef(name: String = "relation"): TableDef[GraphRelation] = {
    implicit val enc: org.apache.spark.sql.Encoder[GraphRelation] =
      Encoders.product[GraphRelation]
    TableDef[GraphRelation](name, primaryKey = Some("uid"))
  }

  /** Stable entity uid. */
  def entityUid(text: org.apache.spark.sql.Column) = sha2(text, 256)

  /** Merge-insert entities (pipeline.py:345-372): group incoming rows by
    * text (descriptions "\n"-joined in input order, chunk lists
    * concatenated), then full-outer-merge with the stored table — new
    * descriptions come first, like the reference's `ent.description +=
    * "\n" + exist.description`. Embeds `text\ndescription` of every
    * changed entity. One aggregation + one join; no per-row round trips.
    *
    * `incoming`: (text, label, description, chunk_uuids, ord) where ord
    * fixes the merge order inside the batch. */
  def mergeInsertEntities(reg: Registry, entDef: TableDef[GraphEntity],
                          incoming: DataFrame, emb: Embedder,
                          txn: Txn = null): Unit = {
    val grouped = incoming
      .groupBy("text")
      .agg(
        // EARLIEST occurrence's label (ord-min, like the relation
        // merge's orientation pick) — first() is partition-order-
        // dependent, breaking the byte-identical-graph contract when
        // a recognizer emits differing labels for one text
        min(struct(col("ord"), col("label"))).getField("label")
          .as("label"),
        array_join(transform(array_sort(collect_list(
          struct(col("ord"), col("description")))),
          s => s.getField("description")), "\n").as("description"),
        flatten(transform(array_sort(collect_list(
          struct(col("ord"), col("chunk_uuids")))),
          s => s.getField("chunk_uuids"))).as("chunk_uuids"))
    val existing = reg.table(entDef, txn)
      .select(col("text").as("e_text"), col("label").as("e_label"),
        col("description").as("e_description"),
        col("chunk_uuids").as("e_chunk_uuids"),
        col("vec").as("e_vec"))
    val merged = grouped.join(existing,
        col("text") === col("e_text"), "full_outer")
      .select(
        coalesce(col("text"), col("e_text")).as("text"),
        coalesce(col("label"), col("e_label")).as("label"),
        when(col("text").isNull, col("e_description"))
          .when(col("e_text").isNull, col("description"))
          .otherwise(concat_ws("\n", col("description"),
            col("e_description"))).as("description"),
        when(col("text").isNull, col("e_chunk_uuids"))
          .when(col("e_text").isNull, col("chunk_uuids"))
          .otherwise(concat(col("chunk_uuids"), col("e_chunk_uuids")))
          .as("chunk_uuids"),
        col("text").isNotNull.as("__changed"), col("e_vec"))
      .withColumn("uid", entityUid(col("text")))
    // embed ONLY changed entities (incoming side present — new text or
    // merged description); untouched rows keep their stored vector, so
    // a merge batch costs O(batch) embedder calls, not O(table) — the
    // reference likewise re-vectorizes only the entities it touched
    // (pipeline.py:345-372). CaseWhen evaluates the UDF lazily per row.
    val embUdf = udf((s: String) =>
      if (s == null) null else emb.embedChunk(s))
    val embedded = merged
      .withColumn("vec", when(col("__changed"),
          embUdf(concat_ws("\n", col("text"), col("description"))))
        .otherwise(col("e_vec")))
    reg.overwrite(entDef, embedded.select(entDef.columns.map(col): _*), txn)
  }

  /** Merge-insert relations (pipeline.py:373-392): key = the sorted
    * (source, target) pair; descriptions "\n"-joined new-first; embeds
    * the merged description. `incoming`: (source, target, description,
    * ord). */
  def mergeInsertRelations(reg: Registry, relDef: TableDef[GraphRelation],
                           incoming: DataFrame, emb: Embedder,
                           txn: Txn = null): Unit = {
    val keyed = incoming
      .withColumn("__k", concat_ws("|",
        least(col("source"), col("target")),
        greatest(col("source"), col("target"))))
    val grouped = keyed.groupBy("__k")
      .agg(
        // the EARLIEST occurrence's orientation survives (ord-min, like
        // the reference's insertion-order merge) — first() would pick a
        // partition-order-dependent one
        min(struct(col("ord"), col("source"), col("target")))
          .as("__first"),
        array_join(transform(array_sort(collect_list(
          struct(col("ord"), col("description")))),
          s => s.getField("description")), "\n").as("description"))
      .select(col("__k"), col("__first.source").as("source"),
        col("__first.target").as("target"), col("description"))
    val existing = reg.table(relDef, txn)
      .withColumn("__k", concat_ws("|",
        least(col("source"), col("target")),
        greatest(col("source"), col("target"))))
      .select(col("__k").as("e_k"), col("source").as("e_source"),
        col("target").as("e_target"),
        col("description").as("e_description"),
        col("vec").as("e_vec"))
    val merged = grouped.join(existing, col("__k") === col("e_k"),
        "full_outer")
      .select(
        // EXISTING orientation survives a re-occurrence: stored rows
        // are by definition earlier than any incoming batch, so
        // existing-wins extends the within-call ord-min contract
        // across calls — an incrementally merged graph's orientation
        // equals the all-at-once build's, which s17 gates. (The
        // reference's orientation-sensitive lookup would instead
        // DUPLICATE a reversed re-occurrence, pipeline.py:382-392 —
        // the sorted-pair uid here is the documented deviation.)
        coalesce(col("e_source"), col("source")).as("source"),
        coalesce(col("e_target"), col("target")).as("target"),
        when(col("__k").isNull, col("e_description"))
          .when(col("e_k").isNull, col("description"))
          .otherwise(concat_ws("\n", col("description"),
            col("e_description"))).as("description"),
        col("__k").isNotNull.as("__changed"), col("e_vec"))
      .withColumn("uid", sha2(concat_ws("|",
        least(col("source"), col("target")),
        greatest(col("source"), col("target"))), 256))
    // only changed relations re-embed (see mergeInsertEntities)
    val embUdf = udf((s: String) =>
      if (s == null) null else emb.embedChunk(s))
    val embedded = merged.withColumn("vec",
      when(col("__changed"), embUdf(col("description")))
        .otherwise(col("e_vec")))
    reg.overwrite(relDef, embedded.select(relDef.columns.map(col): _*), txn)
  }

  /** 2-hop graph search (pipeline.py:444-487):
    * query → recognize → top-k similar relations (by embedded relation
    * text) → endpoint entity uids (ordered dedup) ∪ recognized entities →
    * top-k similar entities (by embedded entity text) → their chunk uuids
    * (ordered dedup) → chunk rows, limit topk. Returns the chunk-uid
    * DataFrame joined back to `chunks` on `uidCol`. */
  def graphSearch(reg: Registry, query: String,
                  chunks: DataFrame, uidCol: String,
                  entDef: TableDef[GraphEntity],
                  relDef: TableDef[GraphRelation],
                  emb: Embedder, recognizer: EntityRecognizer,
                  similarK: Int = 10, topk: Int = 10): DataFrame =
    graphSearchFromEntities(
      graphSearchEntities(reg, query, entDef, relDef, emb, recognizer,
        similarK),
      chunks, uidCol, topk)

  /** PageRank over the merged entity graph — the global-importance
    * ranking a GraphRAG-style retriever mixes with similarity (which
    * entities anchor the corpus, independent of any query). Nodes are
    * keyed by `idCol` (default the entity UID — the key space the
    * stored relation endpoints use), edges the merged relations in
    * their stored first-occurrence orientation. Fixed `iters` of
    * pr ← (1−d)/N + d·Σ_in pr/outdeg; the simple leaky variant (no
    * dangling-mass redistribution) so any engine replays it as plain
    * joins; intermediate values round to 9 decimals each iteration so
    * cross-engine float drift re-synchronizes instead of compounding,
    * output rounds to `roundTo`.
    *
    * Scale shape: each iteration is ONE equi-join shuffle plus a
    * combinable sum — corpus-linear per iteration, plan-linear in
    * `iters` (checkpoint every ~10 iterations on a long chain to cut
    * lineage; 3 is the retrieval-mixing default here). The outdeg
    * table is edge-keyed and reused across iterations. */
  def pageRank(entities: DataFrame, relations: DataFrame,
               iters: Int = 3, damping: Double = 0.85,
               roundTo: Int = 6, idCol: String = "uid"): DataFrame = {
    val nodes = entities.select(col(idCol).as("__id"), col("text"))
    val n = nodes.count()
    require(n > 0, "pageRank over an empty entity table")
    val edges = relations.select(col("source").as("__s"),
      col("target").as("__t"))
    // A key-space mismatch between edge endpoints and node ids silently
    // degenerates every node to the teleport constant (the stored
    // GraphRelation contract keys source/target by entity UID,
    // extractFromChunks sha2Hex — NOT by text); refuse loudly instead.
    // BOTH endpoint columns are checked: a target-side-only mismatch
    // yields contribs that group by unjoinable keys — same degeneracy.
    if (!relations.isEmpty) {
      require(!edges.join(nodes, col("__s") === col("__id")).isEmpty &&
          !edges.join(nodes, col("__t") === col("__id")).isEmpty,
        s"pageRank: no edge endpoint matches any entity '$idCol' — " +
          "edge endpoints must live in the node id key space")
    }
    val out = edges.groupBy("__s").agg(count(lit(1)).as("__od"))
    var pr = nodes.select(col("__id")).withColumn("pr", lit(1.0 / n))
    (1 to iters).foreach { _ =>
      val contrib = edges
        .join(out, "__s")
        .join(pr.withColumnRenamed("__id", "__s"), "__s")
        .groupBy("__t")
        .agg(sum(col("pr") / col("__od")).as("__in"))
        .withColumnRenamed("__t", "__id")
      // per-round lineage break (the kCorePeel rule): without it the
      // round-r frame's plan contains every earlier round's join
      // chain, and each consumer re-executes the whole unrolled stack
      pr = nodes.select("__id").join(contrib, Seq("__id"), "left")
        .withColumn("pr", round(
          lit((1 - damping) / n) +
            lit(damping) * coalesce(col("__in"), lit(0.0)), 9))
        .select("__id", "pr")
        .localCheckpoint(true)
    }
    nodes.join(pr, "__id")
      .select(col("text"), round(col("pr"), roundTo).as("pr"))
  }

  /** Personalized PageRank: [[pageRank]] with the teleport mass
    * concentrated on `seeds` (uniformly) instead of spread over all
    * nodes — importance RELATIVE to a query's recognized entities,
    * the ranking a GraphRAG retriever actually mixes (g04's global
    * variant answers "what anchors the corpus"; this answers "what
    * anchors THIS question"). pr₀ = teleport; each of `iters` rounds
    * pr ← (1−d)·t + d·Σ_in pr/outdeg, per-iteration round(9), same
    * leaky-dangling semantics and the same key-space guards. Non-seed
    * components drain to 0 — by design, they are unreachable from the
    * question. */
  def personalizedPageRank(entities: DataFrame, relations: DataFrame,
                           seeds: DataFrame, iters: Int = 3,
                           damping: Double = 0.85, roundTo: Int = 6,
                           idCol: String = "uid"): DataFrame = {
    val nodes = entities.select(col(idCol).as("__id"), col("text"))
    val nSeeds = seeds.select(col(idCol).as("__sid")).distinct()
      .join(nodes, col("__sid") === col("__id"), "left_semi")
    val k = nSeeds.count()
    require(k > 0, "personalizedPageRank: no seed matches any entity")
    val tele = nodes.select(col("__id"))
      .join(nSeeds.withColumnRenamed("__sid", "__id"), Seq("__id"),
        "left_semi")
      .withColumn("__t", lit(1.0 / k))
    val edges = relations.select(col("source").as("__s"),
      col("target").as("__t2"))
    if (!relations.isEmpty) {
      require(!edges.join(nodes, col("__s") === col("__id")).isEmpty &&
          !edges.join(nodes, col("__t2") === col("__id")).isEmpty,
        s"personalizedPageRank: no edge endpoint matches any entity " +
          s"'$idCol'")
    }
    val teleAll = nodes.select(col("__id"))
      .join(tele, Seq("__id"), "left")
      .select(col("__id"), coalesce(col("__t"), lit(0.0)).as("__t"))
    val out = edges.groupBy("__s").agg(count(lit(1)).as("__od"))
    var pr = teleAll.withColumn("pr", col("__t")).select("__id", "pr")
    (1 to iters).foreach { _ =>
      val contrib = edges
        .join(out, "__s")
        .join(pr.withColumnRenamed("__id", "__s"), "__s")
        .groupBy("__t2")
        .agg(sum(col("pr") / col("__od")).as("__in"))
        .withColumnRenamed("__t2", "__id")
      // per-round lineage break, like pageRank
      pr = teleAll.join(contrib, Seq("__id"), "left")
        .withColumn("pr", round(
          lit(1 - damping) * col("__t") +
            lit(damping) * coalesce(col("__in"), lit(0.0)), 9))
        .select("__id", "pr")
        .localCheckpoint(true)
    }
    nodes.join(pr, "__id")
      .select(col("text"), round(col("pr"), roundTo).as("pr"))
  }

  /** Synchronous weighted label propagation over the merged entity
    * graph — community structure for GraphRAG corpus mixing (which
    * entity clusters dominate a corpus, and where a retrieval budget
    * should spread). Nodes keyed by `idCol` (default the entity UID —
    * the stored relation endpoint key space, like [[pageRank]]);
    * edges undirected, weighted by merged co-occurrence count (the
    * number of "\n"-joined description lines [[mergeInsertRelations]]
    * accumulated for the pair). label₀ = entity text; each of `iters`
    * synchronous rounds every node adopts its weight-heaviest
    * neighbor label (ties by label asc); isolated nodes keep theirs.
    * Integer-exact — no float drift to re-synchronize across engines.
    *
    * Scale shape: per iteration ONE equi-join of the edge table
    * against the label frame plus a combinable weighted count; the
    * argmax is a per-node window over its distinct neighbor labels
    * (bounded by degree). Synchronous updates can oscillate on
    * bipartite structure — fixed `iters` (not convergence detection)
    * keeps the plan static and the replay exact. */
  def labelPropagation(entities: DataFrame, relations: DataFrame,
                       iters: Int = 3, idCol: String = "uid"): DataFrame = {
    val nodes = entities.select(col(idCol).as("__id"), col("text"))
    val dir = relations.select(col("source").as("__s"),
      col("target").as("__t"),
      size(split(col("description"), "\n")).cast("long").as("__w"))
    // same loud guard as pageRank (both endpoint sides): a key-space
    // mismatch must never silently freeze every node at its own label
    if (!relations.isEmpty) {
      require(!dir.join(nodes, col("__s") === col("__id")).isEmpty &&
          !dir.join(nodes, col("__t") === col("__id")).isEmpty,
        s"labelPropagation: no edge endpoint matches any entity " +
          s"'$idCol' — edge endpoints must live in the node id key space")
    }
    val edges = dir.unionByName(dir.select(col("__t").as("__s"),
      col("__s").as("__t"), col("__w")))
    val w = Window.partitionBy("__t")
      .orderBy(col("__wsum").desc, col("label").asc)
    var lab = nodes.select(col("__id"), col("text").as("label"))
    (1 to iters).foreach { _ =>
      val pick = edges
        .join(lab.withColumnRenamed("__id", "__s"), "__s")
        .groupBy("__t", "label").agg(sum(col("__w")).as("__wsum"))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("__t").as("__id"), col("label").as("__new"))
      // per-round lineage break, like pageRank
      lab = lab.join(pick, Seq("__id"), "left")
        .select(col("__id"),
          coalesce(col("__new"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    nodes.join(lab, "__id")
      .select(col("text"), col("label").as("community"))
  }

  /** Triangle count + local clustering coefficient per entity — the
    * third graph-analytics lens next to [[pageRank]] (importance) and
    * [[labelPropagation]] (membership): cc(v) = 2·tri(v) /
    * (deg(v)·(deg(v)−1)) says how CLIQUE-LIKE a node's neighborhood
    * is — high-cc entities sit in tight co-mention clusters (a topic
    * core), low-cc high-degree ones are bridges. Edges are the
    * undirected distinct relation pairs (self-loops dropped; the
    * stored orientation is irrelevant here). Returns (text, degree,
    * triangles, cc) with cc = 0 for degree < 2 and rounded, so any
    * engine replays it exactly — the counts are integers and the one
    * division is per-node.
    *
    * Scale shape: the DEGREE-ORDERED orientation (each undirected
    * edge directed from its (degree, id)-lower endpoint) bounds every
    * node's out-neighborhood by O(√m) regardless of hub skew, so the
    * wedge join — the only super-linear step — is arboricity-bounded
    * (the node-iterator bound), never a hub-squared blowup: a
    * celebrity entity with 10⁶ mentions contributes wedges only
    * through its ~√m out-edges. Three equi-joins + one combinable
    * count; the triangle SET is orientation-invariant, so a replay
    * may enumerate id-canonically and land on identical counts. */
  def clusteringCoefficients(entities: DataFrame, relations: DataFrame,
                             idCol: String = "uid",
                             roundTo: Int = 6): DataFrame = {
    val nodes = entities.select(col(idCol).as("__id"), col("text"))
    val edges = relations.select(col("source").as("__s"),
      col("target").as("__t"))
    // same loud key-space guard as pageRank/labelPropagation (the g04
    // lesson): text-keyed endpoints must refuse, not count 0 triangles
    if (!relations.isEmpty) {
      require(!edges.join(nodes, col("__s") === col("__id")).isEmpty &&
          !edges.join(nodes, col("__t") === col("__id")).isEmpty,
        s"clusteringCoefficients: no edge endpoint matches any entity " +
          s"'$idCol' — edge endpoints must live in the node id key space")
    }
    // lineage breaks (the kCorePeel rule applied to a DAG instead of
    // a loop): `und` feeds deg AND dir, `dir` feeds e1/e2/closing —
    // without materialization every consuming branch re-executes the
    // distinct + degree joins (and closing shuffles by a different
    // key than e1/e2, so exchange reuse cannot save it); measured 2×
    // on the g07 gate. Both frames are O(m) edge lists.
    val und = edges.filter(col("__s") =!= col("__t"))
      .select(least(col("__s"), col("__t")).as("a"),
        greatest(col("__s"), col("__t")).as("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // direct each edge from its (degree, id)-lower endpoint; carry the
    // head's rank key so the wedge join can order its two heads
    val dir = und
      .join(deg.select(col("node").as("a"), col("degree").as("__da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("__db")), "b")
      .select(
        when(col("__da") < col("__db") ||
            (col("__da") === col("__db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"),
            col("__db").as("dv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"),
            col("__da").as("dv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .localCheckpoint(true)
    val e1 = dir.select(col("u"), col("v"), col("dv"))
    val e2 = dir.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("u"), col("v"), col("w"))
    val closing = dir.select(col("u").as("v"), col("v").as("w"))
    val tri = wedges.join(closing, Seq("v", "w"))
    val trin = tri.select(col("u").as("node"))
      .unionByName(tri.select(col("v").as("node")))
      .unionByName(tri.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(trin, Seq("node"), "left")
      .na.fill(0L, Seq("triangles"))
      .join(nodes.withColumnRenamed("__id", "node"), "node")
      .select(col("text"), col("degree"), col("triangles"),
        when(col("degree") >= 2, round(
          lit(2.0) * col("triangles") /
            (col("degree") * (col("degree") - 1)), roundTo))
          .otherwise(0.0).as("cc"))
  }

  /** Synchronous k-core peel over an undirected edge list — the
    * cohesion lens next to [[clusteringCoefficients]]'s clique-ness:
    * which nodes sit in a subgraph where EVERYONE keeps ≥ k
    * neighbors after the fringe is stripped away. Round r removes
    * every node whose degree in the surviving subgraph is < k
    * (synchronously — all round-r removals see the same round-(r−1)
    * graph), for a FIXED `iters` rounds (static plan, exact replay —
    * the g05 rule: no convergence detection). Returns one row per
    * node that appears in ≥ 1 input edge: (id, peel_round, last_deg)
    * where peel_round is the round that removed the node (1-based)
    * or 0 for survivors, and last_deg is the degree the node showed
    * at the LAST check it participated in (the one that removed it,
    * or the round-`iters` check for survivors) — so the output pins
    * the whole peel trajectory, not just the fixed point.
    *
    * Edges are taken as given (caller dedups/orients): cols
    * (`aCol`, `bCol`), self-loops dropped here. Works on ANY graph —
    * the g08 gate runs it on the near-dup document graph (where
    * peeling separates tight duplicate cores from stragglers; the
    * dense entity graph never peels), reference-basis the same
    * entity-graph family as vechord's graph demo
    * (/root/reference/examples/graph.py).
    *
    * Scale shape: each round is ONE combinable degree count over the
    * surviving edges plus two semi-joins to strip peeled endpoints —
    * no all-pairs step anywhere, survivor frames only shrink.
    * Bounded `iters` keeps the unrolled plan static; at 100 TB each
    * round is a shuffle on node id, and the semi-joins broadcast
    * once the peeled set collapses. */
  def kCorePeel(edges: DataFrame, k: Int, iters: Int = 3,
                aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(k >= 1, s"kCorePeel: k must be >= 1, got $k")
    require(iters >= 1, s"kCorePeel: iters must be >= 1, got $iters")
    var cur = edges.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .filter(col("__a") =!= col("__b"))
    var live = cur.select(col("__a").as("id"))
      .unionByName(cur.select(col("__b").as("id"))).distinct()
    val peeled = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var survivors: DataFrame = null
    (1 to iters).foreach { r =>
      val deg = cur.select(col("__a").as("id"))
        .unionByName(cur.select(col("__b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("__deg"))
      // nodes stripped of their last edge in an earlier round still
      // face the check (degree 0) — the cascade the gate pins.
      // Materialized eagerly: the returned union references every
      // round's peeled frame AND the survivors, and without the
      // lineage break each of those subtrees re-executes the whole
      // join chain of every earlier round (measured 10× at the 16×
      // smoke's 665k-edge graph).
      val checked = live.join(deg, Seq("id"), "left")
        .select(col("id"), coalesce(col("__deg"), lit(0L)).as("__deg"))
        .localCheckpoint(true)
      peeled += checked.filter(col("__deg") < k)
        .select(col("id"), lit(r).as("peel_round"),
          col("__deg").as("last_deg"))
      val surv = checked.filter(col("__deg") >= k)
      if (r == iters)
        survivors = surv.select(col("id"), lit(0).as("peel_round"),
          col("__deg").as("last_deg"))
      live = surv.select("id")
      cur = cur
        .join(live.withColumnRenamed("id", "__a"), Seq("__a"), "left_semi")
        .join(live.withColumnRenamed("id", "__b"), Seq("__b"), "left_semi")
    }
    peeled.foldLeft(survivors)(_ unionByName _)
  }

  /** Hop 2 of [[graphSearch]] given an already-ranked entity frame
    * (from [[graphSearchEntities]], possibly cached by the caller —
    * the entity ranking is the expensive phase and a fixed query's
    * ranking is reusable across result-shaping calls). */
  def graphSearchFromEntities(rankedEntities: DataFrame,
                              chunks: DataFrame, uidCol: String,
                              topk: Int = 10): DataFrame = {
    val spark = chunks.sparkSession
    // re-assert the ranking before the driver-side collect: callers
    // legitimately pass a PERSISTED copy of the ranked frame, and Spark
    // does not guarantee InMemoryRelation scans preserve the original
    // sort (advisor r6) — (dist, uid) is exactly Ann.topK's ordering
    val simEnts = rankedEntities
      .orderBy(col("dist").asc, col("uid").asc)
      .select("chunk_uuids").collect()
    if (simEnts.isEmpty) {
      chunks.limit(0).withColumn("g_rank", lit(0))
    } else {
      val chunkUids = dedupOrdered(simEnts.iterator
        .flatMap(_.getSeq[String](0)))
      import spark.implicits._
      val keys = chunkUids.zipWithIndex.toDF("__uid", "__ord")
      chunks.join(broadcast(keys), chunks(uidCol) === col("__uid"))
        .orderBy(col("__ord").asc)
        .limit(topk)
        .withColumn("g_rank", col("__ord") + 1)
        .drop("__uid", "__ord")
    }
  }

  /** The first 1.5 hops of [[graphSearch]], exposed as a frame: query →
    * recognize → top-`similarK` similar relations → endpoint entities
    * (rank-ordered dedup) ∪ recognized entities → the SECOND similarity
    * ranking over entities. Returns the ranked entity rows (uid, text,
    * chunk_uuids, dist) — [[graphSearch]] flattens their chunk lists;
    * declared separately (g03) so the merge/embedding phases are gated
    * at full sensitivity. Empty when the recognizer finds nothing. */
  def graphSearchEntities(reg: Registry, query: String,
                          entDef: TableDef[GraphEntity],
                          relDef: TableDef[GraphRelation],
                          emb: Embedder, recognizer: EntityRecognizer,
                          similarK: Int = 10): DataFrame = {
    val (qEnts, qRels) = recognizer.recognize(query)
    var entTexts: Seq[(String, String)] = qEnts.map(e => (e.text, e.description))
    if (qRels.nonEmpty) {
      val relText = qRels.map(_.description).mkString(" ")
      val simRels = Ann.topK(reg.table(relDef), "uid", "vec",
          Embed.queryVec(emb, relText), Ann.Cosine, similarK)
        .select("source", "target").collect()
      val entUids = dedupOrdered(simRels.iterator.flatMap(r =>
        Iterator(r.getString(0), r.getString(1))))
      if (entUids.nonEmpty) {
        // deterministic fetch order: the entUids rank (the reference
        // iterates uids in relation-rank order) — a bare collect() of
        // the filtered scan would surface rows in partition order
        val rankOf = entUids.zipWithIndex.toMap
        val fetched = reg.table(entDef)
          .filter(col("uid").isin(entUids: _*))
          .select("uid", "text", "description").collect()
          .sortBy(r => rankOf(r.getString(0)))
          .map(r => (r.getString(1), r.getString(2))).toSeq
        entTexts = entTexts ++ fetched
      }
    }
    if (entTexts.isEmpty)
      reg.table(entDef).limit(0).withColumn("dist", lit(0.0))
    else {
      val entText = entTexts.map { case (t, d) => s"$t $d" }.mkString(" ")
      Ann.topK(reg.table(entDef), "uid", "vec",
        Embed.queryVec(emb, entText), Ann.Cosine, similarK)
    }
  }

  /** Order-preserving dedup (pipeline.py:490-493). */
  def dedupOrdered(it: Iterator[String]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    it.foreach(seen += _)
    seen.toSeq
  }

  /** Build (entities, relations) input frames from recognizer output over
    * a chunk frame: runs `recognizer` on every chunk (map-only), linking
    * each entity to its chunk uid. Returns (entities, relations) with the
    * `ord` columns [[mergeInsertEntities]] expects. */
  def extractFromChunks(spark: SparkSession, chunks: DataFrame,
                        uidCol: String, textCol: String,
                        recognizer: EntityRecognizer):
      (DataFrame, DataFrame) = {
    import spark.implicits._
    val rows = chunks.select(col(uidCol).cast("string"), col(textCol))
      .as[(String, String)]
    // recognize ONCE per chunk: entities and relations come out of the
    // same pass into a persisted tagged frame, then split by tag —
    // without this the (potentially expensive) recognizer runs twice.
    // ord is DATA-derived ((chunk uid, within-chunk index) as a sortable
    // string), not monotonically_increasing_id: the merge's description
    // join order must not depend on partitioning/parallelism — the same
    // corpus must build byte-identical graphs at any cluster size.
    val both = rows.flatMap { case (uid, text) =>
      val (es, rs) = recognizer.recognize(text)
      (es.iterator.map(e =>
        ("e", e.text, e.label, e.description, Seq(uid))) ++
        rs.iterator.map(r =>
          ("r", sha2Hex(r.source), sha2Hex(r.target), r.description,
            Seq.empty[String])))
        .zipWithIndex.map { case ((k, c1, c2, d, cu), i) =>
          // shortlex uid component (length-prefixed): plain "$uid#$i"
          // sorts "10" before "2", so with variable-length uids the
          // lexicographic merge order would diverge from true emission
          // order (advisor r6). 3-digit length covers any sane uid.
          (k, c1, c2, d, cu, f"${uid.length}%03d$uid%s#$i%06d")
        }
    }.toDF("kind", "c1", "c2", "description", "chunk_uuids", "ord")
      .persist()
    val ents = both.filter(col("kind") === "e")
      .select(col("c1").as("text"), col("c2").as("label"),
        col("description"), col("chunk_uuids"), col("ord"))
    val rels = both.filter(col("kind") === "r")
      .select(col("c1").as("source"), col("c2").as("target"),
        col("description"), col("ord"))
    (ents, rels)
  }

  private def sha2Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Driver-side [[entityUid]] twin (same lowercase-hex SHA-256) — for
    * building seed uid lists from known entity texts. */
  def entityUidScala(text: String): String = sha2Hex(text)
}
