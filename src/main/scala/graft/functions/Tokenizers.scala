package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenizer registry — the `create_tokenizer` / per-column model choice
  * twin (/root/reference/vechord/client.py:130-144, spec.py:265,276-278:
  * models `bert_base_uncased` and `wiki_tocken`).
  *
  * Each tokenizer has a column form (used in index builds) and a Scala
  * form (used for query strings on the driver); the two are
  * behavior-identical by construction and tested as such.
  *
  * The registry is MUTABLE: [[wordpiece]] builds a real trained-vocab
  * WordPiece tokenizer at runtime and registers it under its model name,
  * replacing the vocab-less seat — the Spark twin of the reference
  * registering a trained tokenizer in PG. The vocab is data, not code:
  * it loads from a caller-supplied file/word list, exactly like the POS
  * lexicon contract (SURVEY §8).
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
    s => if (s == null) Seq.empty
      else s.toLowerCase(java.util.Locale.ROOT)
        .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)

  /** WordPiece SEAT: alnum runs cut into <= 4-char pieces, digits
    * standalone — the deterministic no-vocab fallback for
    * `bert_base_uncased`. Register a real vocab with [[wordpiece]] /
    * [[wordpieceFromFile]] to replace it. */
  val Wordpiece: Tokenizer = Tokenizer(
    "bert_base_uncased",
    c => regexp_extract_all(lower(c), lit("[a-z]{1,4}|[0-9]"), lit(0)),
    s => if (s == null) Seq.empty
      else "[a-z]{1,4}|[0-9]".r
        .findAllIn(s.toLowerCase(java.util.Locale.ROOT)).toSeq)

  /** Whitespace words with punctuation trimmed, case kept (the
    * `wiki_tocken` seat). */
  val Wiki: Tokenizer = Tokenizer(
    "wiki_tocken",
    c => filter(transform(split(c, "\\s+"),
      t => regexp_replace(t, "^\\p{Punct}+|\\p{Punct}+$", "")),
      t => t =!= ""),
    s => s.split("\\s+").map(_.replaceAll("^\\p{Punct}+|\\p{Punct}+$", ""))
      .filter(_.nonEmpty).toSeq)

  private val registered =
    scala.collection.concurrent.TrieMap[String, Tokenizer](
      Seq(Simple, Wordpiece, Wiki).map(t => t.name -> t): _*)

  /** Install (or replace) a tokenizer under its model name.
    *
    * DRIVER-side registry: a registered tokenizer's own functions are
    * serializable (the vocab rides along in the task binary, which
    * Spark broadcasts once per executor), but resolution BY NAME from
    * executor-side code (e.g. a brute-force-evaluated
    * [[org.apache.spark.sql.graft.Bm25Score]]) sees each executor
    * JVM's own registry — on a real cluster, run the same `register`
    * in an executor-side initializer for those paths. Every operator
    * path (build / search / searchBatch) resolves on the driver. */
  def register(t: Tokenizer): Unit = registered(t.name) = t

  def all: Map[String, Tokenizer] = registered.readOnlySnapshot().toMap

  def byName(model: String): Tokenizer =
    registered.getOrElse(model,
      throw new IllegalArgumentException(s"unknown tokenizer: $model"))

  // --------------------------------------------------------------------
  // Real WordPiece (greedy longest-match over a trained vocab) — the
  // algorithm behind the reference's `bert_base_uncased` PG tokenizer.
  // --------------------------------------------------------------------

  /** BERT basic-tokenizer punctuation: the ASCII punct ranges plus
    * Unicode category P* (so `$`, `^` etc. count as punctuation even
    * though Unicode classes them as symbols). */
  private def isPunct(ch: Char): Boolean = {
    val cp = ch.toInt
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
    (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126) || {
      val t = Character.getType(ch)
      t == Character.CONNECTOR_PUNCTUATION ||
      t == Character.DASH_PUNCTUATION ||
      t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
      t == Character.INITIAL_QUOTE_PUNCTUATION ||
      t == Character.FINAL_QUOTE_PUNCTUATION ||
      t == Character.OTHER_PUNCTUATION
    }
  }

  /** BERT basic tokenization (uncased): lowercase, strip accents (NFD,
    * drop combining marks), words split on whitespace, every
    * punctuation character its own token. */
  def basicTokens(s: String): Seq[String] = {
    val lowered = java.text.Normalizer.normalize(
      s.toLowerCase(java.util.Locale.ROOT),
      java.text.Normalizer.Form.NFD)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    def flush(): Unit =
      if (cur.length > 0) { out += cur.toString; cur.setLength(0) }
    var i = 0
    while (i < lowered.length) {
      val ch = lowered.charAt(i)
      if (Character.getType(ch) == Character.NON_SPACING_MARK) ()
      else if (Character.isWhitespace(ch)) flush()
      else if (isPunct(ch)) { flush(); out += ch.toString }
      else cur.append(ch)
      i += 1
    }
    flush()
    out.toSeq
  }

  /** Greedy longest-match WordPiece of ONE basic token: repeatedly take
    * the longest vocab piece matching at the cursor (pieces after the
    * first carry the `##` continuation prefix); a position with no
    * matching piece makes the whole word `unk`. */
  def wordpiecePieces(vocab: Set[String], word: String,
                      unk: String = "[UNK]",
                      maxChars: Int = 100): Seq[String] = {
    if (word.length > maxChars) return Seq(unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var piece: String = null
      while (end > start && piece == null) {
        val sub = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab.contains(sub)) piece = sub else end -= 1
      }
      if (piece == null) return Seq(unk)
      out += piece
      start = end
    }
    out.toSeq
  }

  /** Full WordPiece tokenization: basic tokens, each greedily split
    * into vocab pieces. */
  def wordpieceScala(vocab: Set[String], s: String,
                     unk: String = "[UNK]"): Seq[String] =
    basicTokens(s).flatMap(w => wordpiecePieces(vocab, w, unk))

  /** Build AND register a real WordPiece tokenizer from a vocab word
    * list (one piece per entry, `##`-prefixed continuations — the
    * layout of a BERT `vocab.txt`). The column form is a UDF capturing
    * the vocab set: Spark ships it once per executor inside the
    * broadcast task binary, so a 30k-piece vocab costs one ~300 KB
    * transfer, not a per-row or per-task one. */
  def wordpiece(vocab: Seq[String],
                name: String = "bert_base_uncased",
                unk: String = "[UNK]"): Tokenizer = {
    val set = vocab.toSet
    val t = Tokenizer(
      name,
      c => udf((s: String) =>
        if (s == null) Seq.empty[String] else wordpieceScala(set, s, unk))
        .apply(c),
      s => if (s == null) Seq.empty[String] else wordpieceScala(set, s, unk))
    register(t)
    t
  }

  /** Distributed BPE TRAINER (Sennrich-style): learn `merges` merge
    * rules from a corpus. The corpus collapses ONCE to a word-frequency
    * table (the classic trainer trick — every later round is
    * vocabulary-linear, never corpus-linear: the 100 TB cost is one
    * tokenizing scan, then `merges` small jobs over distinct words);
    * each round counts adjacent symbol pairs weighted by word
    * frequency, picks the argmax with the DETERMINISTIC tie-break
    * (count desc, lhs asc, rhs asc — the reference implementation uses
    * dict insertion order, which no engine can replay), and fuses the
    * winning pair in every word via sentinel-space string replace
    * (`' x y '` → `' xy '` on space-joined symbols). Deviations
    * (documented): no end-of-word marker, and merge application is ONE
    * non-overlapping leftmost `replace` pass — on chained self-merges
    * (`aaaa` under (a,a)) the shared boundary space makes it merge
    * fewer occurrences than canonical BPE. Both Spark and SQL
    * `replace` share those exact semantics, which is what makes every
    * round oracle-replayable; pair COUNTING stays positional
    * (overlapping), like the canonical counter.
    *
    * Returns the learned table (rank, lhs, rhs, cnt), rank 1-based in
    * merge order. Rounds stop early if no pair remains. */
  def trainBpe(docs: org.apache.spark.sql.DataFrame, textCol: String,
               merges: Int): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(merges >= 1, "trainBpe needs merges >= 1")
    var words = applyBpe(docs
        .select(explode(graft.ops.Bm25.tokenize(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("f")),
        "w", Nil)
      .select(col("s"), col("f"))
      .persist()
    words.count()
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= merges && !done) {
      val best = words
        .select(col("f"), split(trim(col("s")), " ").as("sym"))
        .select(col("f"), explode(expr(
          "transform(slice(sym, 1, size(sym) - 1), " +
            "(x, i) -> struct(x AS a, element_at(sym, i + 2) AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("lhs"), col("p.b").as("rhs"))
        .agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        learned += ((rank, l, r, c))
        val next = words
          .withColumn("s", expr(s"replace(s, ' $l $r ', ' $l$r ')"))
          .persist()
        next.count()
        words.unpersist(false)
        words = next
        rank += 1
      }
    }
    words.unpersist(false)
    learned.toSeq.toDF("rank", "lhs", "rhs", "cnt")
  }

  /** Apply learned [[trainBpe]] merges to a word column: adds `s`, the
    * sentinel-space symbol string after every merge is fused in rank
    * order (the same single-pass `replace` semantics the trainer used
    * — train and apply MUST share them or encodings drift from the
    * learned statistics). Callers explode `split(trim(s), ' ')` for
    * the subword tokens. Pure column math: `merges` sequential
    * replaces inside one projection, no UDF. */
  def applyBpe(words: org.apache.spark.sql.DataFrame, wordCol: String,
               merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    val base = words.withColumn("s", concat(lit(" "),
      concat_ws(" ", filter(split(col(wordCol), ""), c => c =!= lit(""))),
      lit(" ")))
    merges.foldLeft(base) { case (df, (l, r)) =>
      df.withColumn("s", expr(s"replace(s, ' $l $r ', ' $l$r ')"))
    }
  }

  /** A REGISTERED tokenizer from learned [[trainBpe]] merges: basic
    * lowercase-alnum words, each segmented by the merge rules in rank
    * order (driver/executor `String.replace` — the same non-overlapping
    * leftmost semantics as the column/SQL form, so all three agree).
    * Registering makes it a per-column `create_tokenizer` model like
    * wordpiece (spec.py:276-278): a KeywordIndex can name it and the
    * whole BM25 chain runs over trained subwords. */
  def bpeTokenizer(merges: Seq[(String, String)],
                   name: String = "bpe_trained"): Tokenizer = {
    def segmentRaw(word: String): Seq[String] = {
      var s = " " + word.toCharArray.mkString(" ") + " "
      merges.foreach { case (l, r) =>
        s = s.replace(s" $l $r ", s" $l$r ")
      }
      s.trim.split(" ").toSeq
    }
    val scalaForm: String => Seq[String] = new (String => Seq[String])
        with Serializable {
      // per-instance word→pieces memo (one per deserialized closure,
      // i.e. per executor task set): segmentation cost collapses from
      // per-OCCURRENCE to per-distinct-word — the trainer's
      // vocabulary-linear trick, applied to the apply side. Capped so
      // a pathological vocabulary cannot grow it unboundedly.
      private val memo = new java.util.concurrent.ConcurrentHashMap[
        String, Seq[String]]()
      private val Cap = 200000
      def apply(text: String): Seq[String] =
        Simple.scala(text).flatMap { w =>
          val hit = memo.get(w)
          if (hit != null) hit
          else {
            val pieces = segmentRaw(w)
            if (memo.size < Cap) memo.put(w, pieces)
            pieces
          }
        }
    }
    val t = Tokenizer(name,
      c => udf(scalaForm).apply(c),
      scalaForm)
    register(t)
    t
  }

  /** Canonical fingerprint of a merge list: sha-256 over the
    * rank-ordered `lhs\u0000rhs` lines — the identity a persisted
    * model pins so a reader can never silently segment under different
    * rules than the index was built with. */
  def bpeFingerprint(merges: Seq[(String, String)]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(merges.map { case (l, r) => s"$l\u0000$r" }
        .mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Persist a trained merge table: `merges/` parquet (rank, lhs, rhs,
    * cnt) + a `_bpe_model` marker carrying the [[bpeFingerprint]] —
    * the tokenizer ARTIFACT that must ship with any index built under
    * it (a 100 TB BM25 layout whose reader re-trains or guesses rules
    * silently degrades retrieval; the fingerprint makes the pairing
    * checkable). */
  def writeBpeModel(spark: org.apache.spark.sql.SparkSession,
                    merges: org.apache.spark.sql.DataFrame,
                    dir: String): Unit = {
    merges.select(col("rank"), col("lhs"), col("rhs"), col("cnt"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/merges")
    // fingerprint the rows READ BACK from the write, never a second
    // evaluation of the input plan: if the two could differ (a
    // non-re-evaluation-stable merges frame), marker and data would
    // disagree and the root would be permanently unloadable
    val rules = spark.read.parquet(s"$dir/merges").orderBy("rank")
      .select(col("lhs"), col("rhs")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    graft.io.Markers.write(spark, dir, "_bpe_model",
      bpeFingerprint(rules))
  }

  /** Load a [[writeBpeModel]] root and REGISTER the tokenizer under
    * `bpe@<fingerprint-prefix>` (stable content-derived name — two
    * roots with the same rules resolve to the same model). Refuses
    * loudly if the stored rows don't hash to the marker (a partially
    * rewritten or hand-edited model must never segment silently). */
  def loadBpeModel(spark: org.apache.spark.sql.SparkSession,
                   dir: String): Tokenizer = {
    val rules = spark.read.parquet(s"$dir/merges").orderBy("rank")
      .select(col("lhs"), col("rhs")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val fp = bpeFingerprint(rules)
    val stored = graft.io.Markers.read(spark, dir, "_bpe_model")
    require(stored.contains(fp),
      s"$dir: stored merges hash to $fp but the marker says " +
        s"${stored.getOrElse("<missing>")} — refusing a model whose " +
        "rules and identity disagree")
    bpeTokenizer(rules, name = s"bpe@${fp.take(12)}")
  }

  /** [[wordpiece]] from a vocab FILE (one piece per line — a BERT
    * `vocab.txt`); any Hadoop-visible path (local, hdfs://, s3a://). */
  def wordpieceFromFile(spark: org.apache.spark.sql.SparkSession,
                        path: String,
                        name: String = "bert_base_uncased",
                        unk: String = "[UNK]"): Tokenizer = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val vocab =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toVector
      finally in.close()
    wordpiece(vocab, name, unk)
  }
}
