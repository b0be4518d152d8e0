package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Ann
import graft.text.{Embed, Md5Embedder, RegexChunker}
import Tables._

/** End-to-end ingest→search flow — the reference's `examples/simple.py`
  * shape: load documents, chunk (RegexChunker), embed (deterministic
  * local embedder), then answer a dense top-k query over the chunks.
  * Runs [[Md5Embedder]] (md5 feature hashing, integer-exact cosine) so
  * the WHOLE loop — greedy chunker, embedding, brute-force cosine
  * top-k — is reproduced by the DuckDB oracle below (the chunker as a
  * recursive CTE over the same per-piece state machine).
  */
object E2e {

  val ChunkSize = 200
  val ChunkOverlap = 40
  val Dim = 64
  val Query = "spark filter join"

  def ingestSearch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // whitespace separator: the testdata documents carry no sentence
    // punctuation, so the default separator would leave every doc a
    // single (overlong) piece and the greedy pack/overlap loop would
    // never run — word pieces make every doc exercise it (~2 chunks
    // per ~300-char doc at size=200/overlap=40)
    val chunker = RegexChunker(size = ChunkSize, overlap = ChunkOverlap,
      separator = "\\s+", concat = " ")
    val emb = Md5Embedder(dim = Dim)
    val chunks = documents(s, d).select("doc_id", "text")
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        chunker.segment(t).zipWithIndex.map { case (c, i) =>
          (id * 1000 + i, id, c)
        }
      }
      .toDF("chunk_id", "doc_id", "body")
    val embedded = Embed.withEmbedding(chunks, "body", "vec", emb)
    Ann.topK(embedded, "chunk_id", "vec",
        Embed.queryVec(emb, Query), Ann.Cosine, 10)
      .select("chunk_id", "doc_id", "dist")
  }

  /** HTML strip + dispatch under the oracle (T5–T6, extract.py:18-36,
    * 52-62): each document's text is wrapped into an HTML page — a
    * script subtree, a style subtree, an entity-bearing `<h1>`, the
    * text in a `<p>`, and a comment — and extracted through the REAL
    * dispatch path (`Extract.extract("html", bytes)`: script/style
    * subtrees and comments dropped, tags stripped, entities decoded,
    * non-empty nodes joined with newline, NFKC). The oracle rebuilds
    * the expected output directly: `lang & co\n<text>` (the testdata
    * text is tag-free; `[<>&]` are scrubbed on both sides so the
    * construction is parity-exact). */
  def htmlExtract(s: SparkSession, d: String): DataFrame = {
    val ex = udf((lang: String, text: String) =>
      graft.text.Extract.extract("html",
        ("<html><head><script>var x = 1 < 2;</script>" +
          "<style>.a{color:red}</style></head><body>" +
          s"<h1>$lang &amp; co</h1><p>$text</p>" +
          "<!-- dropped --></body></html>").getBytes("UTF-8")))
    documents(s, d)
      .withColumn("__clean",
        regexp_replace(col("text"), "[<>&]", ""))
      .select(col("doc_id"),
        ex(col("lang"), col("__clean")).as("extracted"))
  }

  /** The config-driven dynamic pipeline end to end under the oracle
    * (D3–D5, pipeline.py:112-218 factory + :249-343 index flow +
    * :394-442 search flow): `Dynamic.fromSteps` resolves a regex
    * chunker, the md5 local embedding provider, and the index+search
    * options; `runIndex` chunks and embeds every document into a fresh
    * Registry; `runSearch` answers the gate query with the vector +
    * keyword fan-out fused by the ordered dedup-union. The DuckDB twin
    * replays the chunker (shared recursive CTE), the md5 embedding and
    * cosine ranking, the chunk-level BM25, and the dedup-union fusion
    * from first principles. */
  def dynamicPipeline(s: SparkSession, d: String): DataFrame = {
    import graft.pipeline.Dynamic
    val reg = new graft.core.Registry(s,
      java.nio.file.Files.createTempDirectory("graft_d01").toString)
    val chunks = Dynamic.chunkDef("d01chunk")
    reg.register(chunks)
    val cfg = Dynamic.fromSteps(Seq(
      Dynamic.ResourceRequest("chunk", "regex", Map(
        "size" -> ChunkSize.toString, "overlap" -> ChunkOverlap.toString,
        "separator" -> "\\s+", "concat" -> " ")),
      Dynamic.ResourceRequest("text-emb", "md5",
        Map("dim" -> Dim.toString)),
      Dynamic.ResourceRequest("index", "graft"),
      Dynamic.ResourceRequest("search", "graft", Map("topk" -> "10"))))
    Dynamic.runIndex(reg, cfg, documents(s, d).select("doc_id", "text"),
      chunks)
    Dynamic.runSearch(reg, cfg, Query, chunks)
  }

  /** e09: the sentence chunker (T2, chunk.py's sentence segmentation
    * seat) under the oracle. The fixture corpus carries no sentence
    * punctuation, so the gate PLANTS deterministic boundaries: each
    * document's tokens are grouped 5 per sentence, every sentence led
    * by the uppercase marker word `Sent` and closed with `.` — a shape
    * the JDK `BreakIterator` sentence rules split unambiguously
    * (period + space + uppercase; lowercase continuations like `e.g.
    * the` would NOT break, which is why the marker word exists). The
    * REAL [[graft.text.SentenceChunker.segment]] then runs per
    * document and must recover exactly the planted sentences, which
    * the oracle rebuilds as pure column math (locale edge behavior
    * stays ChunkSpec's job). */
  def sentenceChunk(s: SparkSession, d: String): DataFrame = {
    val ch = graft.text.SentenceChunker()
    val f = udf { (t: String) =>
      val toks = if (t == null) Seq.empty[String]
        else t.toLowerCase(java.util.Locale.ROOT)
          .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val text = toks.grouped(5)
        .map(g => "Sent " + g.mkString(" ") + ".").mkString(" ")
      ch.segment(text)
    }
    documents(s, d)
      .select(col("doc_id"), posexplode(f(col("text"))))
      .select(col("doc_id"), col("pos").as("idx"), col("col").as("chunk"))
  }

  /** Minimal one-page PDF wrapping `text` as a FlateDecode content
    * stream (`BT (…) Tj ET`, parenthesis/backslash-escaped) — the
    * deterministic document-wrapper e10 uses, exercising the real
    * xref-less object walk, stream inflate and literal-string decode
    * of [[graft.text.Extract.pdf]] (extract.py:? — the reference
    * delegates PDFs to pypdf; the pure-JVM extractor is ours). */
  private def pdfBytes(text: String): Array[Byte] = {
    // the wrapper emits Latin-1 literal strings; fail LOUDLY if the
    // fixture ever grows a char the encoding would silently turn into
    // '?' (the oracle keeps the original → opaque hash mismatch)
    require(text.forall(_ <= 0xFF.toChar),
      "e10's PDF wrapper encodes Latin-1 literals; documents.parquet " +
        "now carries chars beyond U+00FF — widen the wrapper (UTF-16 " +
        "strings) first")
    val esc = text.replace("\\", "\\\\")
      .replace("(", "\\(").replace(")", "\\)")
    val stream = s"BT ($esc) Tj ET"
    val dfl = new java.util.zip.Deflater()
    dfl.setInput(stream.getBytes("ISO-8859-1")); dfl.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!dfl.finished()) bos.write(buf, 0, dfl.deflate(buf))
    dfl.end()
    val body = bos.toByteArray
    // concatenate as BYTES: the deflated body is binary and must not
    // pass through string templating (a chance `\n|` inside it would
    // be eaten by stripMargin, truncating the stream)
    val head = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${body.length} /Filter /FlateDecode >>\n" +
      "stream\n").getBytes("ISO-8859-1")
    val tail = ("\nendstream endobj\n" +
      "trailer << /Root 1 0 R >>\n%%EOF").getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    out.write(head); out.write(body); out.write(tail)
    out.toByteArray
  }

  /** e10: the REAL PDF extraction dispatch (T4) under the oracle —
    * e07's wrapper pattern for the binary format: every document's
    * text wraps into a deterministic Flate-compressed PDF and
    * `Extract.extract(".pdf", bytes)` (inflate → content-stream
    * tokenization → literal-string unescape → NFKC) must recover the
    * text verbatim; the oracle is the document text itself. Crypto /
    * CID / ObjStm edge behavior stays ExtractEmbedSpec's job. */
  def pdfExtract(s: SparkSession, d: String): DataFrame = {
    val f = udf { (t: String) =>
      graft.text.Extract.extract(".pdf", pdfBytes(if (t == null) "" else t))
    }
    documents(s, d).select(col("doc_id"), f(col("text")).as("text_out"))
  }

  /** e11: the LocalLoader (S8, loader.py's directory loader) under the
    * oracle. Every document's text is materialized as a real `.txt`
    * file and [[graft.io.Load.localDir]] — the DISTRIBUTED
    * `binaryFile` scan with extension extraction + sha-256 digest —
    * must read every file back; the oracle recomputes the digest from
    * the source text (DuckDB `sha256` over the same UTF-8 bytes), so
    * the gate pins the whole loader contract: recursive discovery,
    * glob filter, ext parse, byte-exact content, digest. */
  def localLoader(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val dir = java.nio.file.Files.createTempDirectory("graft_e11")
    rows.foreach { case (id, tx) =>
      java.nio.file.Files.write(dir.resolve(s"$id.txt"),
        (if (tx == null) "" else tx).getBytes("UTF-8"))
    }
    graft.io.Load.localDir(s, dir.toString, glob = "*.txt")
      .select(regexp_extract(col("path"), "([0-9]+)\\.txt$", 1)
          .cast("long").as("doc_id"),
        col("ext"), col("digest"))
      .orderBy("doc_id")
  }

  /** d02: the BINARY dynamic-index branch under the oracle
    * ([[graft.pipeline.Dynamic.runIndexBinary]] — the reference's
    * non-TEXT request path, pipeline.py:280-330): even documents
    * arrive as `txt` bytes (decoded verbatim), odd ones as `pdf`
    * payloads routed through the configured `ocr` seat (the
    * deterministic stub, whose tag `pdf <sha-8> <len> bytes` DuckDB
    * replays with its own sha256), everything chunks (size 10⁴ — one
    * chunk per doc at fixture lengths), embeds (md5) and lands in a
    * fresh registry in one transaction; the gate returns the stored
    * chunk table (minus the vector) and the oracle rebuilds it from
    * first principles. d01 gates the search flow; this gates the
    * binary ingest flow. */
  def dynamicBinary(s: SparkSession, d: String): DataFrame = {
    import graft.pipeline.Dynamic
    val reg = new graft.core.Registry(s,
      java.nio.file.Files.createTempDirectory("graft_d02").toString)
    val chunks = Dynamic.chunkDef("d02chunk")
    reg.register(chunks)
    val cfg = Dynamic.fromSteps(Seq(
      Dynamic.ResourceRequest("chunk", "regex", Map(
        "size" -> "10000", "overlap" -> "0",
        "separator" -> "\\s+", "concat" -> " ")),
      Dynamic.ResourceRequest("text-emb", "md5", Map("dim" -> "64")),
      Dynamic.ResourceRequest("ocr", "stub"),
      Dynamic.ResourceRequest("index", "graft")))
    val bin = documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 2 === 0, lit("txt")).otherwise(lit("pdf"))
        .as("ext"),
      encode(coalesce(col("text"), lit("")), "UTF-8").as("data"))
    Dynamic.runIndexBinary(reg, cfg, bin, chunks)
    reg.table(chunks).select("uid", "doc_id", "seq", "text")
      .orderBy("doc_id", "seq")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e01_ingest_search" -> ingestSearch,
    "e07_html_extract" -> htmlExtract,
    "e09_sentence_chunk" -> sentenceChunk,
    "e10_pdf_extract" -> pdfExtract,
    "e11_local_loader" -> localLoader,
    "d01_dynamic_pipeline" -> dynamicPipeline,
    "d02_dynamic_binary" -> dynamicBinary)

  /** DuckDB twin of the FULL loop. The greedy chunker is a recursive
    * CTE stepping the same per-piece state machine as
    * [[graft.text.RegexChunker.segment]] (state = previous / current /
    * totalLength / emitted chunks; LATERALs t0-t4 are the loop body's
    * three phases: maybe-emit, append, overflow-emit). `ko(...)` =
    * keepOverlap (maximal suffix under `overlap` chars); the overflow
    * branch's prefix drop mirrors the overlapIndex scan. Chunk bodies
    * were validated identical to an independent re-implementation over
    * the whole corpus, not just the top-k gate. Embedding/cosine are
    * bit-exact: [[graft.text.Md5Embedder]] vectors are small integers,
    * so dot/norm are exact in double and `round(..., 6)` agrees. */
  // ---- shared oracle fragments (e01 + d01) ------------------------------
  private def sumlen(l: String): String =
    s"coalesce(list_sum(list_transform($l, x -> length(x))), 0)"
  private def ko(l: String, overlap: Int): String =
    s"($l)[coalesce(list_min(list_filter(range(1, len($l) + 2), " +
      s"s -> ${sumlen(s"($l)[s:]")} < $overlap)), 1):]"
  private def feats(toks: String): String =
    s"$toks || list_transform(range(len($toks) - 1), " +
      s"j -> ($toks)[j + 1] || ' ' || ($toks)[j + 2])"
  private val h = "('0x' || substring(md5(f), 1, 8))::BIGINT"

  /** The greedy-chunker recursive CTE chain (p0 → rec → fin): per doc,
    * `fin(doc_id, chunks VARCHAR[])` — the same per-piece state machine
    * as [[graft.text.RegexChunker.segment]] at (size, overlap), with a
    * `\s+` separator and space concat. Shared by e01 and d01. */
  private def chunkerCte(size: Int, overlap: Int): String =
    s"""p0 AS (
          SELECT doc_id,
            list_filter(list_transform(
              regexp_split_to_array(text, '[\\s]+'),
              x -> trim(x, ' ' || chr(9) || chr(10) || chr(13) ||
                           chr(11) || chr(12))),
              x -> x != '') AS pieces
          FROM documents),
        rec AS (
          SELECT doc_id, pieces, 0 AS i,
                 []::VARCHAR[] AS prev, []::VARCHAR[] AS cur,
                 0 AS total, []::VARCHAR[] AS chunks
          FROM p0
          UNION ALL
          SELECT r.doc_id, r.pieces, r.i + 1,
                 t4.prevD, t4.curD, t4.totalD, t4.chunksD
          FROM rec r,
          LATERAL (SELECT r.pieces[r.i + 1] AS p,
            (r.total + length(r.pieces[r.i + 1]) > $size
              AND len(r.cur) > 0) AS emit1,
            ${ko("r.cur", overlap)} AS koCur) t0,
          LATERAL (SELECT
            CASE WHEN t0.emit1
              THEN r.chunks || [array_to_string(r.prev || r.cur, ' ')]
              ELSE r.chunks END AS chunksA,
            CASE WHEN t0.emit1 THEN t0.koCur ELSE r.prev END AS prevA,
            CASE WHEN t0.emit1 THEN ${sumlen("t0.koCur")}
              ELSE r.total END AS totalA,
            CASE WHEN t0.emit1 THEN []::VARCHAR[] ELSE r.cur END AS curA) t1,
          LATERAL (SELECT list_append(t1.curA, t0.p) AS curB,
            t1.totalA + length(t0.p) AS totalB) t2,
          LATERAL (SELECT (t2.totalB > $size) AS over,
            (t1.prevA)[coalesce(list_min(list_filter(
              range(1, len(t1.prevA) + 1),
              j -> t2.totalB - ${sumlen("(t1.prevA)[1:j]")} <= $size)),
              len(t1.prevA)) + 1:] AS prevC,
            ${ko("t2.curB", overlap)} AS koCurB) t3,
          LATERAL (SELECT
            CASE WHEN t3.over
              THEN t1.chunksA ||
                [array_to_string(t3.prevC || t2.curB, ' ')]
              ELSE t1.chunksA END AS chunksD,
            CASE WHEN t3.over THEN t3.koCurB ELSE t1.prevA END AS prevD,
            CASE WHEN t3.over THEN ${sumlen("t3.koCurB")}
              ELSE t2.totalB END AS totalD,
            CASE WHEN t3.over THEN []::VARCHAR[] ELSE t2.curB END AS curD) t4
          WHERE r.i < len(r.pieces)),
        fin AS (
          SELECT doc_id,
            CASE WHEN array_to_string(prev || cur, ' ') != ''
              THEN chunks || [array_to_string(prev || cur, ' ')]
              ELSE chunks END AS chunks
          FROM rec WHERE i = len(pieces))"""

  val oracles: Map[String, String] = {
    Map("e10_pdf_extract" ->
      // extraction must be lossless on the wrapped text
      "SELECT doc_id, coalesce(text, '') AS text_out FROM documents",
      "e11_local_loader" ->
        """SELECT doc_id, '.txt' AS ext,
             sha256(coalesce(text, '')) AS digest
           FROM documents ORDER BY doc_id""",
      "d02_dynamic_binary" ->
        // one chunk per doc: txt docs keep their (whitespace-normalized)
        // text, pdf docs carry the stub extractor's content tag — its
        // sha-256 prefix recomputed by DuckDB over the same UTF-8 bytes;
        // token-free txt docs chunk to nothing and are absent
        """SELECT CAST(doc_id AS VARCHAR) || '-0' AS uid, doc_id,
             0 AS seq,
             CASE WHEN doc_id % 2 = 0
               THEN array_to_string(list_filter(
                 regexp_split_to_array(coalesce(text, ''), '\s+'),
                 x -> x != ''), ' ')
               ELSE 'pdf ' || substring(sha256(coalesce(text, '')), 1, 8)
                 || ' ' || CAST(strlen(coalesce(text, ''))
                     AS VARCHAR) || ' bytes' END AS text
           FROM documents
           WHERE NOT (doc_id % 2 = 0 AND
             length(trim(coalesce(text, ''))) = 0)
           ORDER BY doc_id, seq""",
      "e09_sentence_chunk" ->
      // rebuild the planted sentences: token i (0-based) belongs to
      // sentence i // 5; chunk = 'Sent ' + its 5 tokens + '.'
      """WITH rt AS (SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x != '') AS toks
           FROM documents),
         g AS (SELECT doc_id, CAST(i // 5 AS INT) AS idx, tok, i
               FROM (SELECT doc_id, unnest(toks) AS tok,
                            unnest(range(len(toks))) AS i
                     FROM rt))
         SELECT doc_id, idx,
                'Sent ' || string_agg(tok, ' ' ORDER BY i) || '.' AS chunk
         FROM g GROUP BY doc_id, idx""",
      "e01_ingest_search" ->
      s"""WITH RECURSIVE
        ${chunkerCte(ChunkSize, ChunkOverlap)},
        ch AS (
          SELECT doc_id * 1000 + i AS chunk_id, doc_id,
                 chunks[i + 1] AS body
          FROM (SELECT doc_id, chunks, unnest(range(len(chunks))) AS i
                FROM fin)),
        tok AS (
          SELECT chunk_id, doc_id,
            list_filter(regexp_split_to_array(lower(body), '[^a-z0-9]+'),
              x -> x != '') AS toks
          FROM ch),
        feat AS (
          SELECT chunk_id, doc_id, unnest(${feats("toks")}) AS f
          FROM tok),
        hw AS (
          SELECT chunk_id, doc_id, ($h // 2) % $Dim AS bucket,
            CASE WHEN $h % 2 = 0 THEN 1 ELSE -1 END AS s
          FROM feat),
        emb AS (SELECT chunk_id, doc_id, bucket, sum(s) AS w
                FROM hw GROUP BY 1, 2, 3),
        qfeat AS (
          SELECT unnest(${feats("toks")}) AS f
          FROM (SELECT list_filter(regexp_split_to_array(lower('$Query'),
              '[^a-z0-9]+'), x -> x != '') AS toks)),
        qv AS (
          SELECT ($h // 2) % $Dim AS bucket,
            sum(CASE WHEN $h % 2 = 0 THEN 1 ELSE -1 END) AS qw
          FROM qfeat GROUP BY 1),
        qn AS (SELECT sqrt(sum(qw * qw)) AS nq FROM qv),
        cn AS (SELECT chunk_id, doc_id, sqrt(sum(w * w)) AS nc
               FROM emb GROUP BY 1, 2),
        dots AS (SELECT e.chunk_id, sum(e.w * q.qw) AS dot
                 FROM emb e JOIN qv q USING (bucket) GROUP BY 1),
        scored AS (
          SELECT cn.chunk_id, cn.doc_id,
            round(1 - coalesce(d.dot, 0) /
              (cn.nc * (SELECT nq FROM qn)), 6) AS dist
          FROM cn LEFT JOIN dots d USING (chunk_id))
        SELECT chunk_id, doc_id, dist FROM scored
        ORDER BY dist ASC, chunk_id ASC LIMIT 10""") +
    ("e07_html_extract" ->
      // rebuild the expected extraction directly: the h1 node decodes
      // its entity to 'lang & co'; the p node is the scrubbed text,
      // trimmed; empty text leaves only the h1 line (no join partner)
      """SELECT doc_id,
           CASE WHEN trim(regexp_replace(text, '[<>&]', '', 'g')) = ''
                THEN lang || ' & co'
                ELSE lang || ' & co' || chr(10) ||
                     trim(regexp_replace(text, '[<>&]', '', 'g'))
           END AS extracted
         FROM documents""") +
    ("d01_dynamic_pipeline" ->
      // the dynamic pipeline replayed end to end: shared chunker CTE →
      // string uids (doc-i, the index flow's scheme) → md5 embedding +
      // cosine top-10 (rank 0) → chunk-level BM25 top-10 (rank 1) →
      // ordered first-occurrence dedup-union, text joined back
      s"""WITH RECURSIVE
        ${chunkerCte(ChunkSize, ChunkOverlap)},
        ch AS (
          SELECT doc_id || '-' || i AS id, doc_id, chunks[i + 1] AS body
          FROM (SELECT doc_id, chunks, unnest(range(len(chunks))) AS i
                FROM fin)),
        tok AS (
          SELECT id, doc_id,
            list_filter(regexp_split_to_array(lower(body), '[^a-z0-9]+'),
              x -> x != '') AS toks
          FROM ch),
        feat AS (SELECT id, unnest(${feats("toks")}) AS f FROM tok),
        hw AS (
          SELECT id, ($h // 2) % $Dim AS bucket,
            CASE WHEN $h % 2 = 0 THEN 1 ELSE -1 END AS s
          FROM feat),
        emb AS (SELECT id, bucket, sum(s) AS w FROM hw GROUP BY 1, 2),
        qfeat AS (
          SELECT unnest(${feats("toks")}) AS f
          FROM (SELECT list_filter(regexp_split_to_array(lower('$Query'),
              '[^a-z0-9]+'), x -> x != '') AS toks)),
        qv AS (
          SELECT ($h // 2) % $Dim AS bucket,
            sum(CASE WHEN $h % 2 = 0 THEN 1 ELSE -1 END) AS qw
          FROM qfeat GROUP BY 1),
        qn AS (SELECT sqrt(sum(qw * qw)) AS nq FROM qv),
        cn AS (SELECT id, sqrt(sum(w * w)) AS nc FROM emb GROUP BY 1),
        dots AS (SELECT e.id, sum(e.w * q.qw) AS dot
                 FROM emb e JOIN qv q USING (bucket) GROUP BY 1),
        vscored AS (
          SELECT cn.id,
            round(1 - coalesce(d.dot, 0) /
              (cn.nc * (SELECT nq FROM qn)), 6) AS dist
          FROM cn LEFT JOIN dots d USING (id)),
        vecl AS (SELECT id, dist FROM vscored
                 ORDER BY dist ASC, id ASC LIMIT 10),
        vecr AS (SELECT id, row_number()
                   OVER (ORDER BY dist ASC, id ASC) AS rank, 0 AS src
                 FROM vecl),
        ctoks AS (SELECT id, unnest(toks) AS term FROM tok),
        ctf AS (SELECT id, term, count(*) AS tf FROM ctoks GROUP BY 1, 2),
        cdl AS (SELECT id, count(*) AS dl FROM ctoks GROUP BY 1),
        cstats AS (SELECT term, count(*) AS df FROM ctf GROUP BY 1),
        cg AS (SELECT count(*) AS n,
                      CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
               FROM cdl),
        cq AS (SELECT unnest(['spark', 'filter', 'join']) AS term),
        cscored AS (
          SELECT ctf.id,
            ln((cg.n - st.df + 0.5) / (st.df + 0.5) + 1.0) *
              (ctf.tf * (1.2 + 1)) /
              (ctf.tf + 1.2 * ((1 - 0.75) + 0.75 * cdl.dl / cg.avgdl)) AS w
          FROM ctf
          JOIN cq USING (term)
          JOIN cstats st USING (term)
          JOIN cdl USING (id)
          CROSS JOIN cg),
        bml AS (SELECT id, round(sum(w), 6) AS score FROM cscored
                GROUP BY id ORDER BY score DESC, id ASC LIMIT 10),
        bmr AS (SELECT id, row_number()
                  OVER (ORDER BY score DESC, id ASC) AS rank, 1 AS src
                FROM bml),
        u AS (SELECT id, rank, src FROM vecr
              UNION ALL SELECT id, rank, src FROM bmr),
        fo AS (SELECT id, rank, src,
                 row_number() OVER (PARTITION BY id
                   ORDER BY src ASC, rank ASC) AS occ
               FROM u),
        fused AS (SELECT id, rank, src FROM fo WHERE occ = 1
                  ORDER BY src ASC, rank ASC LIMIT 10)
        SELECT fu.id, c.doc_id, c.body AS text,
               CAST(fu.rank AS INTEGER) AS rank,
               CAST(fu.src AS INTEGER) AS src
        FROM fused fu JOIN ch c ON c.id = fu.id""")
  }
}
