package graft.misc

import java.nio.file.Files

import graft.SparkSpecBase
import graft.functions.{HashSparseEmbedder, Sparse, Tokenizers}
import graft.io.Load
import graft.multimodal._
import graft.rank.{OverlapReranker, Rerank}
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpecBase {

  test("local loader reads files with digest and extension") {
    val dir = Files.createTempDirectory("graft-load")
    Files.write(dir.resolve("a.txt"), "hello".getBytes)
    Files.write(dir.resolve("b.html"), "<p>x</p>".getBytes)
    Files.write(dir.resolve("skip.bin"), Array[Byte](1, 2))
    val df = Load.localDir(spark, dir.toString, "*.{txt,html}")
    val rows = df.collect().map(r => r.getAs[String]("ext") ->
      r.getAs[String]("digest")).toMap
    assert(rows.keySet === Set(".txt", ".html"))
    // sha256("hello")
    assert(rows(".txt") ===
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
  }

  test("tokenizer column and scala forms agree") {
    val sp = spark
    import sp.implicits._
    val texts = Seq("Hello, World-123!", "  spaced   out.  ", "ümlaut têst")
    for (tok <- Seq(Tokenizers.Simple, Tokenizers.Wordpiece, Tokenizers.Wiki)) {
      val colRes = texts.toDF("t")
        .select(tok.column(col("t")).as("toks"))
        .collect().map(_.getSeq[String](0).toSeq)
      val scalaRes = texts.map(tok.scala)
      assert(colRes.toSeq === scalaRes, s"tokenizer ${tok.name}")
    }
  }

  test("wordpiece: greedy longest-match with ## continuations, UNK, " +
      "and BERT basic tokenization") {
    val vocab = Seq("un", "##aff", "##able", "aff", "hello", "world",
      ",", "!", "run", "##ning")
    // no register side-effect here: exercise the pure functions
    val set = vocab.toSet
    assert(Tokenizers.wordpiecePieces(set, "unaffable") ===
      Seq("un", "##aff", "##able"))
    // greedy = LONGEST prefix first: "aff" (a whole-word piece) wins
    // over "un"+nothing for a word starting "aff"
    assert(Tokenizers.wordpiecePieces(set, "affable").head === "aff")
    // a position with no matching piece sinks the whole word
    assert(Tokenizers.wordpiecePieces(set, "xyz") === Seq("[UNK]"))
    // basic tokenization: lowercase, accents stripped, punctuation
    // split into its own tokens
    assert(Tokenizers.basicTokens("Héllo, Wörld!") ===
      Seq("hello", ",", "world", "!"))
    assert(Tokenizers.wordpieceScala(set, "Hello, running!") ===
      Seq("hello", ",", "run", "##ning", "!"))
  }

  test("trainBpe: hand-computed merge trajectory, lexicographic " +
      "tie-breaks, early stop, single-pass self-merge semantics") {
    val sp = spark
    import sp.implicits._
    // corpus "low low lower": pairs (l,o)=3 (o,w)=3 (w,e)=1 (e,r)=1.
    // R1: tie at 3 -> lex (l,o). R2: (lo,w)=3. R3: tie at 1 ->
    // (e,r) < (low,e). R4: (low,er). R5: no pairs -> early stop.
    val got = Tokenizers.trainBpe(
        Seq("low low lower").toDF("text"), "text", merges = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got === Seq((1, "l", "o", 3L), (2, "lo", "w", 3L),
      (3, "e", "r", 1L), (4, "low", "er", 1L)))
    // chained self-merge: 'aaaa' counts (a,a)=3 positionally but the
    // single replace pass fuses only the leftmost non-overlapping
    // occurrence -> [aa, a, a]; round 2 re-ties (a,a)=1 < (aa,a)=1 lex
    val aa = Tokenizers.trainBpe(Seq("aaaa").toDF("text"), "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(aa === Seq((1, "a", "a", 3L), (2, "a", "a", 1L),
      (3, "aa", "aa", 1L)))
    intercept[IllegalArgumentException] {
      Tokenizers.trainBpe(Seq("x").toDF("text"), "text", 0)
    }
    // train -> apply roundtrip: encoding under the learned rules
    // reproduces the trainer's own final segmentation
    val words = Seq(("low", 2L), ("lower", 1L)).toDF("w", "f")
    val enc = Tokenizers.applyBpe(words, "w",
        got.map(m => (m._2, m._3)))
      .collect().map(r => r.getAs[String]("w") ->
        r.getAs[String]("s").trim.split(" ").toSeq).toMap
    assert(enc("low") === Seq("low"))
    assert(enc("lower") === Seq("lower")) // merge 4 fuses low+er
    // the registered tokenizer form: whole-text scala segmentation,
    // resolvable by name (the create_tokenizer per-column surface)
    val bpeTok = Tokenizers.bpeTokenizer(got.map(m => (m._2, m._3)),
      name = "bpe_spec")
    assert(bpeTok.scala("Lower the lowest!") ===
      Seq("lower", "t", "h", "e", "low", "e", "s", "t"))
    assert(Tokenizers.byName("bpe_spec").scala("low") === Seq("low"))
  }

  test("BPE model persistence: write/load roundtrip segments " +
      "identically under a content-derived name; tampered marker " +
      "refuses") {
    val sp = spark
    import sp.implicits._
    val merges = Tokenizers.trainBpe(
      Seq("low low lower").toDF("text"), "text", merges = 6)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bpe-model-spec").toString
    Tokenizers.writeBpeModel(sp, merges, dir)
    val loaded = Tokenizers.loadBpeModel(sp, dir)
    assert(loaded.name.startsWith("bpe@"))
    assert(loaded.scala("lower lowly") ===
      Seq("lower", "low", "l", "y"))
    // same rules from a second root -> SAME registered name (content
    // identity, not path identity)
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-bpe-model-spec2").toString
    Tokenizers.writeBpeModel(sp, merges, dir2)
    assert(Tokenizers.loadBpeModel(sp, dir2).name === loaded.name)
    // tamper the marker: rules/identity disagreement must refuse
    graft.io.Markers.write(sp, dir, "_bpe_model", "deadbeef")
    intercept[IllegalArgumentException] {
      Tokenizers.loadBpeModel(sp, dir)
    }
  }

  test("wordpiece: the r24 derived-vocab invariant — greedy " +
      "longest-match provably splits every word to [take(4), ##drop(4)]") {
    // The r24 gate's oracle replays tokenization as a CASE split; its
    // soundness rests on this property of the derived vocab (standalone
    // pieces <= 4 chars, every word's own full continuation present),
    // including adversarial prefix/continuation overlaps across words.
    val rnd = new scala.util.Random(42)
    val words = (Seq("a", "ab", "abc", "abcd", "abcde", "abcdef",
      "abcdefg", "abcx", "abcxyz", "spark", "sparkling", "fil",
      "filter", "filters", "filtering", "join", "joining") ++
      Seq.fill(200)((1 to (1 + rnd.nextInt(9)))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)).distinct
    val vocab = words.flatMap(w =>
      if (w.length > 4) Seq(w.take(4), "##" + w.drop(4)) else Seq(w))
      .distinct.toSet
    words.foreach { w =>
      val expected =
        if (w.length > 4) Seq(w.take(4), "##" + w.drop(4)) else Seq(w)
      assert(Tokenizers.wordpiecePieces(vocab, w) === expected,
        s"word '$w' violated the derived-vocab split")
    }
  }

  test("wordpiece vocab tokenizer: column==scala parity and byName " +
      "resolution replaces the seat") {
    val sp = spark
    import sp.implicits._
    val seat = Tokenizers.Wordpiece
    try {
      val tok = Tokenizers.wordpiece(
        Seq("spark", "shuf", "##fle", "join", "##s", ",", "fast"),
        name = "bert_base_uncased")
      // registration replaced the seat under the model name
      assert(Tokenizers.byName("bert_base_uncased") eq tok)
      val texts = Seq("Spark shuffle joins, fast", "unknownword spark")
      val colRes = texts.toDF("t")
        .select(tok.column(col("t")).as("toks"))
        .collect().map(_.getSeq[String](0).toSeq)
      val scalaRes = texts.map(tok.scala)
      assert(colRes.toSeq === scalaRes)
      assert(scalaRes.head ===
        Seq("spark", "shuf", "##fle", "join", "##s", ",", "fast"))
      assert(scalaRes(1) === Seq("[UNK]", "spark"))
      // and a BM25 build+search runs end-to-end on the vocab tokenizer
      val docs = Seq((1L, "spark shuffle"), (2L, "fast joins"),
        (3L, "spark joins joins")).toDF("id", "text")
      val idx = graft.ops.Bm25.build(docs, "id", "text", tok)
      val top = graft.ops.Bm25.search(idx, "joins", k = 1).collect()
      assert(top.head.getLong(0) === 3L) // doc with tf=2 for join+##s
      idx.postings.unpersist(false)
    } finally Tokenizers.register(seat) // restore the vocab-less seat
  }

  test("wordpiece vocab loads from a file") {
    val dir = Files.createTempDirectory("graft-vocab")
    val f = dir.resolve("vocab.txt")
    Files.write(f, "hello\nworld\n##s\n".getBytes("UTF-8"))
    val seat = Tokenizers.Wordpiece
    try {
      val tok = Tokenizers.wordpieceFromFile(spark, f.toString,
        name = "bert_base_uncased")
      assert(tok.scala("Hello worlds") === Seq("hello", "world", "##s"))
    } finally Tokenizers.register(seat)
  }

  test("reranker permutes a ranked list deterministically") {
    val sp = spark
    import sp.implicits._
    val ranked = Seq((1L, "cats and dogs", 1), (2L, "spark sql joins", 2),
      (3L, "spark joins fast", 3)).toDF("id", "text", "rank")
    val out = Rerank.apply(ranked, "id", "text", "spark joins",
      OverlapReranker()).collect()
    // both spark docs tie on overlap 2 -> stable order by position
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(2L, 3L, 1L))
    assert(out.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
  }

  test("reranker input order over a fused union is (src, rank), not " +
      "partition layout") {
    val sp = spark
    import sp.implicits._
    // dedupUnion-shaped input: per-source ranks (both srcs carry rank
    // 1..2), every text tying on reranker overlap so the OUTPUT order
    // is exactly the INPUT order — the nondeterminism the (src, rank)
    // sort must close (ADVICE r10). Scrambled partitioning must not
    // change the result.
    val fused = Seq(
      (10L, "alpha beta", 1, 0), (11L, "alpha beta", 2, 0),
      (20L, "alpha beta", 1, 1), (21L, "alpha beta", 2, 1))
      .toDF("id", "text", "rank", "src")
    val expected = Seq(10L, 11L, 20L, 21L)
    (1 to 4).foreach { n =>
      val out = Rerank.apply(fused.repartition(n, col("id")), "id",
        "text", "no overlap at all", OverlapReranker()).collect()
      assert(out.map(_.getAs[Long]("id")).toSeq === expected,
        s"order must be (src, rank) under $n partitions")
    }
  }

  test("multimodal rerank ranks byte payloads by histogram similarity") {
    val r = OverlapReranker()
    val query = "aaaa bbbb aaaa"
    val near = "aaaa aaaa bbbb".getBytes("UTF-8") // same byte histogram
    val far = Array.fill[Byte](16)(9)
    val perm = r.rerankMultimodal(query, Seq(far, near))
    assert(perm === Seq(1, 0)) // the histogram twin wins
    assert(r.rerankMultimodal(query, Seq(near, far)) === Seq(0, 1))
  }

  test("sparse embedder + sparse dot column") {
    val e = HashSparseEmbedder(dim = 1024)
    val a = e.embed("spark spark joins")
    val b = e.embed("spark shuffles")
    assert(a.indices === a.indices.sorted)
    val sp = spark
    import sp.implicits._
    val df = Seq((a.indices, a.values, b.indices, b.values))
      .toDF("ai", "av", "bi", "bv")
    val got = df.select(Sparse.sparseDot(col("ai"), col("av"), col("bi"),
      col("bv")).as("dot")).head().getDouble(0)
    // shared term "spark": tf 2 in a, tf 1 in b -> dot 2.0
    assert(got === 2.0)
  }

  test("md5 sparse embedder follows the documented portable recipe") {
    val e = graft.functions.Md5SparseEmbedder(dim = 4096)
    val v = e.embed("Spark, spark merge!")
    // independent replay: bucket = (first-8-md5-hex as 32-bit) / 2
    // mod dim — the exact SQL recipe the r27 oracle runs in DuckDB
    def bucket(t: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex, 16) >>> 1) % 4096).toInt
    }
    val expect = Seq("spark", "spark", "merge").groupBy(bucket)
      .map { case (b, ts) => b -> ts.length.toFloat }.toSeq.sortBy(_._1)
    assert(v.indices === expect.map(_._1))
    assert(v.values === expect.map(_._2))
    assert(v.indices === v.indices.sorted)
    // dot against itself = sum tf^2 (2^2 + 1 = 5 sans collision)
    val sp = spark
    import sp.implicits._
    val df = Seq((v.indices, v.values)).toDF("i", "v")
    val got = df.select(Sparse.sparseDot(col("i"), col("v"), col("i"),
      col("v")).as("dot")).head().getDouble(0)
    assert(got === v.values.map(x => x * x.toDouble).sum)
  }

  test("inverted sparse top-k equals the row-scan sparseDot ranking") {
    val sp = spark
    import sp.implicits._
    val emb = graft.functions.Md5SparseEmbedder(dim = 512)
    val texts = Seq(
      (1L, "spark shuffles data across executors"),
      (2L, "spark spark spark joins tables"),
      (3L, "ducks swim on ponds"),
      (4L, ""), // empty doc: no postings, no score
      (5L, "tables join spark frames"))
    val q = emb.embed("spark joins tables")
    // row-scan form
    val docs = texts.toDF("id", "text")
      .withColumn("sv", udf((t: String) => emb.embed(t)).apply(col("text")))
    val rowScan = docs
      .withColumn("score", round(Sparse.sparseDot(
        col("sv.indices"), col("sv.values"),
        typedlit(q.indices), typedlit(q.values)), 6))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("id").asc)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("score")))
    // inverted-postings form
    val postings = Sparse.invertedPostings(
      docs.select(col("id"), col("sv.indices").as("i"),
        col("sv.values").as("v")), "id", "i", "v")
    val inverted = Sparse.invertedTopK(postings, q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(inverted.toSeq === rowScan.toSeq)
    assert(!inverted.exists(_._1 == 4L)) // empty doc absent from both
  }

  test("stored sparse postings: bucket dirs prune, scores unchanged") {
    val sp = spark
    import sp.implicits._
    val emb = graft.functions.Md5SparseEmbedder(dim = 512)
    val docs = Seq(
      (1L, "spark shuffles data"), (2L, "spark joins tables"),
      (3L, "ducks swim on ponds"), (4L, "tables join spark frames"))
      .toDF("id", "text")
      .withColumn("sv", udf((t: String) => emb.embed(t)).apply(col("text")))
    val postings = Sparse.invertedPostings(
      docs.select(col("id"), col("sv.indices").as("i"),
        col("sv.values").as("v")), "id", "i", "v")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sparse-store").toString
    Sparse.writePostings(postings, dir, buckets = 8)
    val q = emb.embed("spark joins")
    val stored = Sparse.searchStored(spark, dir, q, 10)
    val inMem = Sparse.invertedTopK(postings, q, 10)
    assert(stored.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq === inMem.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq)
    // disk pruning is REAL: the scan plans with a PartitionFilters
    // entry on __b restricted to the QUERY buckets (the repo's
    // standard pruning assertion — AQE query stages hide the executed
    // scan node from plan collection)
    val qb = q.indices.map(i => math.floorMod(i, 8)).distinct.sorted
    assert(qb.size < 8, "fixture must leave unprobed buckets")
    val phys = stored.queryExecution.executedPlan.toString
    val pf = phys.linesIterator
      .find(_.contains("PartitionFilters: ["))
      .getOrElse(fail(s"no PartitionFilters in plan:\n$phys"))
    assert(pf.contains("__b"), s"partition filter not on __b: $pf")
    qb.foreach(b => assert(pf.contains(b.toString),
      s"bucket $b missing from partition filter: $pf"))
  }

  test("batch sparse top-k equals the per-query inverted search") {
    val sp = spark
    import sp.implicits._
    val emb = graft.functions.Md5SparseEmbedder(dim = 512)
    val docs = Seq(
      (1L, "spark shuffles data"), (2L, "spark joins tables"),
      (3L, "ducks swim on ponds"), (4L, "tables join spark frames"))
      .toDF("id", "text")
      .withColumn("sv", udf((t: String) => emb.embed(t)).apply(col("text")))
      .select(col("id"), col("sv.indices").as("i"),
        col("sv.values").as("v"))
    val postings = Sparse.invertedPostings(docs, "id", "i", "v")
    val batch = Sparse.invertedTopKBatch(postings,
        docs.filter(col("id") <= 2), "id", "i", "v", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val loop = Seq(1L, 2L).flatMap { qid =>
      val q = emb.embed(
        Seq("spark shuffles data", "spark joins tables")(qid.toInt - 1))
      Sparse.invertedTopK(postings, q, 3).collect().zipWithIndex
        .map { case (r, i) => (qid, r.getLong(0), r.getDouble(1), i + 1) }
    }
    assert(batch.toSeq === loop)
  }

  test("stored sparse delete: victims vanish, survivors score unchanged") {
    val sp = spark
    import sp.implicits._
    val emb = graft.functions.Md5SparseEmbedder(dim = 512)
    val docs = Seq(
      (1L, "spark shuffles data"), (2L, "spark joins tables"),
      (3L, "ducks swim on ponds"), (4L, "tables join spark frames"))
      .toDF("id", "text")
      .withColumn("sv", udf((t: String) => emb.embed(t)).apply(col("text")))
    val postings = Sparse.invertedPostings(
      docs.select(col("id"), col("sv.indices").as("i"),
        col("sv.values").as("v")), "id", "i", "v")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sparse-del").toString
    Sparse.writePostings(postings, dir, buckets = 8)
    val q = emb.embed("spark joins")
    val before = Sparse.searchStored(spark, dir, q, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(before.exists(_._1 == 2L))
    val rewritten = Sparse.deleteStored(spark, dir, Seq(2L).toDF("id"))
    assert(rewritten > 0)
    val after = Sparse.searchStored(spark, dir, q, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(!after.exists(_._1 == 2L))
    assert(after === before.filterNot(_._1 == 2L))
  }

  test("multimodal stages preserve schema and batch shape") {
    val sp = spark
    import sp.implicits._
    val media = Seq(
      MediaRow(1L, "image", Array[Byte](0, 1, 2, 3, 100, 101),
        MediaMeta("png", 2, 3, 3, 0)),
      MediaRow(2L, "video", Array.tabulate(100)(_.toByte),
        MediaMeta("mp4", 8, 8, 3, 4000)),
      MediaRow(3L, "audio", Array[Byte](9, 9, 9),
        MediaMeta("wav", 0, 0, 1, 1500))).toDS()
    val codec = FakeCodec()
    val feats = Multimodal.extractFeatures(media, codec).collect()
    assert(feats.length === 3)
    assert(feats.forall(_.features.length === 64))
    // deterministic: same input -> same features
    val feats2 = Multimodal.extractFeatures(media, codec).collect()
    assert(feats.map(_.features.toSeq).toSeq ===
      feats2.map(_.features.toSeq).toSeq)
    val resized = Multimodal.resizeImages(media, codec, 4, 4).collect()
    val img = resized.find(_.id == 1L).get
    assert(img.data.length === 16 && img.meta.width === 4)
    val frames = Multimodal.sampleFrames(media, codec, 1000).collect()
    assert(frames.count(_.kind == "image") === 5) // 1 image + 4 frames
    val emb = Multimodal.embedMedia(spark, media, codec, 32).collect()
    assert(emb.forall(_.getSeq[Float](2).length === 32))
    val norm = math.sqrt(emb.head.getSeq[Float](2)
      .map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("ImageIoCodec: gray PNG round-trips pixels exactly; color luma, " +
      "nearest-neighbor resize, and bad payloads are deterministic") {
    val codec = ImageIoCodec()
    // lossless gray round-trip: decode(grayPng(px)) == px
    val px = Array.tabulate(12)(i => (i * 21).toByte) // 4x3, values 0..231
    val png = ImageIoCodec.grayPng(px, 4, 3)
    assert(png.take(8).map(_ & 0xFF).toSeq ===
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)) // real PNG magic
    val meta = MediaMeta("png", 4, 3, 1, 0)
    assert(codec.decode(png, meta).toSeq === px.toSeq)
    // color path: integer ITU-R 601 luma of an RGB png
    val img = new java.awt.image.BufferedImage(1, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF8040) // r=255 g=128 b=64
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val lum = codec.decode(bos.toByteArray, MediaMeta("png", 1, 1, 3, 0))
    assert((lum(0) & 0xFF) === (255 * 299 + 128 * 587 + 64 * 114) / 1000)
    // nearest-neighbor: identity resize is a no-op; 2x downsample picks
    // the even-index grid
    assert(codec.resize(px, meta, 4, 3).toSeq === px.toSeq)
    val down = codec.resize(px, meta, 2, 1)
    assert(down.toSeq === Seq(px(0), px(2)))
    // histograms run over decoded pixels (contract shared with FakeCodec)
    val hist = codec.features(codec.decode(png, meta))
    assert(hist.length === 64 && math.abs(hist.sum - 1.0f) < 1e-5)
    // JPEG decodes too (lossy: assert shape, not values)
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jbos)
    assert(codec.decode(jbos.toByteArray,
      MediaMeta("jpg", 1, 1, 3, 0)).length === 1)
    // non-image payloads fail loudly, not silently
    intercept[IllegalArgumentException] {
      codec.decode("not an image".getBytes, meta)
    }
  }

  test("WavCodec: 8-bit PCM WAV round-trips samples exactly; 16-bit " +
      "stereo downmixes to high-byte mean; clips slice at header rate") {
    val codec = WavCodec()
    // lossless round-trip: decode(pcmWav(s)) == s
    val samples = Array.tabulate(250)(i => (i % 251).toByte)
    val wav = WavCodec.pcmWav(samples, 1000f)
    assert(new String(wav.take(4)) === "RIFF" &&
      new String(wav.slice(8, 12)) === "WAVE") // real WAV container
    val meta = MediaMeta("wav", 0, 0, 1, 250)
    assert(codec.decode(wav, meta).toSeq === samples.toSeq)
    // 16-bit signed stereo: channel mean of the recentred high bytes
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    val fmt16 = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f,
      16, 2, 4, 8000f, false)
    // two frames, little-endian: L=(0x0100=256>>8 -> 1+128), R=(0x0300 -> 3+128)
    val raw = Array[Byte](0, 1, 0, 3, 0, 0x7F, 0, 0x7F)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt16, 2),
      AudioFileFormat.Type.WAVE, bos)
    val mono = codec.decode(bos.toByteArray, meta)
    assert(mono.length === 2)
    assert((mono(0) & 0xFF) === ((1 + 128) + (3 + 128)) / 2)
    assert((mono(1) & 0xFF) === 0x7F + 128)
    // real time-based slicing: 1000 Hz x 100 ms = 100 samples/clip
    val clips = codec.frames(wav, meta, everyMs = 100L)
    assert(clips.length === 3) // ceil(250/100)
    assert(clips.map(_.length).toSeq === Seq(100, 100, 50))
    assert(clips.flatten.toSeq === samples.toSeq) // partition, no loss
    // non-audio payloads fail loudly, not silently
    intercept[Exception] {
      codec.decode("not audio".getBytes, meta)
    }
  }

  test("perceptualHash: hand-computed bits, copies collide at hamming 0, " +
      "brightness-inverted image flips every informative bit") {
    val sp = spark
    import sp.implicits._
    val codec = ImageIoCodec()
    // 8x8 already (resize is identity): left half dark 10, right half
    // bright 200 -> mean 105 -> bits = 1 exactly on the bright half
    val bright = Array.tabulate(64)(i =>
      (if (i % 8 < 4) 10 else 200).toByte)
    val dark = bright.map(b => (210 - (b & 0xFF)).toByte) // swap halves
    def row(id: Long, px: Array[Byte]) =
      MediaRow(id, "image", ImageIoCodec.grayPng(px, 8, 8),
        MediaMeta("png", 8, 8, 1, 0))
    val media = Seq(row(1, bright), row(2, bright), row(3, dark))
      .toDS()
    val sigs = Multimodal.perceptualHash(media, codec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact expected signature: bit i set iff column i%8 >= 4
    val want = (0 until 64).filter(i => i % 8 >= 4)
      .map(i => 1L << i).reduce(_ | _)
    assert(sigs(1L) === want)
    assert(sigs(2L) === sigs(1L)) // identical image, identical hash
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) === 64,
      "inverting bright/dark halves must flip every bit")
    // signatures ride the banded hamming join: the copy pair surfaces
    val pairs = graft.ops.Dedup.simHashPairs(
        Multimodal.perceptualHash(media, codec), maxDist = 3, bands = 4)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Int]("hamming")))
    assert(pairs.toSeq === Seq((1L, 2L, 0)))
    intercept[IllegalArgumentException] {
      Multimodal.perceptualHash(media, codec, w = 16, h = 8) // >64 px
    }
  }

  test("ImageIoCodec video: MJPEG-AVI frames sample at the container " +
      "frame rate and decode as real JPEGs; non-AVI keeps the stub") {
    val codec = ImageIoCodec()
    def grayJpeg(v: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until 8).foreach(y => (0 until 8).foreach(x =>
        img.getRaster.setSample(x, y, 0, v)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val levels = Seq(10, 50, 90, 130, 170, 210)
    // 25 fps (40 ms/frame), 6 frames
    val avi = MjpegAvi.mjpegAvi(levels.map(grayJpeg), usPerFrame = 40000)
    assert(MjpegAvi.isAvi(avi))
    val meta = MediaMeta("avi", 8, 8, 1, 240)
    // everyMs=80 at 40 ms/frame: every 2nd frame -> levels 10, 90, 170
    val frames = codec.frames(avi, meta, everyMs = 80)
    assert(frames.length === 3)
    val means = frames.map { f =>
      val px = codec.decode(f, MediaMeta("jpg", 8, 8, 1, 0))
      assert(px.length === 64) // each frame is a real decodable JPEG
      px.map(_ & 0xFF).sum / px.length
    }
    // flat gray JPEG is DC-only: decoded mean within quantization slack
    means.zip(Seq(10, 90, 170)).foreach { case (m, want) =>
      assert(math.abs(m - want) <= 3, s"frame mean $m, wanted ~$want")
    }
    // sampling finer than the frame period keeps every frame
    assert(codec.frames(avi, meta, everyMs = 10).length === 6)
    // pipeline integration: one video row fans out to image rows in
    // the id·1000 space, each payload decodable downstream
    val sp = spark
    import sp.implicits._
    val ds = Seq(MediaRow(7L, "video", avi, meta)).toDS()
    val out = Multimodal.sampleFrames(ds, codec, everyMs = 80).collect()
      .sortBy(_.id)
    assert(out.map(_.id).toSeq === Seq(7000L, 7001L, 7002L))
    assert(out.forall(_.kind == "image"))
    out.foreach(r => assert(codec.decode(r.data,
      MediaMeta("jpg", 8, 8, 1, 0)).length === 64))
    // non-AVI video payloads keep the deterministic FakeCodec slicing
    val stub = codec.frames(Array.tabulate(100)(_.toByte),
      MediaMeta("bin", 0, 0, 1, 300), everyMs = 100)
    assert(stub.length === 3)
  }

  test("MjpegAvi.parse is adversarially robust: odd-size padding, " +
      "rec-group nesting, missing avih, truncation, hostile sizes") {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length +
          (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def list(typ: String, bodies: Array[Byte]*): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ bodies.flatten)
    def riff(bodies: Array[Byte]*): Array[Byte] = {
      val payload = "AVI ".getBytes("US-ASCII") ++ bodies.flatten
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(payload.length)
        .put(payload)
      bb.array()
    }
    // ODD-size frames force the even-byte padding path; frames nested
    // in a `rec ` group must still be collected in stream order
    val f1 = Array[Byte](1, 2, 3) // odd
    val f2 = Array[Byte](4, 5, 6, 7)
    val f3 = Array[Byte](8) // odd
    val avi = riff(
      list("movi", chunk("00dc", f1),
        list("rec ", chunk("00dc", f2), chunk("01dc", f3))))
    val (us, frames) = MjpegAvi.parse(avi)
    assert(us === 33333L) // no avih -> the documented default rate
    assert(frames.map(_.toSeq) === Vector(f1.toSeq, f2.toSeq, f3.toSeq))
    // non-video chunks (audio 01wb, index idx1, junk) are skipped
    val mixed = riff(list("movi", chunk("01wb", Array[Byte](9, 9)),
      chunk("00dc", f2)), chunk("idx1", Array[Byte](0, 0, 0, 0)))
    assert(MjpegAvi.parse(mixed)._2.map(_.toSeq) === Vector(f2.toSeq))
    // truncated mid-chunk: whatever parsed cleanly survives, no throw
    val cut = avi.take(avi.length - 3)
    assert(MjpegAvi.parse(cut)._2.nonEmpty)
    // hostile size field (0xFFFFFFFF): parser bails without allocating
    val hostile = riff(chunk("00dc", f2))
    val szOff = hostile.length - (8 + f2.length) + 4
    java.nio.ByteBuffer.wrap(hostile, szOff, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(0xFFFFFFFF)
    assert(MjpegAvi.parse(hostile)._2.isEmpty) // clamped, not crashed
    // not-an-AVI guards
    assert(!MjpegAvi.isAvi(Array[Byte](1, 2, 3)))
    assert(!MjpegAvi.isAvi("RIFFxxxxWAVE".getBytes("US-ASCII")))
    // hostile nesting: thousands of nested LIST headers must bail via
    // the depth bound, not overflow the JVM stack
    val deep = new Array[Byte](12 + 5000 * 12)
    System.arraycopy("RIFF".getBytes("US-ASCII"), 0, deep, 0, 4)
    System.arraycopy("AVI ".getBytes("US-ASCII"), 0, deep, 8, 4)
    (0 until 5000).foreach { i =>
      val o = 12 + i * 12
      System.arraycopy("LIST".getBytes("US-ASCII"), 0, deep, o, 4)
      val rest = deep.length - o - 8
      java.nio.ByteBuffer.wrap(deep, o + 4, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(rest)
      System.arraycopy("mov ".getBytes("US-ASCII"), 0, deep, o + 8, 4)
    }
    assert(MjpegAvi.parse(deep)._2.isEmpty) // bounded, no crash
  }

  test("bm25 with alternate tokenizer model ranks differently") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "Interoperability considerations"),
      (2L, "inter op era bili ty"),
      (3L, "cats")).toDF("id", "text")
    val idx = graft.ops.Bm25.build(docs, "id", "text", Tokenizers.Wordpiece)
    assert(idx.tokenizer === "bert_base_uncased")
    val hits = graft.ops.Bm25.search(idx, "interoperability", 3).collect()
    // wordpiece splits the query into <=4-char pieces shared by docs 1+2
    assert(hits.map(_.getAs[Long]("id")).toSet.intersect(Set(1L, 2L)).size === 2)
  }

  test("mmrSelect: first pick is pure relevance, second trades near-dup " +
      "for diversity") {
    // 1 and 2 are near-identical directions; 3 is orthogonal with lower
    // relevance. Pure relevance ranks (1, 2, 3); MMR at λ=0.5 must pick
    // the diverse doc 3 second.
    val cands = Seq(
      (1L, Array(1.0, 0.0), 0.95),
      (2L, Array(0.999, 0.01), 0.94),
      (3L, Array(0.0, 1.0), 0.60))
    val picked = Rerank.mmrSelect(cands, k = 3, lambda = 0.5).map(_._1)
    assert(picked === Seq(1L, 3L, 2L))
    // λ=1 degenerates to relevance order
    val rel = Rerank.mmrSelect(cands, k = 3, lambda = 1.0).map(_._1)
    assert(rel === Seq(1L, 2L, 3L))
  }

  test("mmrSelect matches a naive reference implementation") {
    val rng = new scala.util.Random(7)
    val cands = (1L to 12L).map(i =>
      (i, Array.fill(4)(rng.nextDouble()), rng.nextDouble()))
    def naive(k: Int, lam: Double): Seq[Long] = {
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        if (na == 0 || nb == 0) 0.0
        else a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
      }
      var sel = Vector.empty[(Long, Array[Double], Double)]
      var rest = cands.toVector
      while (sel.length < k && rest.nonEmpty) {
        val best = rest.minBy { d =>
          val ms = if (sel.isEmpty) 0.0 else sel.map(s => cos(d._2, s._2)).max
          (-(lam * d._3 - (1 - lam) * ms), d._1)
        }
        sel :+= best
        rest = rest.filterNot(_._1 == best._1)
      }
      sel.map(_._1)
    }
    for (lam <- Seq(0.3, 0.7, 1.0))
      assert(Rerank.mmrSelect(cands, 8, lam).map(_._1) === naive(8, lam))
  }

  test("mmrBatch diversifies per query group without a driver collect") {
    val sp = spark
    import sp.implicits._
    val rows = for (q <- Seq(10L, 20L); (id, v, rel) <- Seq(
      (1L, Seq(1.0, 0.0), 0.9), (2L, Seq(0.99, 0.01), 0.89),
      (3L, Seq(0.0, 1.0), 0.5))) yield (q, id + q, v, rel)
    val out = Rerank.mmrBatch(rows.toDF("qid", "id", "vec", "rel"),
      "qid", "id", "vec", "rel", k = 2, lambda = 0.5)
    val byQ = out.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap
    assert(byQ(10L) === Seq(11L, 13L)) // diverse doc second, per group
    assert(byQ(20L) === Seq(21L, 23L))
  }

  test("audioFingerprint: hand-computed window bits through the real " +
      "WAV decode, copies collide at hamming 0, one-sample edit " +
      "moves at most one window, unequal tail windows") {
    val sp = spark
    import sp.implicits._
    val codec = WavCodec()
    // 128 samples, 64 windows of exactly 2: first half loud (200),
    // second half quiet (10) -> bits 1 on windows 0..31
    val loud = Array.tabulate(128)(i =>
      (if (i < 64) 200 else 10).toByte)
    // one-sample edit in the quiet half: window 40 only
    val edited = loud.clone(); edited(80) = 255.toByte
    def row(id: Long, s: Array[Byte]) =
      MediaRow(id, "audio", WavCodec.pcmWav(s, 1000f),
        MediaMeta("wav", 0, 0, 1, s.length.toLong))
    val media = Seq(row(1, loud), row(2, loud), row(3, edited)).toDS()
    val sigs = Multimodal.audioFingerprint(media, codec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0 until 32).map(i => 1L << i).reduce(_ | _)
    assert(sigs(1L) === want)
    assert(sigs(2L) === sigs(1L))
    // sample 80 lives in window 80*64/128 = 40; (255+10)/2 > mean
    assert(sigs(3L) === (want | (1L << 40)))
    // the pair join surfaces both the exact copy and the near-dup
    val pairs = graft.ops.Dedup.simHashPairs(
        Multimodal.audioFingerprint(media, codec),
        maxDist = 3, bands = 4)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Int]("hamming"))).sorted
    assert(pairs.toSeq === Seq((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
    // 3 samples over 64 windows: unequal assignment (0,21,42), empty
    // windows stay bit 0, the lone loud sample's window goes high
    val tiny = Array[Byte](0, 120.toByte, 0)
    val t = Multimodal.audioFingerprint(
        Seq(row(9, tiny)).toDS(), codec)
      .collect().head.getLong(1)
    assert(t === (1L << 21))
    intercept[IllegalArgumentException] {
      Multimodal.audioFingerprint(media, codec, windows = 65)
    }
  }
}
