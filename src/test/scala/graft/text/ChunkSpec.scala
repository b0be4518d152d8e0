package graft.text

import graft.SparkSpecBase

/** RegexChunker parity: fixtures in chunk_fixtures.json were produced by
  * executing the reference implementation
  * (/root/reference/vechord/chunk.py:20-83) over synthetic inputs at
  * several (size, overlap) settings; the port must match exactly.
  * Plus property-style bound checks (SURVEY §5).
  */
class ChunkSpec extends SparkSpecBase {

  private lazy val fixtures: Seq[(Int, Int, String, Seq[String])] = {
    val path = getClass.getResource("/chunk_fixtures.json").getPath
    spark.read.option("multiLine", "true").json(path)
      .select("size", "overlap", "text", "chunks")
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getString(2),
        r.getSeq[String](3).toSeq)).toSeq
  }

  test("matches the reference implementation on all fixtures") {
    assert(fixtures.nonEmpty)
    fixtures.foreach { case (size, overlap, text, expected) =>
      val got = RegexChunker(size = size, overlap = overlap).segment(text)
      assert(got === expected,
        s"mismatch at size=$size overlap=$overlap text=${text.take(40)}")
    }
  }

  test("chunks cover all content pieces in order") {
    val c = RegexChunker(size = 25, overlap = 8)
    val text = "alpha. bravo! gamma; delta\nechoes. zulu. kilo. momo"
    val pieces = text.split("[\\n\\r\\f\\x0B\\t?!.;]+").map(_.strip)
      .filter(_.nonEmpty)
    val joined = c.segment(text).mkString(". ")
    pieces.foreach(p => assert(joined.contains(p), s"piece '$p' lost"))
    // order preserved: indices of pieces are non-decreasing
    val idxs = pieces.map(joined.indexOf(_))
    assert(idxs.sameElements(idxs.sorted))
  }

  test("no chunk wildly exceeds size unless a single piece does") {
    val c = RegexChunker(size = 30, overlap = 10)
    val text = ("short bit. " * 40).trim
    c.segment(text).foreach { ch =>
      assert(ch.length <= 30 + 2 * 11,
        s"chunk too long (${ch.length}): $ch")
    }
  }

  test("empty and whitespace-only inputs yield no chunks") {
    val c = RegexChunker()
    assert(c.segment("") === Seq.empty)
    assert(c.segment(" \n\t  ") === Seq.empty)
  }

  test("default configuration name matches reference naming") {
    assert(RegexChunker().name === "regex_chunk_1536_200")
  }

  test("sentence chunker splits on sentence boundaries") {
    val s = SentenceChunker()
    val out = s.segment("First sentence. Second one! And a third?")
    assert(out === Seq("First sentence.", "Second one!", "And a third?"))
  }
}
