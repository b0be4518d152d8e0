package graft.text

import graft.SparkSpecBase

class ExtractEmbedSpec extends SparkSpecBase {

  test("html extraction drops script/style, keeps text nodes") {
    val html =
      """<html><head><style>body {color: red}</style>
        |<script>var x = "<b>evil</b>";</script></head>
        |<body><h1>Title</h1><p>Para <b>bold</b> text.</p>
        |<!-- comment --><div>  </div><p>&amp; entities &lt;ok&gt;</p>
        |</body></html>""".stripMargin
    val out = Extract.html(html)
    assert(out.contains("Title"))
    assert(out.contains("bold"))
    assert(out.contains("& entities <ok>"))
    assert(!out.contains("color"))
    assert(!out.contains("evil"))
    assert(!out.contains("comment"))
  }

  test("extract dispatches on extension and NFKC-normalizes") {
    val txt = "ﬁle ①".getBytes("UTF-8") // ligature + circled digit
    assert(Extract.extract(".txt", txt) === "file 1")
    assert(Extract.extract(".weird", "x".getBytes("UTF-8")) === "")
    val html = "<p>hi</p>".getBytes("UTF-8")
    assert(Extract.extract(".html", html) === "hi")
  }

  test("hash embedder is deterministic, unit-norm, dimension-correct") {
    val e = HashEmbedder(dim = 64)
    val v1 = e.embedChunk("the quick brown fox")
    val v2 = e.embedChunk("the quick brown fox")
    assert(v1.toSeq === v2.toSeq)
    assert(v1.length === 64)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // different text -> different vector
    assert(e.embedChunk("totally different words").toSeq !== v1.toSeq)
    // empty text -> zero vector, not NaN
    assert(e.embedChunk("").forall(_ == 0f))
  }

  test("similar texts embed closer than dissimilar ones") {
    val e = HashEmbedder(dim = 64)
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val base = e.embedChunk("spark sql query engine with joins")
    val near = e.embedChunk("spark sql query engine with windows")
    val far = e.embedChunk("completely unrelated cooking recipe list")
    assert(cos(base, near) > cos(base, far))
  }

  test("frame-level embedding stage adds a vector column") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "hello world"), (2L, "foo bar")).toDF("id", "text")
    val out = Embed.withEmbedding(df, "text", "vec", HashEmbedder(dim = 16))
    val rows = out.collect()
    assert(rows.forall(_.getSeq[Float](2).length === 16))
  }

  test("ocr provider seat is deterministic on payload bytes") {
    val ocr = StubOcrExtractor()
    val d = "payload".getBytes("UTF-8")
    assert(ocr.extractPdf(d) === ocr.extractPdf(d.clone()))
    assert(ocr.extractPdf(d) !== ocr.extractImage(d))
    assert(ocr.extractPdf(d).endsWith("7 bytes"))
  }

  test("poller returns on success and times out at the deadline") {
    var clock = 0L
    var slept = Vector.empty[Long]
    val p = new Poller(deadlineMs = 20L, intervalMs = 5L,
      now = () => clock, sleep = ms => { slept :+= ms; clock += ms })
    var calls = 0
    val got = p.await { () =>
      calls += 1; if (calls == 3) Some("done") else None
    }
    assert(got === "done" && slept === Vector(5L, 5L))
    clock = 0L
    intercept[java.util.concurrent.TimeoutException] {
      new Poller(deadlineMs = 20L, intervalMs = 5L,
        now = () => clock, sleep = ms => clock += ms)
        .await[String] { () => None }
    }
  }
}
