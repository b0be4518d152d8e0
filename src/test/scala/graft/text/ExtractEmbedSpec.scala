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

  // hand-authored minimal PDF: catalog/pages/page + one content stream
  private def fixturePdf(stream: String, filter: String = ""): Array[Byte] = {
    val body = if (filter == "/FlateDecode") {
      val d = new java.util.zip.Deflater()
      d.setInput(stream.getBytes("ISO-8859-1")); d.finish()
      val buf = new Array[Byte](8192)
      val n = d.deflate(buf); d.end()
      new String(buf, 0, n, "ISO-8859-1")
    } else stream
    val filt = if (filter.nonEmpty) s" /Filter $filter" else ""
    (s"""%PDF-1.4
       |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
       |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
       |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
       |4 0 obj << /Length ${body.length}$filt >>
       |stream
       |$body
       |endstream endobj
       |trailer << /Root 1 0 R >>
       |%%EOF""".stripMargin).getBytes("ISO-8859-1")
  }

  test("pdf extraction: literal content stream, Tj/TJ/escapes/hex") {
    val content = "BT /F1 12 Tf 72 712 Td (Hello \\(PDF\\) World) Tj " +
      "0 -14 Td [(spl) -20 (it array)] TJ " +
      "0 -14 Td <48657821> Tj ET"
    val text = Extract.pdf(fixturePdf(content))
    assert(text.contains("Hello (PDF) World"))
    assert(text.contains("split array")) // TJ pieces concatenate
    assert(text.contains("Hex!"))        // hex string decodes
    // Td line moves separate the shows
    assert(text.linesIterator.size >= 3)
  }

  test("pdf extraction: FlateDecode stream and octal escapes") {
    val content = "BT (Compressed \\164ext) Tj ET" // \164 = 't'
    val text = Extract.pdf(fixturePdf(content, "/FlateDecode"))
    assert(text === "Compressed text")
    // dispatch integration + NFKC
    assert(Extract.extract(".pdf",
      fixturePdf(content, "/FlateDecode")) === "Compressed text")
  }

  test("pdf extraction: CID/Type0 font with Identity-H ToUnicode CMap") {
    def flate(s: String): String = {
      val d = new java.util.zip.Deflater()
      d.setInput(s.getBytes("ISO-8859-1")); d.finish()
      val buf = new Array[Byte](8192)
      val n = d.deflate(buf); d.end()
      new String(buf, 0, n, "ISO-8859-1")
    }
    // bfchar 0001->H 0002->e; scalar bfrange 0003..0004 -> l,m;
    // array bfrange 0010->o 0011->'!'
    val cmap = flate(
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0001> <0048>
        |<0002> <0065>
        |endbfchar
        |2 beginbfrange
        |<0003> <0004> <006C>
        |<0010> <0011> [<006F> <0021>]
        |endbfrange
        |endcmap
        |end""".stripMargin)
    // hex string = CIDs 0001 0002 0003 0003 0010 0011 -> "Hello!";
    // literal string with raw 2-byte CIDs 0001 0002 -> "He"
    val content = "BT /F1 12 Tf <00010002000300030010 0011> Tj " +
      "0 -14 Td (\u0000\u0001\u0000\u0002) Tj ET"
    val pdf = (s"""%PDF-1.4
      |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
      |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
      |3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> /Contents 6 0 R >> endobj
      |4 0 obj << /Type /Font /Subtype /Type0 /BaseFont /TestCID /Encoding /Identity-H /ToUnicode 5 0 R >> endobj
      |5 0 obj << /Length ${cmap.length} /Filter /FlateDecode >>
      |stream
      |$cmap
      |endstream endobj
      |6 0 obj << /Length ${content.length} >>
      |stream
      |$content
      |endstream endobj
      |trailer << /Root 1 0 R >>
      |%%EOF""".stripMargin).getBytes("ISO-8859-1")
    val text = Extract.pdf(pdf)
    assert(text.linesIterator.toSeq === Seq("Hello!", "He"), text)
  }

  test("pdf extraction: font dicts packed in an /ObjStm still resolve") {
    def flate(s: String): String = {
      val d = new java.util.zip.Deflater()
      d.setInput(s.getBytes("ISO-8859-1")); d.finish()
      val buf = new Array[Byte](8192)
      val n = d.deflate(buf); d.end()
      new String(buf, 0, n, "ISO-8859-1")
    }
    val cmap = flate(
      """begincmap
        |1 beginbfchar
        |<0001> <0048>
        |endbfchar
        |1 beginbfrange
        |<0002> <0003> <0069>
        |endbfrange
        |endcmap""".stripMargin)
    // page (obj 3) and Type0 font (obj 4) packed into ObjStm obj 8:
    // header = "3 0 4 <off>", bodies back-to-back after /First
    val o3 = "<< /Type /Page /Resources << /Font << /F1 4 0 R >> >> /Contents 6 0 R >>\n"
    val o4 = "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H /ToUnicode 5 0 R >>\n"
    val header = s"3 0 4 ${o3.length} "
    val stm = flate(header + o3 + o4)
    // CIDs 0001 0002 -> "Hi"
    val content = "BT /F1 12 Tf <00010002> Tj ET"
    val pdf = (s"""%PDF-1.5
      |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
      |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
      |8 0 obj << /Type /ObjStm /N 2 /First ${header.length} /Length ${stm.length} /Filter /FlateDecode >>
      |stream
      |$stm
      |endstream endobj
      |5 0 obj << /Length ${cmap.length} /Filter /FlateDecode >>
      |stream
      |$cmap
      |endstream endobj
      |6 0 obj << /Length ${content.length} >>
      |stream
      |$content
      |endstream endobj
      |trailer << /Root 1 0 R >>
      |%%EOF""".stripMargin).getBytes("ISO-8859-1")
    assert(Extract.pdf(pdf) === "Hi")
  }

  // --- encrypted fixtures: standard security handler, empty user pw ---

  /** Independent spec-derived key schedule (PDF 1.7 Algorithms 1+2) so
    * the fixture encrypts with its own derivation, not the extractor's. */
  private def fileKey(o: Array[Byte], p: Int, id0: Array[Byte], r: Int,
                      lenBits: Int): Array[Byte] = {
    val pad = Array(0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64,
      0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6,
      0xD0, 0x68, 0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69,
      0x7A).map(_.toByte)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(pad); md.update(o)
    md.update(Array[Byte](p.toByte, (p >> 8).toByte, (p >> 16).toByte,
      (p >>> 24).toByte))
    md.update(id0)
    val n = if (r == 2) 5 else lenBits / 8
    var key = md.digest().take(n)
    if (r >= 3) (0 until 50).foreach { _ =>
      key = java.security.MessageDigest.getInstance("MD5").digest(key).take(n)
    }
    key
  }

  private def objKey(key: Array[Byte], num: Int, aes: Boolean): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(key)
    md.update(Array[Byte](num.toByte, (num >> 8).toByte, (num >> 16).toByte,
      0, 0))
    if (aes) md.update(Array[Byte](0x73, 0x41, 0x6c, 0x54))
    md.digest().take(math.min(key.length + 5, 16))
  }

  private def encryptedPdf(content: String, r: Int, lenBits: Int,
                           aes: Boolean): Array[Byte] = {
    val o = Array.tabulate(32)(i => (i * 7 + 3).toByte) // arbitrary /O
    val id0 = Array.tabulate(16)(i => (i * 11 + 5).toByte)
    val p = -44
    val key = fileKey(o, p, id0, r, lenBits)
    val ok = objKey(key, 4, aes)
    val enc: Array[Byte] =
      if (aes) {
        val iv = Array.tabulate(16)(i => (i * 13 + 1).toByte)
        val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(ok, "AES"),
          new javax.crypto.spec.IvParameterSpec(iv))
        iv ++ c.doFinal(content.getBytes("ISO-8859-1"))
      } else {
        val c = javax.crypto.Cipher.getInstance("ARCFOUR")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(ok, "ARCFOUR"))
        c.doFinal(content.getBytes("ISO-8859-1"))
      }
    val body = new String(enc, "ISO-8859-1")
    val oHex = o.map("%02X".format(_)).mkString
    val idHex = id0.map("%02X".format(_)).mkString
    val v = if (r == 2) 1 else if (r == 3) 2 else 4
    val cf = if (aes)
      " /CF << /StdCF << /CFM /AESV2 >> >> /StmF /StdCF" else ""
    (s"""%PDF-1.6
       |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
       |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
       |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
       |4 0 obj << /Length ${body.length} >>
       |stream
       |$body
       |endstream endobj
       |5 0 obj << /Filter /Standard /V $v /R $r /Length $lenBits$cf
       | /O <$oHex> /U <00000000000000000000000000000000> /P $p >> endobj
       |trailer << /Root 1 0 R /Encrypt 5 0 R /ID [<$idHex> <$idHex>] >>
       |%%EOF""".stripMargin).getBytes("ISO-8859-1")
  }

  test("pdf extraction: RC4-encrypted (R3, 128-bit), empty user pw") {
    val pdf = encryptedPdf("BT (Locked but mine) Tj ET", r = 3,
      lenBits = 128, aes = false)
    assert(Extract.pdf(pdf) === "Locked but mine")
  }

  test("pdf extraction: RC4-encrypted (R2, 40-bit) legacy handler") {
    val pdf = encryptedPdf("BT (Old crypt) Tj ET", r = 2,
      lenBits = 40, aes = false)
    assert(Extract.pdf(pdf) === "Old crypt")
  }

  test("pdf extraction: AES-128 /AESV2 (R4) with IV-prefixed stream") {
    val pdf = encryptedPdf("BT (Modern lock) Tj ET", r = 4,
      lenBits = 128, aes = true)
    assert(Extract.pdf(pdf) === "Modern lock")
  }

  /** Spec-derived Algorithm 2.B (independent of the extractor's). */
  private def alg2B(pwd: Array[Byte], salt: Array[Byte],
                    r: Int): Array[Byte] = {
    var k = java.security.MessageDigest.getInstance("SHA-256")
      .digest(pwd ++ salt)
    if (r == 5) return k
    var round = 0
    var done = false
    while (!done) {
      val k1 = Array.fill(64)(pwd ++ k).flatten
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
        new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
      val e = c.doFinal(k1)
      val alg = (e.take(16).map(_ & 0xff).sum % 3) match {
        case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512"
      }
      k = java.security.MessageDigest.getInstance(alg).digest(e)
      round += 1
      done = round >= 64 && (e.last & 0xff) <= round - 32
    }
    k.take(32)
  }

  private def encryptedPdf256(content: String, r: Int): Array[Byte] = {
    val fileKey = Array.tabulate(32)(i => (i * 17 + 9).toByte)
    val valSalt = Array.tabulate(8)(i => (i * 3 + 1).toByte)
    val keySalt = Array.tabulate(8)(i => (i * 5 + 2).toByte)
    val uHash = alg2B(Array.emptyByteArray, valSalt, r)
    val ik = alg2B(Array.emptyByteArray, keySalt, r)
    val cUe = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    cUe.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(ik, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    val ue = cUe.doFinal(fileKey)
    val iv = Array.tabulate(16)(i => (i * 13 + 1).toByte)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(fileKey, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    val body = new String(iv ++ c.doFinal(content.getBytes("ISO-8859-1")),
      "ISO-8859-1")
    val uHex = (uHash ++ valSalt ++ keySalt).map("%02X".format(_)).mkString
    val ueHex = ue.map("%02X".format(_)).mkString
    (s"""%PDF-1.7
       |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
       |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
       |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
       |4 0 obj << /Length ${body.length} >>
       |stream
       |$body
       |endstream endobj
       |5 0 obj << /Filter /Standard /V 5 /R $r /Length 256
       | /CF << /StdCF << /CFM /AESV3 >> >> /StmF /StdCF
       | /O <00> /OE <00> /U <$uHex> /UE <$ueHex> /P -44 >> endobj
       |trailer << /Root 1 0 R /Encrypt 5 0 R >>
       |%%EOF""".stripMargin).getBytes("ISO-8859-1")
  }

  test("pdf extraction: AES-256 /AESV3 (R6), empty user pw") {
    val pdf = encryptedPdf256("BT (Vault six) Tj ET", r = 6)
    assert(Extract.pdf(pdf) === "Vault six")
  }

  test("pdf extraction: AES-256 (R5 legacy) and a real password locks") {
    val pdf = encryptedPdf256("BT (Vault five) Tj ET", r = 5)
    assert(Extract.pdf(pdf) === "Vault five")
    // flip a validation-salt byte => empty-password check fails =>
    // no key, no plaintext leaks
    val tampered = new String(encryptedPdf256("BT (Nope) Tj ET", r = 6),
      "ISO-8859-1")
    val at = tampered.indexOf("/U <") + 4
    val flipped = tampered.substring(0, at + 64) +
      (if (tampered.charAt(at + 64) == '0') "1" else "0") +
      tampered.substring(at + 65)
    assert(!Extract.pdf(flipped.getBytes("ISO-8859-1")).contains("Nope"))
  }

  test("pdf extraction: /ID inside an earlier stream body does not " +
      "derail RC4 key derivation") {
    val pdf = encryptedPdf("BT (Anchored) Tj ET", r = 3,
      lenBits = 128, aes = false)
    // prepend a decoy object whose stream carries '/ID [<00>]' bytes —
    // the trailer /ID must still win (reverse-anchored scan)
    val s = new String(pdf, "ISO-8859-1")
    val decoy = "9 0 obj << /Length 12 >>\nstream\n/ID [<0000>]\nendstream endobj\n"
    val at = s.indexOf("1 0 obj")
    val withDecoy = s.substring(0, at) + decoy + s.substring(at)
    assert(Extract.pdf(withDecoy.getBytes("ISO-8859-1")) === "Anchored")
  }

  test("pdf extraction: Identity-H CID font WITHOUT ToUnicode decodes " +
      "via the UTF-16 heuristic") {
    val pdf = (s"""%PDF-1.6
      |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
      |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
      |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R
      | /Resources << /Font << /F7 6 0 R >> >> >> endobj
      |4 0 obj << /Length 44 >>
      |stream
      |BT /F7 12 Tf <0048006500780079> Tj ET
      |endstream endobj
      |6 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Sub-CID
      | /Encoding /Identity-H >> endobj
      |trailer << /Root 1 0 R >>
      |%%EOF""".stripMargin).getBytes("ISO-8859-1")
    assert(Extract.pdf(pdf) === "Hexy")
  }

  test("pdf extraction: non-PDF bytes and image streams yield nothing") {
    assert(Extract.pdf("not a pdf".getBytes("UTF-8")) === "")
    val img = ("%PDF-1.4\n5 0 obj << /Subtype /Image /Length 4 >>\n" +
      "stream\n\nendstream endobj\n%%EOF")
      .getBytes("ISO-8859-1")
    assert(Extract.pdf(img) === "")
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

  test("md5 embedder: integer components, engine-portable hash recipe") {
    val e = Md5Embedder(dim = 64)
    val v1 = e.embedChunk("the quick brown fox")
    assert(v1.toSeq === e.embedChunk("the quick brown fox").toSeq)
    assert(v1.length === 64)
    // every component is an exact small integer (the bit-reproducible
    // cosine contract) and at least one is nonzero
    assert(v1.forall(x => x == math.rint(x)))
    assert(v1.exists(_ != 0f))
    // pin one feature against the documented recipe:
    // md5("fox") = 2b95d1f09b8b66c5c43622a4d9ec9a04 -> h = 0x2b95d1f0,
    // bucket = (h/2) % 64, sign = +1 (h even)
    val h = java.lang.Long.parseLong("2b95d1f0", 16)
    val vFox = e.embedChunk("fox")
    assert(vFox(((h >>> 1) % 64).toInt) === 1f)
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
