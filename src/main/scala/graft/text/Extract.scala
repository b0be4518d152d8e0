package graft.text

import java.nio.charset.StandardCharsets
import java.text.Normalizer

/** Document extraction — port of the reference's SimpleExtractor
  * (/root/reference/vechord/extract.py:18-88): extension dispatch
  * (.txt/.pdf/.html), script/style-skipping HTML text extraction, and
  * NFKC normalization of every result (extract.py:52-62).
  */
object Extract {

  /** NFKC unicode normalization (extract.py:62). */
  def nfkc(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFKC)

  private val ScriptStyle =
    "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>".r
  private val Comment = "(?s)<!--.*?-->".r
  private val Tag = "(?s)<[^>]*>".r
  private val Entities = Map(
    "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")

  private def decodeEntities(s: String): String =
    Entities.foldLeft(s) { case (acc, (k, v)) => acc.replace(k, v) }

  /** HTML → text: drop script/style subtrees and comments, strip tags,
    * keep each text node stripped, join non-empty nodes with "\n"
    * (extract.py:18-36,80-88 semantics). */
  def html(text: String): String = {
    val noScript = ScriptStyle.replaceAllIn(text, "")
    val noComment = Comment.replaceAllIn(noScript, "")
    Tag.split(noComment).iterator
      .map(t => decodeEntities(t).strip())
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  /** PDF text extraction — minimal pure-JVM implementation of the seat
    * the reference fills with pdfium (extract.py:71-78). Handles the
    * common classic-layout PDF class: literal and FlateDecode-compressed
    * content streams, text shown via Tj / ' / " / TJ with literal
    * `(...)` (escape + octal) and hex `<...>` strings, single-byte
    * encodings, AND CID/Type0 composite fonts with a /ToUnicode CMap
    * (the Identity-H case every mainstream generator emits): 2-byte
    * CIDs map through the font's bfchar/bfrange entries, tracked per
    * content stream via the page /Font resources and Tf operators.
    * Structure objects packed into /ObjStm object streams (the PDF 1.5+
    * compressed layout every modern generator emits) are expanded, so
    * fonts and resources defined there resolve too. Standard-security-
    * handler encryption decrypts under the EMPTY user password — the
    * owner-locked class that dominates encrypted PDFs in web corpora:
    * R2-R4 (RC4 40/128-bit, AES-128 /AESV2) and R5/R6 (AES-256 /AESV3,
    * Algorithm 2.B key derivation). Identity-H CID fonts WITHOUT a
    * ToUnicode CMap fall back to decoding CIDs as UTF-16 code units
    * ([[CidIdentity]] — exact for CID==Unicode subset fonts). Out of
    * scope (returns whatever text IS recoverable): files with a real
    * user password, image-only pages — the full renderer remains a
    * swap-in point. Per-stream texts join with "\n" like the
    * reference's per-page join. */
  def pdf(data: Array[Byte]): String = {
    // latin-1 maps bytes 1:1 to chars, so string indices == byte offsets
    val raw = new String(data, StandardCharsets.ISO_8859_1)
    if (!raw.startsWith("%PDF")) return ""
    val top = parseObjects(raw)
    val crypt = detectCrypt(raw, top)
    def decoded(o: PObj): Option[String] = o.body.flatMap { b =>
      val bytes0 = b.getBytes(StandardCharsets.ISO_8859_1)
      // standard-security-handler stream decryption (XRef streams are
      // never encrypted per spec; they carry no text and are skipped)
      val bytes = crypt match {
        case Some(c) if !o.dict.contains("/XRef") =>
          c.decrypt(o.num, o.gen, bytes0)
        case _ => bytes0
      }
      if (o.dict.contains("/FlateDecode")) Some(inflate(bytes))
      else if (!o.dict.contains("/Filter"))
        Some(new String(bytes, StandardCharsets.ISO_8859_1))
      else None // unsupported filter (DCT, LZW, ...)
    }
    val objs = expandObjStm(top, decoded)
    val byNum = objs.map(o => o.num -> o).toMap
    // ToUnicode CMap streams of Type0 fonts, keyed by their obj number
    val toUniRef = "/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R".r
    val cmapByObj: Map[Int, Map[Int, String]] = objs
      .filter(_.dict.contains("/Type0"))
      .flatMap(f => toUniRef.findFirstMatchIn(f.dict))
      .map(_.group(1).toInt).distinct
      .flatMap(n => byNum.get(n).flatMap(decoded).map(n -> parseCMap(_)))
      .toMap
    val fonts = collectFonts(objs, byNum, cmapByObj)
    // never treat CMaps / embedded font programs / metadata as content
    val skip: Set[Int] = cmapByObj.keySet ++ objs.filter(o =>
      o.dict.contains("/FontFile") || o.dict.contains("/Metadata") ||
        o.dict.contains("/ObjStm") || o.dict.contains("/XRef") ||
        o.dict.contains("/Image")).map(_.num)
    val out = new StringBuilder
    objs.foreach { o =>
      if (o.body.isDefined && !skip(o.num)) {
        decoded(o).foreach { body =>
          if (body.nonEmpty) {
            val t = contentText(body, fonts)
            if (t.nonEmpty) {
              if (out.nonEmpty) out.append('\n')
              out.append(t)
            }
          }
        }
      }
    }
    out.toString.strip
  }

  private final case class PObj(num: Int, dict: String,
                                body: Option[String], gen: Int = 0)

  /** Split the raw file into `N G obj ... endobj` objects (classic
    * cross-reference layout; objects inside /ObjStm containers are not
    * unpacked). */
  private def parseObjects(raw: String): Vector[PObj] = {
    val res = Vector.newBuilder[PObj]
    val m = java.util.regex.Pattern.compile("(\\d+)\\s+(\\d+)\\s+obj\\b")
      .matcher(raw)
    while (m.find()) {
      val num = m.group(1).toInt
      val gen = m.group(2).toInt
      val start = m.end()
      val endObj = raw.indexOf("endobj", start)
      val end = if (endObj < 0) raw.length else endObj
      val streamAt = raw.indexOf("stream", start)
      if (streamAt >= 0 && streamAt < end &&
          !(streamAt >= 3 && raw.regionMatches(streamAt - 3, "end", 0, 3))) {
        val dict = raw.substring(start, streamAt)
        val bodyStart = streamAt + 6 +
          (if (raw.startsWith("\r\n", streamAt + 6)) 2
           else if (raw.startsWith("\n", streamAt + 6)) 1 else 0)
        val endStream = raw.indexOf("endstream", bodyStart)
        val bodyEnd = if (endStream < 0) end else endStream
        res += PObj(num, dict,
          Some(raw.substring(bodyStart, math.max(bodyStart, bodyEnd))), gen)
      } else res += PObj(num, raw.substring(start, end), None, gen)
    }
    res.result()
  }

  /** The standard security handler's 32-byte password pad (PDF 1.7,
    * 7.6.3.3). An EMPTY user password — the owner-locked PDFs mass
    * corpora are full of — pads to exactly this constant. */
  private val PasswordPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private sealed trait PdfCrypt {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte]
  }

  /** IV-prefixed AES-CBC decrypt with manual PKCS#5 pad strip (shared
    * by /AESV2 object keys and /AESV3 file keys). */
  private def aesCbcDecrypt(key: Array[Byte],
                            data: Array[Byte]): Array[Byte] =
    try {
      if (data.length < 32) return Array.emptyByteArray
      val body = data.drop(16).take((data.length - 16) / 16 * 16)
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(data.take(16)))
      val out = c.doFinal(body)
      val pad = out.last & 0xff
      if (pad >= 1 && pad <= 16 && pad <= out.length) out.dropRight(pad)
      else out
    } catch { case _: java.security.GeneralSecurityException =>
      Array.emptyByteArray }

  /** RC4 / AES-128 stream decryption for the standard security handler
    * (R2-R4) under the empty user password. `fileKey` is the Algorithm-2
    * file key; per-object keys follow Algorithm 1 (MD5 over key + objnum
    * LE24 + gennum LE16, + the AES salt for /AESV2, truncated to
    * min(n+5, 16)). AES payloads carry their IV in the first 16 bytes
    * (CBC, PKCS#5 pad stripped). */
  private final case class PdfCryptRc4(fileKey: Array[Byte], aes: Boolean)
      extends PdfCrypt {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(fileKey)
      md.update(Array[Byte]((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
        ((num >> 16) & 0xff).toByte, (gen & 0xff).toByte,
        ((gen >> 8) & 0xff).toByte))
      if (aes) md.update(Array[Byte](0x73, 0x41, 0x6c, 0x54))
      val objKey = md.digest().take(math.min(fileKey.length + 5, 16))
      if (aes) aesCbcDecrypt(objKey, data)
      else try {
        val c = javax.crypto.Cipher.getInstance("ARCFOUR")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(objKey, "ARCFOUR"))
        c.doFinal(data)
      } catch { case _: java.security.GeneralSecurityException =>
        Array.emptyByteArray }
    }
  }

  /** AES-256 (R5/R6 /AESV3) stream decryption: the 32-byte file key is
    * used DIRECTLY (no per-object derivation, PDF 2.0 7.6.3.3). */
  private final case class PdfCryptAes256(fileKey: Array[Byte])
      extends PdfCrypt {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      aesCbcDecrypt(fileKey, data)
  }

  /** PDF 2.0 Algorithm 2.B password hash (R6; R5 is the plain SHA-256
    * prefix): iterate AES-128-CBC(K[0..16), iv=K[16..32)) over
    * (password ‖ K) ×64, picking SHA-256/384/512 by the first 16 bytes
    * mod 3, at least 64 rounds, until lastByte(E) <= round − 32. */
  private def hash2B(password: Array[Byte], salt: Array[Byte],
                     r: Int): Array[Byte] = {
    var k = java.security.MessageDigest.getInstance("SHA-256")
      .digest(password ++ salt)
    if (r == 5) return k
    var round = 0
    var done = false
    while (!done) {
      val base = password ++ k
      val k1 = Array.fill(64)(base).flatten
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
        new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
      val e = c.doFinal(k1)
      val alg = (e.take(16).map(_ & 0xff).sum % 3) match {
        case 0 => "SHA-256"
        case 1 => "SHA-384"
        case _ => "SHA-512"
      }
      k = java.security.MessageDigest.getInstance(alg).digest(e)
      round += 1
      done = round >= 64 && (e.last & 0xff) <= round - 32
    }
    k.take(32)
  }

  /** A PDF string value following `key` in dict text `d`: literal
    * `(...)` with escapes/octal, or hex `<...>`. */
  private def dictString(d: String, key: String): Option[Array[Byte]] = {
    var i = d.indexOf(key)
    while (i >= 0) {
      var j = i + key.length
      while (j < d.length && d(j).isWhitespace) j += 1
      if (j < d.length && d(j) == '(') {
        val sb = new scala.collection.mutable.ArrayBuffer[Byte]
        var depth = 1; var k = j + 1
        while (k < d.length && depth > 0) {
          d(k) match {
            case '\\' if k + 1 < d.length =>
              d(k + 1) match {
                case 'n' => sb += '\n'.toByte; k += 2
                case 'r' => sb += '\r'.toByte; k += 2
                case 't' => sb += '\t'.toByte; k += 2
                case 'b' => sb += '\b'.toByte; k += 2
                case 'f' => sb += '\f'.toByte; k += 2
                case c if c >= '0' && c <= '7' =>
                  var v = 0; var cnt = 0; k += 1
                  while (cnt < 3 && k < d.length && d(k) >= '0' &&
                    d(k) <= '7') { v = v * 8 + (d(k) - '0'); k += 1; cnt += 1 }
                  sb += v.toByte
                case c => sb += c.toByte; k += 2
              }
            case '(' => depth += 1; sb += '('.toByte; k += 1
            case ')' =>
              depth -= 1; if (depth > 0) sb += ')'.toByte; k += 1
            case c => sb += c.toByte; k += 1
          }
        }
        return Some(sb.toArray)
      } else if (j < d.length && d(j) == '<' &&
          (j + 1 >= d.length || d(j + 1) != '<')) {
        val close = d.indexOf('>', j)
        if (close > j) {
          val hex = d.substring(j + 1, close)
            .filter(c => Character.digit(c, 16) >= 0)
          val padded = if (hex.length % 2 == 1) hex + "0" else hex
          return Some(padded.grouped(2)
            .map(h => Integer.parseInt(h, 16).toByte).toArray)
        }
      }
      i = d.indexOf(key, i + 1)
    }
    None
  }

  /** The trailer's /ID[0]: matches of `/ID\s*[` scanned from the END of
    * the file (the trailer lives there), taking the first that parses
    * to a string — so "/ID" bytes inside an earlier stream body or an
    * /IDTree name never win (they either don't match the anchored
    * pattern or don't parse an array). */
  private def trailerId0(raw: String): Array[Byte] =
    "/ID\\s*\\[".r.findAllMatchIn(raw).toSeq.reverseIterator
      .flatMap { mm =>
        dictString(raw.substring(mm.start,
          math.min(mm.start + 200, raw.length)), "[")
      }
      .nextOption()
      .getOrElse(Array.emptyByteArray)

  /** Detect a /Standard /Encrypt dict and derive the empty-user-password
    * file key. R2-R4: PDF 1.7 Algorithm 2 — MD5(pad ‖ O[0..32) ‖ P as
    * LE32 ‖ ID[0] ‖ [FFFFFFFF when R4 skips metadata]), truncated to
    * Length/8 (5 bytes for R2), re-hashed 50× for R3+. R5/R6 (AES-256
    * /AESV3): the Algorithm 2.B hash of the empty password against /U's
    * validation salt must match /U's hash (else a real password is set
    * and the file stays undecrypted), then the file key is /UE
    * decrypted with the key-salt hash (AES-256-CBC, zero IV).
    * Non-Standard handlers return None — extraction yields whatever
    * plaintext exists. */
  private def detectCrypt(raw: String, objs: Vector[PObj]): Option[PdfCrypt] = {
    val byNum = objs.map(o => o.num -> o).toMap
    for {
      m <- "/Encrypt\\s+(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(raw)
      o <- byNum.get(m.group(1).toInt)
      d = o.dict
      if d.contains("/Standard")
      r = "/R\\s+(\\d+)".r.findFirstMatchIn(d)
        .map(_.group(1).toInt).getOrElse(2)
      crypt <- if (r >= 2 && r <= 4) cryptClassic(raw, d, r)
               else if (r == 5 || r == 6) cryptAes256(d, r)
               else None
    } yield crypt
  }

  private def cryptClassic(raw: String, d: String,
                           r: Int): Option[PdfCrypt] =
    dictString(d, "/O").map { oBytes =>
      val id0 = trailerId0(raw)
      val p = "/P\\s+(-?\\d+)".r.findFirstMatchIn(d)
        .map(_.group(1).toLong).getOrElse(-1L).toInt
      val len = "/Length\\s+(\\d+)".r.findFirstMatchIn(d)
        .map(_.group(1).toInt).getOrElse(40)
      val skipMeta = r >= 4 && "/EncryptMetadata\\s+false".r
        .findFirstIn(d).isDefined
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(PasswordPad)
      md.update(oBytes.take(32))
      md.update(Array[Byte]((p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
        ((p >> 16) & 0xff).toByte, ((p >>> 24) & 0xff).toByte))
      md.update(id0)
      if (skipMeta)
        md.update(Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte,
          0xff.toByte))
      val keyLen = if (r == 2) 5 else math.max(5, math.min(16, len / 8))
      var key = md.digest().take(keyLen)
      if (r >= 3)
        for (_ <- 0 until 50)
          key = java.security.MessageDigest.getInstance("MD5")
            .digest(key).take(keyLen)
      PdfCryptRc4(key, r >= 4 && d.contains("/AESV2"))
    }

  private def cryptAes256(d: String, r: Int): Option[PdfCrypt] =
    for {
      u <- dictString(d, "/U")
      ue <- dictString(d, "/UE")
      if u.length >= 48 && ue.length >= 32
      valSalt = u.slice(32, 40)
      keySalt = u.slice(40, 48)
      // empty-password validation: wrong hash = a real user password
      if hash2B(Array.emptyByteArray, valSalt, r)
        .sameElements(u.take(32))
      fileKey <- try {
        val ik = hash2B(Array.emptyByteArray, keySalt, r)
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(ik, "AES"),
          new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
        Some(c.doFinal(ue.take(32)))
      } catch { case _: java.security.GeneralSecurityException => None }
    } yield PdfCryptAes256(fileKey)

  /** Expand /ObjStm object streams: the decoded stream starts with N
    * (objnum, offset) integer pairs, then the bare objects back-to-back
    * from /First. The unpacked dicts join the object list (stream-less
    * by spec), so fonts/resources packed there resolve normally. */
  private def expandObjStm(objs: Vector[PObj],
      decoded: PObj => Option[String]): Vector[PObj] = {
    val intRef = "(\\d+)".r
    val packed = objs.filter(_.dict.contains("/ObjStm")).flatMap { o =>
      decoded(o).toSeq.flatMap { s =>
        val n = "/N\\s+(\\d+)".r.findFirstMatchIn(o.dict)
          .map(_.group(1).toInt).getOrElse(0)
        val first = "/First\\s+(\\d+)".r.findFirstMatchIn(o.dict)
          .map(_.group(1).toInt).getOrElse(0)
        val header = intRef.findAllMatchIn(s.take(first))
          .map(_.group(1).toInt).toVector
        val pairs = header.grouped(2).take(n)
          .collect { case Vector(num, off) => (num, off) }.toVector
        pairs.zipWithIndex.map { case ((num, off), k) =>
          val start = math.min(first + off, s.length)
          val end =
            if (k + 1 < pairs.length) math.min(first + pairs(k + 1)._2,
              s.length)
            else s.length
          PObj(num, s.substring(start, math.max(start, end)), None)
        }
      }
    }
    objs ++ packed
  }

  /** How strings decode under a selected composite font. */
  private sealed trait FontMap
  /** CIDs map through the font's ToUnicode CMap. */
  private final case class CidMap(m: Map[Int, String]) extends FontMap
  /** Identity-H WITHOUT a ToUnicode CMap: 2-byte CIDs decode as UTF-16
    * code units — exact when the generator kept CID == Unicode (the
    * /CIDToGIDMap /Identity subset-font case), a readable approximation
    * otherwise; control codes drop. */
  private case object CidIdentity extends FontMap

  /** Resource font name → [[FontMap]], from inline
    * `/Font << /F1 N 0 R ... >>` dicts and `/Font N 0 R` references.
    * Names are unioned document-wide (the minimal extractor does not
    * scope resources per page; same-name different-font collisions take
    * the last definition). */
  private def collectFonts(objs: Vector[PObj], byNum: Map[Int, PObj],
      cmapByObj: Map[Int, Map[Int, String]]): Map[String, FontMap] = {
    val inline = "(?s)/Font\\s*<<(.*?)>>".r
    val ref = "/Font\\s+(\\d+)\\s+\\d+\\s+R".r
    val entry = "/([^\\s/<>\\[\\]()]+)\\s+(\\d+)\\s+\\d+\\s+R".r
    val toUniRef = "/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R".r
    val entryStrs =
      objs.flatMap(o => inline.findAllMatchIn(o.dict).map(_.group(1))) ++
        objs.flatMap(o => ref.findAllMatchIn(o.dict).map(_.group(1).toInt))
          .distinct.flatMap(n => byNum.get(n).map(_.dict))
    entryStrs.flatMap { s =>
      entry.findAllMatchIn(s).flatMap { m =>
        val name = m.group(1)
        byNum.get(m.group(2).toInt)
          .filter(_.dict.contains("/Type0"))
          .flatMap { f =>
            toUniRef.findFirstMatchIn(f.dict)
              .flatMap(mm => cmapByObj.get(mm.group(1).toInt))
              .map(cm => CidMap(cm): FontMap)
              .orElse(if (f.dict.contains("/Identity-H"))
                Some(CidIdentity: FontMap)
              else None)
          }
          .map(name -> _)
      }
    }.toMap
  }

  /** bfchar/bfrange entries of a ToUnicode CMap → CID → unicode string
    * (destinations are UTF-16BE hex; scalar ranges increment the last
    * code unit per the CMap spec). Capped at 65536 entries. */
  private def parseCMap(s: String): Map[Int, String] = {
    val out = scala.collection.mutable.HashMap.empty[Int, String]
    def utf16(hex: String): String = {
      val padded =
        if (hex.length % 4 == 0) hex
        else ("0" * (4 - hex.length % 4)) + hex
      new String(padded.grouped(4)
        .map(u => Integer.parseInt(u, 16).toChar).toArray)
    }
    val pair = "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>".r
    for (blk <- "(?s)beginbfchar(.*?)endbfchar".r.findAllMatchIn(s);
         m <- pair.findAllMatchIn(blk.group(1)))
      out(Integer.parseInt(m.group(1), 16)) = utf16(m.group(2))
    val triple = ("(?s)<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*" +
      "(?:<([0-9A-Fa-f]+)>|\\[(.*?)\\])").r
    for (blk <- "(?s)beginbfrange(.*?)endbfrange".r.findAllMatchIn(s);
         m <- triple.findAllMatchIn(blk.group(1))) {
      val lo = Integer.parseInt(m.group(1), 16)
      val hi = Integer.parseInt(m.group(2), 16)
      if (m.group(3) != null) {
        val base = utf16(m.group(3))
        var cid = lo
        while (cid <= hi && out.size < 65536) {
          val chars = base.toCharArray
          chars(chars.length - 1) =
            (chars(chars.length - 1) + (cid - lo)).toChar
          out(cid) = new String(chars)
          cid += 1
        }
      } else {
        "<([0-9A-Fa-f]+)>".r.findAllMatchIn(m.group(4)).map(_.group(1))
          .zipWithIndex.foreach { case (d, k) =>
            if (lo + k <= hi) out(lo + k) = utf16(d)
          }
      }
    }
    out.toMap
  }

  private def inflate(bytes: Array[Byte]): String =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(bytes)
      val buf = new Array[Byte](8192)
      val acc = new java.io.ByteArrayOutputStream()
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return "" // truncated/dict-needed
        acc.write(buf, 0, n)
      }
      inf.end()
      new String(acc.toByteArray, StandardCharsets.ISO_8859_1)
    } catch { case _: java.util.zip.DataFormatException => "" }

  /** Text-showing operators of a decoded content stream: strings are
    * buffered as parsed and emitted when a Tj / ' / " / TJ operator
    * consumes them; Td / TD / T* / ET line moves emit "\n". `fonts`
    * maps resource font names to ToUnicode CID maps; while a mapped
    * font is selected (Tf), strings decode as big-endian 2-byte CIDs
    * through it (unmapped CIDs drop); otherwise bytes pass through
    * single-byte, as before. */
  private def contentText(content: String,
      fonts: Map[String, FontMap] = Map.empty): String = {
    val out = new StringBuilder
    val pending = new StringBuilder
    var lastName = ""
    var cmap: FontMap = null
    var i = 0
    val n = content.length
    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out.append('\n')
    // a parsed string lands in `pending` either byte-wise or CID-mapped
    def emit(sb: StringBuilder): Unit = cmap match {
      case null => pending.append(sb)
      case CidMap(m) =>
        var k = 0
        while (k + 1 < sb.length) {
          val cid = ((sb.charAt(k) & 0xff) << 8) | (sb.charAt(k + 1) & 0xff)
          m.get(cid).foreach(pending.append)
          k += 2
        }
      case CidIdentity =>
        var k = 0
        while (k + 1 < sb.length) {
          val cid = ((sb.charAt(k) & 0xff) << 8) | (sb.charAt(k + 1) & 0xff)
          if (cid >= 0x20 && cid != 0xfffe && cid != 0xffff)
            pending.append(cid.toChar)
          k += 2
        }
    }
    while (i < n) {
      content(i) match {
        case '(' =>
          // literal string: balanced parens, backslash escapes, octal
          val sb = new StringBuilder
          var depth = 1; i += 1
          while (i < n && depth > 0) {
            content(i) match {
              case '\\' if i + 1 < n =>
                content(i + 1) match {
                  case 'n' => sb.append('\n'); i += 2
                  case 'r' => sb.append('\r'); i += 2
                  case 't' => sb.append('\t'); i += 2
                  case 'b' => sb.append('\b'); i += 2
                  case 'f' => sb.append('\f'); i += 2
                  case '(' => sb.append('('); i += 2
                  case ')' => sb.append(')'); i += 2
                  case '\\' => sb.append('\\'); i += 2
                  case '\n' => i += 2 // line continuation
                  case d if d >= '0' && d <= '7' =>
                    var v = 0; var k = 0; i += 1
                    while (k < 3 && i < n && content(i) >= '0' &&
                      content(i) <= '7') {
                      v = v * 8 + (content(i) - '0'); i += 1; k += 1
                    }
                    sb.append(v.toChar)
                  case c => sb.append(c); i += 2
                }
              case '(' => depth += 1; sb.append('('); i += 1
              case ')' =>
                depth -= 1
                if (depth > 0) sb.append(')')
                i += 1
              case c => sb.append(c); i += 1
            }
          }
          emit(sb)
        case '<' if i + 1 < n && content(i + 1) != '<' =>
          // hex string
          val close = content.indexOf('>', i)
          if (close < 0) i = n
          else {
            val hex = content.substring(i + 1, close)
              .filter(c => Character.digit(c, 16) >= 0)
            val padded = if (hex.length % 2 == 1) hex + "0" else hex
            val sb = new StringBuilder
            padded.grouped(2).foreach(h =>
              sb.append(Integer.parseInt(h, 16).toChar))
            emit(sb)
            i = close + 1
          }
        case '/' =>
          // name token (font selection operand for Tf, among others)
          val start = i + 1
          i += 1
          while (i < n && !content(i).isWhitespace &&
            !"()<>[]/%".contains(content(i))) i += 1
          lastName = content.substring(start, i)
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          val start = i
          while (i < n && !content(i).isWhitespace &&
            !"()<>[]/%".contains(content(i))) i += 1
          content.substring(start, i) match {
            case "Tj" | "'" | "\"" | "TJ" =>
              out.append(pending); pending.clear()
            case "Td" | "TD" | "T*" | "ET" =>
              pending.clear(); newline()
            case "Tf" =>
              cmap = fonts.getOrElse(lastName, null); pending.clear()
            case _ => pending.clear()
          }
        case '%' => // comment to end of line
          while (i < n && content(i) != '\n') i += 1
        case _ => i += 1
      }
    }
    out.toString.strip
  }

  /** Extension dispatch + NFKC (extract.py:52-62); unknown extensions
    * yield "" (reference logs a warning and does the same). */
  def extract(ext: String, data: Array[Byte]): String = {
    val text = ext.toLowerCase(java.util.Locale.ROOT) match {
      case ".txt" | "txt" => new String(data, StandardCharsets.UTF_8)
      case ".pdf" | "pdf" => pdf(data)
      case ".html" | "html" =>
        html(new String(data, StandardCharsets.UTF_8))
      case _ => ""
    }
    nfkc(text)
  }
}

/** External-extraction provider seat (extract.py:103-169: Gemini OCR on
  * PDFs/images, LlamaParse document parsing). HTTP implementations are
  * interface parity only (zero egress); [[StubOcrExtractor]] is the
  * deterministic local implementation for pipeline tests. */
trait ExtractorProvider extends Serializable {
  def name: String
  def extractPdf(data: Array[Byte]): String
  def extractImage(data: Array[Byte]): String
}

/** Gemini OCR extractor — the WIRE form of the seat
  * (extract.py:103-134 `GeminiExtractor`): each document ships as
  * `inline_data` (PDF as `application/pdf`, image as `image/jpeg`)
  * beside the reference's own extraction prompt (the caller's prompt
  * overrides, extract.py:121-122), through the rate-limited
  * generateContent completer; the first candidate's text, trimmed.
  * Zero-egress tests drive it against an in-process stub — a real key
  * + `:generateContent` endpoint on the completer's HttpJson is a
  * config swap. */
final case class GeminiOcrExtractor(
    completer: graft.providers.GeminiCompleter,
    prompt: String = "") extends ExtractorProvider {
  def name: String = s"gemini_extractor_${completer.model}"

  private def run(userPrompt: String, default: String, mime: String,
                  data: Array[Byte]): String =
    completer.complete(
      if (userPrompt.nonEmpty) userPrompt else default,
      inlineData = Some((mime, data))).strip()

  def extractPdf(data: Array[Byte]): String =
    run(prompt, GeminiOcrExtractor.PdfPrompt, "application/pdf", data)
  def extractImage(data: Array[Byte]): String =
    run(prompt, GeminiOcrExtractor.ImagePrompt, "image/jpeg", data)
}

object GeminiOcrExtractor {
  /** extract.py:91-96, verbatim. */
  val PdfPrompt: String = """
Extract the main content from the PDF document. Ensure to exclude any
metadata, headers, footers, or any other non-essential information.
Return the extracted content as it appears in the document, without
any additional modification, summarization or interpretation.
"""
  /** extract.py:97-100, verbatim. */
  val ImagePrompt: String = """
Extract the visible text from the image, generate a concise caption
describing the image's content or scene, return the text with caption.
"""
}

/** LlamaParse extractor — the wire form of the parse seat
  * (provider.py:205-254 `LlamaCloudProvider`, extract.py:137-169):
  * multipart-upload the document to `{base}/api/parsing/upload` →
  * `{"id": job}`, then poll `GET {base}/api/parsing/job/{id}/result/
  * text` until success → `{"text": …}`. The [[Poller]]'s defaults are
  * the reference's own 30-minute deadline / 5-second interval
  * (EXTRACT_MAX_POLLING_TIME / EXTRACT_CHECK_INTERVAL); `http
  * .endpoint` is the API base (`https://api.cloud.llamaindex.ai` in
  * production) with Bearer auth in the transport headers, and the
  * whole flow — upload and every poll — shares that endpoint's one
  * rate bucket. */
final case class LlamaParseExtractor(http: graft.providers.HttpJson,
                                     poller: Poller = new Poller())
  extends ExtractorProvider {
  def name: String = "llamaparse_extractor"

  private def parse(filename: String, mime: String,
                    data: Array[Byte]): String = {
    import org.json4s._
    val up = jackson.JsonMethods.parse(http.postMultipart(
      s"${http.endpoint}/api/parsing/upload", "file", filename, mime,
      data))
    val job = up \ "id" match {
      case JString(s) => s
      case other =>
        throw new IllegalStateException(s"bad upload response: $other")
    }
    poller.await { () =>
      val (status, body) =
        http.getOnce(s"${http.endpoint}/api/parsing/job/$job/result/text")
      if (status != 200) None
      else jackson.JsonMethods.parse(body) \ "text" match {
        case JString(t) => Some(t)
        case other =>
          throw new IllegalStateException(s"bad result response: $other")
      }
    }
  }

  def extractPdf(data: Array[Byte]): String =
    parse("document.pdf", "application/pdf", data)
  def extractImage(data: Array[Byte]): String =
    parse("image.jpg", "image/jpeg", data)
}

/** Deterministic OCR stand-in: derives stable text from the payload
  * digest so pipelines built on the seat are testable end-to-end. */
final case class StubOcrExtractor() extends ExtractorProvider {
  def name: String = "stub_ocr"
  private def tag(kind: String, data: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(data).take(4).map("%02x".format(_)).mkString
    s"$kind $hex ${data.length} bytes"
  }
  def extractPdf(data: Array[Byte]): String = tag("pdf", data)
  def extractImage(data: Array[Byte]): String = tag("image", data)
}

/** Upload→poll completion harness — the LlamaParse polling loop
  * (/root/reference/vechord/provider.py:240-254: 30-minute deadline,
  * 5-second interval) with injectable clock/sleep so the deadline path
  * is unit-testable without waiting. */
final class Poller(deadlineMs: Long = 30L * 60 * 1000,
                   intervalMs: Long = 5000L,
                   now: () => Long = () => System.currentTimeMillis(),
                   sleep: Long => Unit = Thread.sleep) {
  /** Calls `check` until it yields a value or the deadline passes. */
  def await[T](check: () => Option[T]): T = {
    val start = now()
    var result = check()
    while (result.isEmpty) {
      if (now() - start >= deadlineMs)
        throw new java.util.concurrent.TimeoutException(
          s"poll deadline ${deadlineMs}ms exceeded")
      sleep(intervalMs)
      result = check()
    }
    result.get
  }
}
