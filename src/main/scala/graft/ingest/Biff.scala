package graft.ingest

/** S2 — legacy binary `.xls` (BIFF8) sheet codec, JDK-only, zero
  * dependencies. The reference's `pd.read_excel` accepts both `.xlsx` and
  * legacy `.xls` workbooks (_descargador_i90.py:197-304); this covers the
  * latter with the SAME (sheet, row_idx, dense cells) contract as
  * `Ingest.parseXlsxBytes`, so the whole downstream flow (sheet filter →
  * dynamic header → melt) is format-agnostic.
  *
  * Two layers, both parsed directly from the public specs:
  *  - the OLE2/CFB compound container ([MS-CFB]): header → DIFAT → FAT →
  *    directory → the "Workbook" stream (mini-stream chains included, for
  *    workbooks under the 4096-byte cutoff);
  *  - the BIFF8 record stream ([MS-XLS]): globals substream (BOF version
  *    check, BOUNDSHEET sheet directory, SST shared strings with CONTINUE
  *    records and their re-stated compression flag), then per-sheet cell
  *    substreams (LABELSST, NUMBER, RK, MULRK, LABEL, BLANK/MULBLANK,
  *    FORMULA with cached numeric or STRING-record results).
  *
  * Only BIFF8 (Excel 97-2003) is supported; a BIFF5 stream fails loudly
  * with the version found rather than mis-parsing 16-bit string records.
  */
private[ingest] object Biff {

  def looksLikeCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0xd0 && (bytes(1) & 0xff) == 0xcf &&
      (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xe0 &&
      (bytes(4) & 0xff) == 0xa1 && (bytes(5) & 0xff) == 0xb1 &&
      (bytes(6) & 0xff) == 0x1a && (bytes(7) & 0xff) == 0xe1

  /** BIFF8 workbook bytes → (sheet, 0-based row, dense cell strings),
    * the `parseXlsxBytes` contract. Sheets are filtered by `sheetPattern`
    * (unanchored regex, like the xlsx codec).
    */
  def parseXlsBytes(bytes: Array[Byte],
      sheetPattern: String): Seq[(String, Int, Seq[String])] = {
    val wb = cfbStream(bytes, Set("Workbook", "Book"))
    parseWorkbookStream(wb, sheetPattern)
  }

  // ------------------------------------------------------------------
  // CFB / OLE2 container
  // ------------------------------------------------------------------

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    u16(b, o) | (u16(b, o + 2) << 16)

  // sector constants (signed): -1 FREESECT, -2 ENDOFCHAIN, -3 FATSECT, -4 DIFSECT
  private def cfbStream(b: Array[Byte], names: Set[String]): Array[Byte] = {
    require(looksLikeCfb(b), "not an OLE2/CFB container")
    val ssz = 1 << u16(b, 30)
    val msz = 1 << u16(b, 32)
    val dirStart = i32(b, 48)
    val miniCutoff = i32(b, 56)
    val miniFatStart = i32(b, 60)
    val difatStart = i32(b, 68)

    def sectorOff(s: Int): Int = (s + 1) * ssz

    // DIFAT: 109 FAT-sector ids in the header, then chained DIFAT sectors
    val fatSectors = scala.collection.mutable.ArrayBuffer[Int]()
    for (i <- 0 until 109) {
      val s = i32(b, 76 + i * 4); if (s >= 0) fatSectors += s
    }
    var ds = difatStart
    var guard = 0
    while (ds >= 0 && guard < 65536) {
      val off = sectorOff(ds)
      for (i <- 0 until ssz / 4 - 1) {
        val s = i32(b, off + i * 4); if (s >= 0) fatSectors += s
      }
      ds = i32(b, off + ssz - 4)
      guard += 1
    }
    val fat: Array[Int] = fatSectors.toArray.flatMap { fs =>
      val off = sectorOff(fs)
      (0 until ssz / 4).map(i => i32(b, off + i * 4))
    }

    def chain(start: Int): Seq[Int] = {
      val acc = scala.collection.mutable.ArrayBuffer[Int]()
      var s = start
      while (s >= 0) {
        require(acc.size <= fat.length, "CFB: FAT chain cycle")
        acc += s
        s = fat(s)
      }
      acc.toSeq
    }
    def readChain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      chain(start).foreach { s =>
        val off = sectorOff(s)
        out.write(b, off, math.min(ssz, b.length - off))
      }
      out.toByteArray
    }

    // directory entries: 128 bytes each
    val dir = readChain(dirStart)
    case class Entry(name: String, typ: Int, start: Int, size: Int)
    val entries = (0 until dir.length / 128).map { i =>
      val o = i * 128
      val nameLen = u16(dir, o + 64)
      val name =
        if (nameLen < 2) ""
        else new String(dir, o, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      Entry(name, dir(o + 66) & 0xff, i32(dir, o + 116), i32(dir, o + 120))
    }
    val root = entries.find(_.typ == 5).getOrElse(
      throw new IllegalStateException("CFB: no root directory entry"))
    val target = entries.find(e => e.typ == 2 && names.contains(e.name))
      .getOrElse(throw new IllegalStateException(
        s"CFB: no stream named ${names.mkString("/")} " +
          s"(found: ${entries.filter(_.typ == 2).map(_.name).mkString(", ")})"))

    if (target.size >= miniCutoff) readChain(target.start).take(target.size)
    else {
      // small streams live in the mini stream (root's chain), addressed in
      // mini sectors through the separate mini FAT
      val mini = readChain(root.start)
      val miniFat: Array[Int] = {
        if (miniFatStart < 0) Array.empty
        else {
          val raw = readChain(miniFatStart)
          (0 until raw.length / 4).map(i => i32(raw, i * 4)).toArray
        }
      }
      val out = new java.io.ByteArrayOutputStream()
      var s = target.start
      var guard = 0
      while (s >= 0 && guard <= miniFat.length) {
        out.write(mini, s * msz, math.min(msz, mini.length - s * msz))
        s = miniFat(s)
        guard += 1
      }
      out.toByteArray.take(target.size)
    }
  }

  // ------------------------------------------------------------------
  // BIFF8 record stream
  // ------------------------------------------------------------------

  private val RecBof = 0x0809
  private val RecEof = 0x000a
  private val RecContinue = 0x003c
  private val RecSst = 0x00fc
  private val RecBoundSheet = 0x0085
  private val RecLabelSst = 0x00fd
  private val RecNumber = 0x0203
  private val RecRk = 0x027e
  private val RecMulRk = 0x00bd
  private val RecLabel = 0x0204
  private val RecBlank = 0x0201
  private val RecMulBlank = 0x00be
  private val RecFormula = 0x0006
  private val RecString = 0x0207

  /** Cursor over a list of record-data segments (an SST record plus its
    * CONTINUE records). Character data re-reads the compression flag at
    * every segment boundary ([MS-XLS] 2.5.293: a continued string restates
    * its fHighByte); non-character fields and skips cross boundaries raw.
    */
  private final class SegCursor(segs: IndexedSeq[Array[Byte]]) {
    private var si = 0
    private var off = 0
    private def seg = segs(si)
    private def advanceIfExhausted(): Unit =
      while (off >= seg.length && si < segs.length - 1) { si += 1; off = 0 }
    def u8: Int = { advanceIfExhausted(); val v = seg(off) & 0xff; off += 1; v }
    def u16: Int = u8 | (u8 << 8)
    def i32: Int = u16 | (u16 << 16)
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        advanceIfExhausted()
        val take = math.min(left, seg.length - off)
        require(take > 0, "BIFF: skip past end of SST data")
        off += take; left -= take
      }
    }
    def atSegmentBoundary: Boolean = { advanceIfExhausted(); off == 0 && si > 0 }
    def hasRemaining: Boolean = { advanceIfExhausted(); off < seg.length }
  }

  /** XLUnicodeRichExtendedString (SST entries). */
  private def readSstString(cur: SegCursor): String = {
    val cch = cur.u16
    val flags = cur.u8
    var high = (flags & 0x01) != 0
    val fExt = (flags & 0x04) != 0
    val fRich = (flags & 0x08) != 0
    val cRun = if (fRich) cur.u16 else 0
    val cbExt = if (fExt) cur.i32 else 0
    val sb = new StringBuilder(cch)
    var read = 0
    while (read < cch) {
      if (cur.atSegmentBoundary && read > 0)
        high = (cur.u8 & 0x01) != 0 // continued char data restates its flag
      if (high) sb.append(cur.u16.toChar) else sb.append(cur.u8.toChar)
      read += 1
    }
    cur.skip(4 * cRun + cbExt)
    sb.toString
  }

  /** XLUnicodeString (inline LABEL / STRING records — no rich/ext parts). */
  private def readInlineString(d: Array[Byte], o: Int): String = {
    val cch = u16(d, o)
    val high = (d(o + 2) & 0x01) != 0
    if (high) new String(d, o + 3, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
    else {
      val sb = new StringBuilder(cch)
      for (i <- 0 until cch) sb.append((d(o + 3 + i) & 0xff).toChar)
      sb.toString
    }
  }

  /** ShortXLUnicodeString (BOUNDSHEET names: 1-byte length). */
  private def readShortString(d: Array[Byte], o: Int): String = {
    val cch = d(o) & 0xff
    val high = (d(o + 1) & 0x01) != 0
    if (high) new String(d, o + 2, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
    else {
      val sb = new StringBuilder(cch)
      for (i <- 0 until cch) sb.append((d(o + 2 + i) & 0xff).toChar)
      sb.toString
    }
  }

  private def rkValue(rk: Int): Double = {
    val raw =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble // 30-bit signed integer
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xfffffffcL) << 32)
    if ((rk & 0x01) != 0) raw / 100.0 else raw
  }

  /** Number → cell text, matching how spreadsheet text round-trips:
    * integral values print without a fractional part.
    */
  private def fmtNum(v: Double): String =
    if (v == v.toLong && math.abs(v) < 1e15) v.toLong.toString else v.toString

  private def parseWorkbookStream(wb: Array[Byte],
      sheetPattern: String): Seq[(String, Int, Seq[String])] = {
    val re = sheetPattern.r
    require(wb.length >= 8 && u16(wb, 0) == RecBof,
      "BIFF: stream does not start with BOF")
    val biffVersion = u16(wb, 4)
    require(biffVersion == 0x0600,
      f"BIFF: unsupported version 0x$biffVersion%04x (only BIFF8/0x0600)")

    // ---- globals substream: BOUNDSHEET directory + SST ----
    val sheets = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    var sst: IndexedSeq[String] = IndexedSeq.empty
    var p = 0
    var done = false
    while (!done && p + 4 <= wb.length) {
      val id = u16(wb, p); val len = u16(wb, p + 2)
      val dataOff = p + 4
      id match {
        case RecEof => done = true
        case RecBoundSheet =>
          val off = i32(wb, dataOff)
          val name = readShortString(wb, dataOff + 6)
          sheets += ((name, off))
        case RecSst =>
          // gather the SST data plus all immediately-following CONTINUEs
          val segs = scala.collection.mutable.ArrayBuffer[Array[Byte]](
            java.util.Arrays.copyOfRange(wb, dataOff, dataOff + len))
          var q = dataOff + len
          while (q + 4 <= wb.length && u16(wb, q) == RecContinue) {
            val clen = u16(wb, q + 2)
            segs += java.util.Arrays.copyOfRange(wb, q + 4, q + 4 + clen)
            q += 4 + clen
          }
          val cur = new SegCursor(segs.toIndexedSeq)
          cur.i32 // total ref count
          val unique = cur.i32
          val acc = new scala.collection.mutable.ArrayBuffer[String](unique)
          var i = 0
          while (i < unique && cur.hasRemaining) {
            acc += readSstString(cur); i += 1
          }
          sst = acc.toIndexedSeq
        case _ => ()
      }
      p = dataOff + len
    }

    // ---- per-sheet cell substreams ----
    sheets.toSeq.collect {
      case (name, off) if re.findFirstIn(name).isDefined =>
        require(off + 4 <= wb.length && u16(wb, off) == RecBof,
          s"BIFF: sheet '$name' offset does not point at BOF")
        val rows = scala.collection.mutable.SortedMap[Int,
          scala.collection.mutable.Map[Int, String]]()
        def put(r: Int, c: Int, v: String): Unit =
          rows.getOrElseUpdate(r,
            scala.collection.mutable.Map[Int, String]())(c) = v
        var q = off
        var end = false
        var pendingStringCell: Option[(Int, Int)] = None
        while (!end && q + 4 <= wb.length) {
          val id = u16(wb, q); val len = u16(wb, q + 2)
          val d = q + 4
          id match {
            case RecEof => end = true
            case RecLabelSst =>
              val isst = i32(wb, d + 6)
              put(u16(wb, d), u16(wb, d + 2),
                if (isst >= 0 && isst < sst.size) sst(isst) else "")
            case RecNumber =>
              val bits = (0 until 8).foldRight(0L)((i, a) =>
                (a << 8) | (wb(d + 6 + i) & 0xffL))
              put(u16(wb, d), u16(wb, d + 2),
                fmtNum(java.lang.Double.longBitsToDouble(bits)))
            case RecRk =>
              put(u16(wb, d), u16(wb, d + 2), fmtNum(rkValue(i32(wb, d + 6))))
            case RecMulRk =>
              val row = u16(wb, d); val colFirst = u16(wb, d + 2)
              val n = (len - 6) / 6
              for (i <- 0 until n)
                put(row, colFirst + i, fmtNum(rkValue(i32(wb, d + 4 + i * 6 + 2))))
            case RecLabel =>
              put(u16(wb, d), u16(wb, d + 2), readInlineString(wb, d + 6))
            case RecBlank =>
              put(u16(wb, d), u16(wb, d + 2), "")
            case RecMulBlank =>
              val row = u16(wb, d); val colFirst = u16(wb, d + 2)
              val n = (len - 6) / 2
              for (i <- 0 until n) put(row, colFirst + i, "")
            case RecFormula =>
              val row = u16(wb, d); val col = u16(wb, d + 2)
              if (u16(wb, d + 12) == 0xffff) {
                // non-numeric cached result; type byte 0 = string follows
                // in a STRING record, others (bool/err/empty) → ""
                if ((wb(d + 6) & 0xff) == 0) pendingStringCell = Some((row, col))
                else put(row, col, "")
              } else {
                val bits = (0 until 8).foldRight(0L)((i, a) =>
                  (a << 8) | (wb(d + 6 + i) & 0xffL))
                put(row, col, fmtNum(java.lang.Double.longBitsToDouble(bits)))
              }
            case RecString =>
              pendingStringCell.foreach { case (r, c) =>
                put(r, c, readInlineString(wb, d))
              }
              pendingStringCell = None
            case _ => ()
          }
          q = d + len
        }
        rows.toSeq.map { case (r, cells) =>
          val maxCol = cells.keys.max
          (name, r, (0 to maxCol).map(c => cells.getOrElse(c, "")): Seq[String])
        }
    }.flatten
  }
}
