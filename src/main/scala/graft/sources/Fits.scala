package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal FITS writer + BINTABLE reader, hand-rolled from the public
  * FITS 4.0 layout (2880-byte blocks of 80-char header cards,
  * big-endian binary-table data) — the same real-codec pattern as the
  * PNG/WAV/RIFF-AVI codecs in [[graft.multimodal.Multimodal]].
  *
  * This is the reference's front door made genuine: its light-curve
  * ingest opens TESS/Kepler FITS files, reads SECTOR/CAMERA/CCD from
  * the primary header and TIME / PDCSAP_FLUX / PDCSAP_FLUX_ERR /
  * QUALITY from the first BINTABLE HDU, masks QUALITY != 0 and
  * non-finite flux, applies the BJD offset, and median-normalizes
  * (read_tesskplr_file, main.py:7407–7502). The s14 query routes
  * exactly those semantics over files this writer produced, through
  * Spark's binaryFile source.
  *
  * Writer scope: primary HDU (no data) + ONE BINTABLE extension with
  * scalar big-endian columns. Reader scope: any single-HDU BINTABLE
  * whose wanted columns are scalar D/E/J/I/K/B — column order and
  * interleaved extra columns are discovered from TTYPEn/TFORMn, and
  * repeat counts are honored for offset arithmetic (a repeated column
  * can be skipped over, just not extracted). Unsupported TFORMs in
  * wanted columns fail loudly.
  */
object Fits {

  private val BLOCK = 2880
  private val CARD = 80

  // ---------------------------------------------------------------
  // header cards (fixed format, FITS 4.0 §4.2)
  // ---------------------------------------------------------------

  /** Right-pad (never truncate — FITS names/values may exceed their
    * minimum field widths, e.g. TTYPE 'PDCSAP_FLUX_ERR'). */
  private def pad(s: String, n: Int): String =
    if (s.length >= n) s else s + " " * (n - s.length)

  /** Value card: keyword(8) '= ' value right-justified to column 30. */
  private def numCard(key: String, v: Long): String =
    pad(pad(key, 8) + "= " + " " * (20 - v.toString.length) + v.toString, CARD)

  private def strCard(key: String, v: String): String =
    pad(pad(key, 8) + "= " + s"'${pad(v, 8)}'", CARD)

  private def logCard(key: String, v: Boolean): String =
    pad(pad(key, 8) + "= " + " " * 19 + (if (v) "T" else "F"), CARD)

  private def headerBlock(cards: Seq[String]): Array[Byte] = {
    val all = cards :+ pad("END", CARD)
    val padded = all ++ Seq.fill((BLOCK / CARD - all.size % (BLOCK / CARD)) %
      (BLOCK / CARD))(" " * CARD)
    padded.mkString.getBytes("US-ASCII")
  }

  private def padBlock(data: Array[Byte]): Array[Byte] = {
    val rem = data.length % BLOCK
    if (rem == 0) data else data ++ new Array[Byte](BLOCK - rem)
  }

  // ---------------------------------------------------------------
  // writer
  // ---------------------------------------------------------------

  /** One light-curve sample as stored: BTJD time, float32 flux/err,
    * int32 quality. */
  final case class Sample(timeBtjd: Double, flux: Float, err: Float, quality: Int)

  /** General single-BINTABLE writer: primary HDU carrying
    * SECTOR/CAMERA/CCD, one BINTABLE HDU with the given scalar
    * columns (name, TFORM type) — cell values must match the TFORM
    * ('D' Double, 'E' Float, 'J' Int, 'K' Long, 'I' Short). Exposed
    * beyond the light-curve shape so tests can exercise column
    * reorder / extra-column skipping in the reader. */
  private[graft] def writeTable(sector: Int, camera: Int, ccd: Int,
                                cols: Seq[(String, Char)],
                                rows: Seq[Seq[Any]]): Array[Byte] = {
    val primary = headerBlock(Seq(
      logCard("SIMPLE", v = true),
      numCard("BITPIX", 8),
      numCard("NAXIS", 0),
      logCard("EXTEND", v = true),
      numCard("SECTOR", sector),
      numCard("CAMERA", camera),
      numCard("CCD", ccd)))
    val rowBytes = cols.map(c => formWidth(c._2)).sum
    val table = headerBlock(Seq(
      strCard("XTENSION", "BINTABLE"),
      numCard("BITPIX", 8),
      numCard("NAXIS", 2),
      numCard("NAXIS1", rowBytes),
      numCard("NAXIS2", rows.size),
      numCard("PCOUNT", 0),
      numCard("GCOUNT", 1),
      numCard("TFIELDS", cols.size)) ++
      cols.zipWithIndex.flatMap { case ((name, t), i) =>
        Seq(strCard(s"TTYPE${i + 1}", name), strCard(s"TFORM${i + 1}", t.toString))
      })
    val buf = ByteBuffer.allocate(rows.size * rowBytes)
      .order(ByteOrder.BIG_ENDIAN)
    rows.foreach { r =>
      r.zip(cols).foreach {
        case (v, (_, 'D')) => buf.putDouble(v.asInstanceOf[Double])
        case (v, (_, 'E')) => buf.putFloat(v.asInstanceOf[Float])
        case (v, (_, 'J')) => buf.putInt(v.asInstanceOf[Int])
        case (v, (_, 'K')) => buf.putLong(v.asInstanceOf[Long])
        case (v, (_, 'I')) => buf.putShort(v.asInstanceOf[Short])
        case (_, (n, t)) => throw new IllegalArgumentException(s"$n: TFORM '$t'")
      }
    }
    primary ++ table ++ padBlock(buf.array())
  }

  /** A TESS-shaped light-curve FITS file: TIME (D), PDCSAP_FLUX (E),
    * PDCSAP_FLUX_ERR (E), QUALITY (J). */
  def writeLightCurve(sector: Int, camera: Int, ccd: Int,
                      rows: Seq[Sample]): Array[Byte] =
    writeTable(sector, camera, ccd,
      Seq("TIME" -> 'D', "PDCSAP_FLUX" -> 'E',
        "PDCSAP_FLUX_ERR" -> 'E', "QUALITY" -> 'J'),
      // Seq[Any], not Seq(...): Scala would numerically widen a mixed
      // Double/Float/Int sequence to Seq[Double] and break the typed
      // cell writes
      rows.map(r => Seq[Any](r.timeBtjd, r.flux, r.err, r.quality)))

  // ---------------------------------------------------------------
  // reader
  // ---------------------------------------------------------------

  private final case class Header(cards: Map[String, String], blocks: Int) {
    def num(k: String): Long = cards.get(k) match {
      case Some(v) => v.trim.toLong
      case None => 0L
    }
    def str(k: String): String =
      cards.getOrElse(k, "").trim.stripPrefix("'").reverse
        .dropWhile(_ == ' ').reverse.stripSuffix("'").trim
  }

  /** Parse one header (cards up to END), returning values and the
    * number of 2880-byte blocks consumed. */
  private def parseHeader(b: Array[Byte], off: Int): Header = {
    var cards = Map.empty[String, String]
    var i = off
    var done = false
    while (!done) {
      require(i + CARD <= b.length, s"FITS: header ran past EOF at $i")
      val card = new String(b, i, CARD, "US-ASCII")
      val key = card.substring(0, 8).trim
      if (key == "END") done = true
      else if (card.length > 10 && card.charAt(8) == '=') {
        // strip an inline comment (quoted strings first)
        val v = card.substring(10)
        val value = if (v.trim.startsWith("'")) {
          val body = v.trim.substring(1)
          "'" + body.substring(0, body.indexOf('\'')) + "'"
        } else {
          val slash = v.indexOf('/')
          (if (slash >= 0) v.substring(0, slash) else v).trim
        }
        cards += key -> value
      }
      i += CARD
    }
    val consumed = i - off
    Header(cards, (consumed + BLOCK - 1) / BLOCK)
  }

  /** Byte width of one TFORM element type. */
  private def formWidth(t: Char): Int = t match {
    case 'L' | 'B' | 'A' => 1
    case 'I' => 2
    case 'J' | 'E' => 4
    case 'K' | 'D' => 8
    case other => throw new IllegalArgumentException(s"FITS: unsupported TFORM type '$other'")
  }

  /** Decoded light curve: primary-header ids + per-row samples (row
    * index, time, flux, err, quality). */
  final case class LightCurve(sector: Int, camera: Int, ccd: Int,
                              rows: Array[(Int, Double, Float, Float, Int)])

  /** Parse a light-curve FITS payload: primary header for
    * SECTOR/CAMERA/CCD, first BINTABLE HDU for
    * TIME/PDCSAP_FLUX/PDCSAP_FLUX_ERR/QUALITY (located by TTYPE, any
    * column order, extra columns skipped via TFORM widths). */
  def readLightCurve(bytes: Array[Byte]): LightCurve = {
    val prim = parseHeader(bytes, 0)
    require(prim.cards.get("SIMPLE").exists(_.trim == "T"),
      "FITS: not a standard FITS file (SIMPLE != T)")
    // primary data size: |BITPIX|/8 · prod(NAXISn), block-padded
    val pAxes = (1 to prim.num("NAXIS").toInt).map(n => prim.num(s"NAXIS$n"))
    val pData = if (pAxes.isEmpty) 0L
      else math.abs(prim.num("BITPIX")) / 8 * pAxes.product
    var off = prim.blocks * BLOCK +
      ((pData + BLOCK - 1) / BLOCK * BLOCK).toInt
    val ext = parseHeader(bytes, off)
    require(ext.str("XTENSION") == "BINTABLE",
      s"FITS: expected BINTABLE, got '${ext.str("XTENSION")}'")
    off += ext.blocks * BLOCK
    val rowBytes = ext.num("NAXIS1").toInt
    val nRows = ext.num("NAXIS2").toInt
    val nFields = ext.num("TFIELDS").toInt
    // column offsets from cumulative TFORM widths
    var cursor = 0
    var colOff = Map.empty[String, (Int, Char)]
    (1 to nFields).foreach { f =>
      val form = ext.str(s"TFORM$f")
      val (repStr, t) = (form.dropRight(1), form.last)
      val rep = if (repStr.isEmpty) 1 else repStr.toInt
      colOff += ext.str(s"TTYPE$f") -> (cursor, t)
      cursor += rep * formWidth(t)
    }
    require(cursor == rowBytes,
      s"FITS: TFORM widths sum to $cursor but NAXIS1=$rowBytes")
    def col(name: String, want: Char): Int = colOff.get(name) match {
      case Some((o, t)) if t == want => o
      case Some((_, t)) => throw new IllegalArgumentException(
        s"FITS: column $name has TFORM '$t', expected '$want'")
      case None => throw new IllegalArgumentException(
        s"FITS: no column $name in ${colOff.keys.mkString(",")}")
    }
    val tOff = col("TIME", 'D'); val fOff = col("PDCSAP_FLUX", 'E')
    val eOff = col("PDCSAP_FLUX_ERR", 'E'); val qOff = col("QUALITY", 'J')
    val bb = ByteBuffer.wrap(bytes, off, rowBytes * nRows)
      .order(ByteOrder.BIG_ENDIAN)
    val out = new Array[(Int, Double, Float, Float, Int)](nRows)
    var i = 0
    while (i < nRows) {
      val base = off + i * rowBytes
      out(i) = (i, bb.getDouble(base + tOff), bb.getFloat(base + fOff),
        bb.getFloat(base + eOff), bb.getInt(base + qOff))
      i += 1
    }
    LightCurve(prim.num("SECTOR").toInt, prim.num("CAMERA").toInt,
      prim.num("CCD").toInt, out)
  }

  // ---------------------------------------------------------------
  // deterministic fixture payload (closed form in (sector, i) so the
  // DuckDB oracle recomputes every decoded value without a FITS
  // reader of its own — the s10/m2 oracle technique)
  // ---------------------------------------------------------------

  val N_ROWS = 1000

  /** Integer driver: positive LCG-style mix, all intermediates < 2^63
    * and the identical expression is valid DuckDB SQL. */
  def rMix(sector: Long, i: Long): Long =
    (sector * 2654435761L + i * 1103515245L + 12345L) % 2147483648L

  /** Closed-form sample: integer-valued float32 flux (exact in both
    * float32 and float64), a transit-like dip, deterministic NaN rows
    * (flux gaps) and raised-quality rows. */
  def sample(sector: Int, i: Int): Sample = {
    val r = rMix(sector, i)
    val dip = if (i % 360 < 18) 300L else 0L
    val flux =
      if (r % 131 == 0) Float.NaN
      else (10000L + r % 200 - dip).toFloat
    Sample(1000.0 + (sector - 1) * 30.0 + i * 0.002, flux, 50.0f,
      if (r % 97 == 0) 8 else 0)
  }

  /** The full fixture file for one sector. */
  def fixtureFile(sector: Int): Array[Byte] =
    writeLightCurve(sector, (sector - 1) % 4 + 1, sector * 3 % 4 + 1,
      (0 until N_ROWS).map(i => sample(sector, i)))

  // ---------------------------------------------------------------
  // multi-target fixture (px2): many targets × many sectors, each
  // target with its OWN injected period — same closed-form oracle
  // technique, target id carried in the TESS-style filename
  // ---------------------------------------------------------------

  /** px2 mix — all intermediates < 2^63, valid DuckDB SQL verbatim. */
  def rMix2(target: Long, sector: Long, i: Long): Long =
    (target * 69069L + sector * 2654435761L + i * 1103515245L + 12345L) % 2147483648L

  /** Closed-form sample for (target, sector, i): per-TARGET dip
    * period — every (240 + 60·(t%4))-th sample for 15 samples, so the
    * fold must run at each target's own period to recover it. */
  def sample2(target: Int, sector: Int, i: Int): Sample = {
    val r = rMix2(target, sector, i)
    val k = 240 + 60 * (target % 4)
    val dip = if (i % k < 15) 300L else 0L
    val flux =
      if (r % 131 == 0) Float.NaN
      else (10000L + r % 200 - dip).toFloat
    Sample(1000.0 + (sector - 1) * 30.0 + i * 0.002, flux, 50.0f,
      if (r % 97 == 0) 8 else 0)
  }

  /** One (target, sector) fixture file. */
  def fixtureFile2(target: Int, sector: Int): Array[Byte] =
    writeLightCurve(sector, (sector - 1) % 4 + 1, sector * 3 % 4 + 1,
      (0 until N_ROWS).map(i => sample2(target, sector, i)))
}
