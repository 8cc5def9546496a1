package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Minimal HDF5 writer + reader, hand-rolled from the PUBLIC HDF5
  * file-format specification (version-0 superblock, version-1 object
  * headers, symbol-table groups = v1 B-tree + SNOD + local heap,
  * contiguous 1-D datasets of IEEE f64 / signed i32/i64, all
  * little-endian) — the same real-codec pattern as Fits.scala (FITS
  * BINTABLE) and the PNG/WAV/AVI codecs in multimodal/.
  *
  * This closes the reference's LAST simulated ingest boundary: its
  * second front door is `read_qlop` (ref main.py:6420–6453), which
  * opens a QLP HDF5 light curve and reads the nested datasets
  * LightCurve/BJD, LightCurve/AperturePhotometry/Aperture_002/
  * RawMagnitude and LightCurve/QFLAG — a real group HIERARCHY, which
  * is why the reader walks symbol tables generically instead of
  * hardcoding offsets. The s15 query routes the full read_qlop chain
  * (mag→flux via 10^(−Δm/2.5), double median normalization, constant
  * σ, QFLAG==0 ∧ finite mask) over files this writer produced,
  * through Spark's binaryFile source.
  *
  * Writer scope: nested groups (one SNOD per group, ≤ a few dozen
  * children) + contiguous 1-D datasets. Reader scope: any v0-superblock
  * file whose groups use symbol tables (with B-tree levels > 0
  * traversed recursively) and whose wanted datasets are contiguous
  * 1-D f64/i32/i64. Unsupported structures fail loudly.
  */
object Hdf5 {

  private val UNDEF = -1L // 0xFFFFFFFFFFFFFFFF — the spec's undefined address

  // ---------------------------------------------------------------
  // document tree
  // ---------------------------------------------------------------

  sealed trait Node
  /** Group: named children (written sorted by name, as the symbol
    * table requires). */
  final case class Grp(children: Seq[(String, Node)]) extends Node
  /** 1-D IEEE little-endian float64 dataset. */
  final case class DsetF64(data: Array[Double]) extends Node
  /** 1-D little-endian signed int32 dataset. */
  final case class DsetI32(data: Array[Int]) extends Node
  /** 1-D little-endian signed int64 dataset. */
  final case class DsetI64(data: Array[Long]) extends Node

  // ---------------------------------------------------------------
  // writer
  // ---------------------------------------------------------------

  /** Append-only allocator with 8-byte alignment; blocks are filled
    * after allocation so parents can point at children. */
  private final class Alloc {
    private val blocks = ArrayBuffer.empty[(Long, Array[Byte])]
    private var cursor = 0L
    def alloc(n: Int): (Long, ByteBuffer) = {
      val at = (cursor + 7) / 8 * 8
      cursor = at + n
      val arr = new Array[Byte](n)
      blocks += ((at, arr))
      (at, ByteBuffer.wrap(arr).order(ByteOrder.LITTLE_ENDIAN))
    }
    def eof: Long = (cursor + 7) / 8 * 8
    def result(): Array[Byte] = {
      val out = new Array[Byte](eof.toInt)
      blocks.foreach { case (at, b) => System.arraycopy(b, 0, out, at.toInt, b.length) }
      out
    }
  }

  private def pad8(n: Int): Int = (n + 7) / 8 * 8

  /** One header message: (type, body). Body is padded to 8 on write. */
  private final case class Msg(tpe: Int, body: Array[Byte])

  private def msgBytes(m: Msg): Array[Byte] = {
    val body = pad8(m.body.length)
    val b = ByteBuffer.allocate(8 + body).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(m.tpe.toShort)
    b.putShort(body.toShort)
    b.put(0.toByte) // flags
    b.put(new Array[Byte](3))
    b.put(m.body)
    b.array()
  }

  /** Version-1 object header: 12-byte prefix + 4 pad + messages. */
  private def writeObjectHeader(a: Alloc, msgs: Seq[Msg]): Long = {
    val body = msgs.map(msgBytes).reduce(_ ++ _)
    val (at, b) = a.alloc(16 + body.length)
    b.put(1.toByte)            // version
    b.put(0.toByte)            // reserved
    b.putShort(msgs.size.toShort)
    b.putInt(1)                // reference count
    b.putInt(body.length)      // header data size
    b.put(new Array[Byte](4))  // pad to 8-align the message block
    b.put(body)
    at
  }

  private def dataspace1d(n: Long): Msg = {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte)  // version
    b.put(1.toByte)  // dimensionality
    b.put(0.toByte)  // flags: no max dims
    b.put(new Array[Byte](5))
    b.putLong(n)
    Msg(0x0001, b.array())
  }

  private def datatypeF64: Msg = {
    val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x11.toByte)         // version 1, class 1 (float)
    b.put(0x20.toByte)         // LE, implied-msb mantissa normalization
    b.put(63.toByte)           // sign bit location
    b.put(0.toByte)
    b.putInt(8)                // size
    b.putShort(0)              // bit offset
    b.putShort(64)             // precision
    b.put(52.toByte); b.put(11.toByte) // exponent location/size
    b.put(0.toByte); b.put(52.toByte)  // mantissa location/size
    b.putInt(1023)             // exponent bias
    Msg(0x0003, b.array())
  }

  private def datatypeInt(size: Int): Msg = {
    val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x10.toByte)         // version 1, class 0 (fixed-point)
    b.put(0x08.toByte)         // LE, signed (two's complement)
    b.put(0.toByte); b.put(0.toByte)
    b.putInt(size)
    b.putShort(0)              // bit offset
    b.putShort((8 * size).toShort) // precision
    Msg(0x0003, b.array())
  }

  private def layoutContiguous(addr: Long, size: Long): Msg = {
    val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
    b.put(3.toByte)  // layout message version 3
    b.put(1.toByte)  // class: contiguous
    b.putLong(addr)
    b.putLong(size)
    Msg(0x0008, b.array())
  }

  private def symbolTableMsg(btree: Long, heap: Long): Msg = {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.putLong(btree); b.putLong(heap)
    Msg(0x0011, b.array())
  }

  /** Writes a node; returns (objectHeaderAddr, stab) where stab =
    * (btreeAddr, heapAddr) for groups (the superblock's root entry
    * caches it). */
  private def writeNode(a: Alloc, node: Node): (Long, Option[(Long, Long)]) = node match {
    case DsetF64(data) =>
      val (dAt, db) = a.alloc(8 * data.length)
      data.foreach(db.putDouble)
      (writeObjectHeader(a, Seq(dataspace1d(data.length), datatypeF64,
        layoutContiguous(dAt, 8L * data.length))), None)
    case DsetI32(data) =>
      val (dAt, db) = a.alloc(4 * data.length)
      data.foreach(db.putInt)
      (writeObjectHeader(a, Seq(dataspace1d(data.length), datatypeInt(4),
        layoutContiguous(dAt, 4L * data.length))), None)
    case DsetI64(data) =>
      val (dAt, db) = a.alloc(8 * data.length)
      data.foreach(db.putLong)
      (writeObjectHeader(a, Seq(dataspace1d(data.length), datatypeInt(8),
        layoutContiguous(dAt, 8L * data.length))), None)
    case Grp(children0) =>
      val children = children0.sortBy(_._1) // symbol tables are name-sorted
      val childAddrs = children.map { case (_, n) => writeNode(a, n)._1 }
      // local heap: offset 0 = empty name (8 zero bytes), then each
      // name NUL-terminated, 8-padded
      val nameOffsets = ArrayBuffer.empty[Long]
      val heapData = ArrayBuffer.empty[Byte]
      heapData ++= new Array[Byte](8)
      children.foreach { case (name, _) =>
        nameOffsets += heapData.length.toLong
        heapData ++= name.getBytes("US-ASCII")
        heapData += 0.toByte
        while (heapData.length % 8 != 0) heapData += 0.toByte
      }
      val (heapDataAt, hdb) = a.alloc(heapData.length)
      hdb.put(heapData.toArray)
      val (heapAt, hb) = a.alloc(32)
      hb.put("HEAP".getBytes("US-ASCII"))
      hb.put(0.toByte); hb.put(new Array[Byte](3))
      hb.putLong(heapData.length.toLong) // data segment size
      hb.putLong(UNDEF)                  // free list: none
      hb.putLong(heapDataAt)
      // one SNOD holding every entry (writer bound: one leaf)
      val (snodAt, sb) = a.alloc(8 + 40 * children.size)
      sb.put("SNOD".getBytes("US-ASCII"))
      sb.put(1.toByte); sb.put(0.toByte)
      sb.putShort(children.size.toShort)
      children.indices.foreach { i =>
        sb.putLong(nameOffsets(i))
        sb.putLong(childAddrs(i))
        sb.putInt(0)  // cache type: none
        sb.putInt(0)
        sb.put(new Array[Byte](16))
      }
      // v1 B-tree: a single leaf group node over the one SNOD
      val (btAt, bb) = a.alloc(24 + 8 + 8 + 8)
      bb.put("TREE".getBytes("US-ASCII"))
      bb.put(0.toByte)  // node type: group
      bb.put(0.toByte)  // level: leaf
      bb.putShort(1)    // entries used
      bb.putLong(UNDEF); bb.putLong(UNDEF) // siblings
      bb.putLong(0L)                        // key0: empty name
      bb.putLong(snodAt)
      bb.putLong(if (nameOffsets.isEmpty) 0L else nameOffsets.last) // key1
      (writeObjectHeader(a, Seq(symbolTableMsg(btAt, heapAt))),
        Some((btAt, heapAt)))
  }

  /** Serialize a tree to a complete HDF5 file image.
    *
    * Validation note (r9 advice): the codec round-trips against its
    * own reader and follows the public format spec; no external HDF5
    * library exists in this environment to break that circularity, so
    * the writer is kept strictly spec-conservative — in particular
    * the declared group-leaf K is derived from the LARGEST SNOD
    * actually written (a leaf holds at most 2K entries), never a
    * constant a bigger group could violate. */
  def write(root: Grp): Array[Byte] = {
    // spec: each symbol-table leaf holds between K and 2K entries —
    // the writer packs one SNOD per group, so K must cover the widest
    // group or external libhdf5/h5py readers may reject the file
    def maxFanout(n: Node): Int = n match {
      case Grp(cs) => (cs.size +: cs.map(c => maxFanout(c._2))).max
      case _ => 0
    }
    val leafK = math.max(4, (maxFanout(root) + 1) / 2)
    val a = new Alloc
    val (_, sb) = a.alloc(96) // superblock v0 sits at address 0
    val (rootAt, stab) = writeNode(a, root)
    sb.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    sb.put(0.toByte) // superblock version
    sb.put(0.toByte) // free-space version
    sb.put(0.toByte) // root symbol-table version
    sb.put(0.toByte) // reserved
    sb.put(0.toByte) // shared-header-message version
    sb.put(8.toByte) // size of offsets
    sb.put(8.toByte) // size of lengths
    sb.put(0.toByte) // reserved
    sb.putShort(leafK.toShort) // group leaf node k (covers widest SNOD)
    sb.putShort(16)  // group internal node k
    sb.putInt(0)     // file consistency flags
    sb.putLong(0L)   // base address
    sb.putLong(UNDEF) // free-space info
    sb.putLong(a.eof) // end-of-file address (patched value is final: the
                      // superblock is the first block and eof is fixed
                      // once writeNode returned)
    sb.putLong(UNDEF) // driver info
    // root group symbol table entry
    sb.putLong(0L)    // link name offset (empty name)
    sb.putLong(rootAt)
    sb.putInt(1)      // cache type 1: symbol table cached in scratch
    sb.putInt(0)
    val (bt, hp) = stab.get
    sb.putLong(bt); sb.putLong(hp)
    a.result()
  }

  // ---------------------------------------------------------------
  // reader
  // ---------------------------------------------------------------

  private def buf(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  private def sig4(b: ByteBuffer, at: Long, expect: String): Unit = {
    val got = new String(Array(b.get(at.toInt), b.get(at.toInt + 1),
      b.get(at.toInt + 2), b.get(at.toInt + 3)), "US-ASCII")
    require(got == expect, s"HDF5: expected '$expect' at $at, got '$got'")
  }

  /** Parsed object header: messages as (type, bodyOffset, bodySize). */
  private def readMessages(b: ByteBuffer, at: Long): Seq[(Int, Long, Int)] = {
    require(b.get(at.toInt) == 1, s"HDF5: unsupported object header version at $at")
    val n = b.getShort(at.toInt + 2) & 0xFFFF
    var off = at + 16
    (0 until n).map { _ =>
      val tpe = b.getShort(off.toInt) & 0xFFFF
      require(tpe != 0x0010,
        "HDF5: object header continuation blocks not supported by this reader")
      val size = b.getShort(off.toInt + 2) & 0xFFFF
      val body = off + 8
      off = body + size
      (tpe, body, size)
    }
  }

  private def findMsg(msgs: Seq[(Int, Long, Int)], tpe: Int, what: String): Long =
    msgs.find(_._1 == tpe).map(_._2)
      .getOrElse(throw new IllegalArgumentException(s"HDF5: no $what message"))

  /** Children of a group object header: name → child header address.
    * Walks the symbol-table B-tree (any level) and the local heap. */
  private def groupChildren(b: ByteBuffer, headerAt: Long): Seq[(String, Long)] = {
    val stab = findMsg(readMessages(b, headerAt), 0x0011, "symbol table")
    val btree = b.getLong(stab.toInt)
    val heap = b.getLong(stab.toInt + 8)
    sig4(b, heap, "HEAP")
    val heapData = b.getLong(heap.toInt + 24)
    def name(off: Long): String = {
      var i = (heapData + off).toInt
      val sb = new StringBuilder
      while (b.get(i) != 0) { sb.append(b.get(i).toChar); i += 1 }
      sb.toString
    }
    def walkBtree(at: Long): Seq[Long] = { // → SNOD addresses
      sig4(b, at, "TREE")
      require(b.get(at.toInt + 4) == 0, "HDF5: not a group B-tree node")
      val level = b.get(at.toInt + 5)
      val used = b.getShort(at.toInt + 6) & 0xFFFF
      val children = (0 until used).map(i => b.getLong((at + 24 + 8 + i * 16).toInt))
      if (level == 0) children else children.flatMap(walkBtree)
    }
    walkBtree(btree).flatMap { snodAt =>
      sig4(b, snodAt, "SNOD")
      val nSym = b.getShort(snodAt.toInt + 6) & 0xFFFF
      (0 until nSym).map { i =>
        val e = snodAt + 8 + 40L * i
        (name(b.getLong(e.toInt)), b.getLong(e.toInt + 8))
      }
    }
  }

  /** Resolve a /-separated path from the root group to an object
    * header address. */
  private def resolve(b: ByteBuffer, bytes: Array[Byte], path: String): Long = {
    require(bytes.length >= 96 &&
      (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'H' && bytes(2) == 'D' && bytes(3) == 'F',
      "HDF5: bad signature")
    require(bytes(8) == 0, "HDF5: unsupported superblock version")
    require(bytes(13) == 8 && bytes(14) == 8, "HDF5: unsupported offset/length size")
    var at = b.getLong(24 + 8 + 8 * 4) // root entry's object header address
    path.split("/").filter(_.nonEmpty).foreach { comp =>
      at = groupChildren(b, at).collectFirst { case (n, a) if n == comp => a }
        .getOrElse(throw new IllegalArgumentException(
          s"HDF5: no member '$comp' on the path '$path'"))
    }
    at
  }

  /** Typed dataset read: (class, elemSize, n, dataAddr). */
  private def datasetInfo(b: ByteBuffer, headerAt: Long): (Int, Int, Long, Long) = {
    val msgs = readMessages(b, headerAt)
    val sp = findMsg(msgs, 0x0001, "dataspace")
    require(b.get(sp.toInt) == 1 && b.get(sp.toInt + 1) == 1,
      "HDF5: only 1-D version-1 dataspaces supported")
    val n = b.getLong(sp.toInt + 8)
    val dt = findMsg(msgs, 0x0003, "datatype")
    val clsVer = b.get(dt.toInt) & 0xFF
    require((clsVer >> 4) == 1, "HDF5: unsupported datatype version")
    val cls = clsVer & 0x0F
    require((b.get(dt.toInt + 1) & 0x01) == 0, "HDF5: big-endian data unsupported")
    val size = b.getInt(dt.toInt + 4)
    val ly = findMsg(msgs, 0x0008, "data layout")
    require(b.get(ly.toInt) == 3 && b.get(ly.toInt + 1) == 1,
      "HDF5: only version-3 contiguous layout supported")
    (cls, size, n, b.getLong(ly.toInt + 2))
  }

  def readF64(bytes: Array[Byte], path: String): Array[Double] = {
    val b = buf(bytes)
    val (cls, size, n, at) = datasetInfo(b, resolve(b, bytes, path))
    require(cls == 1 && size == 8, s"HDF5: $path is not an f64 dataset (class $cls size $size)")
    Array.tabulate(n.toInt)(i => b.getDouble((at + 8L * i).toInt))
  }

  def readI32(bytes: Array[Byte], path: String): Array[Int] = {
    val b = buf(bytes)
    val (cls, size, n, at) = datasetInfo(b, resolve(b, bytes, path))
    require(cls == 0 && size == 4, s"HDF5: $path is not an i32 dataset (class $cls size $size)")
    Array.tabulate(n.toInt)(i => b.getInt((at + 4L * i).toInt))
  }

  def readI64(bytes: Array[Byte], path: String): Array[Long] = {
    val b = buf(bytes)
    val (cls, size, n, at) = datasetInfo(b, resolve(b, bytes, path))
    require(cls == 0 && size == 8, s"HDF5: $path is not an i64 dataset (class $cls size $size)")
    Array.tabulate(n.toInt)(i => b.getLong((at + 8L * i).toInt))
  }

  /** Names of a group's members (reader-side listing, for tests). */
  def ls(bytes: Array[Byte], path: String): Seq[String] = {
    val b = buf(bytes)
    groupChildren(b, resolve(b, bytes, path)).map(_._1)
  }

  // ---------------------------------------------------------------
  // deterministic QLP-shaped fixture (closed form in (k, i) so the
  // DuckDB oracle recomputes every decoded value without an HDF5
  // reader of its own — the s14/s10 oracle technique)
  // ---------------------------------------------------------------

  val N_ROWS = 1000

  /** Same positive LCG mix as Fits.rMix — valid DuckDB SQL verbatim. */
  def rMix(k: Long, i: Long): Long =
    (k * 2654435761L + i * 1103515245L + 12345L) % 2147483648L

  /** Closed-form QLP sample for file k, row i: BJD on a 0.002-day
    * cadence, raw MAGNITUDE with a transit-like BRIGHTNESS DIP
    * (+0.01 mag every 360th sample for 18 samples), deterministic NaN
    * gaps, raised QFLAG rows. */
  def sample(k: Int, i: Int): (Double, Double, Int) = {
    val r = rMix(k, i)
    val dip = if (i % 360 < 18) 0.01 else 0.0
    val tmag =
      if (r % 131 == 0) Double.NaN
      else 12.0 + (r % 200).toDouble / 1000.0 + dip
    (1000.0 + (k - 1) * 15.0 + i * 0.002, tmag,
      if (r % 97 == 0) 8 else 0)
  }

  /** The full QLP-shaped fixture file for target/orbit k: the exact
    * group hierarchy read_qlop opens (main.py:6423–6426). */
  def fixtureFile(k: Int): Array[Byte] = {
    val rows = (0 until N_ROWS).map(i => sample(k, i))
    write(Grp(Seq(
      "LightCurve" -> Grp(Seq(
        "BJD" -> DsetF64(rows.map(_._1).toArray),
        "QFLAG" -> DsetI32(rows.map(_._3).toArray),
        "AperturePhotometry" -> Grp(Seq(
          "Aperture_002" -> Grp(Seq(
            "RawMagnitude" -> DsetF64(rows.map(_._2).toArray))))))))))
  }
}
