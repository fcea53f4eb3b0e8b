package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Igor packed-experiment (.pxp) container walker — parity for the
  * reference's pxp branch of `readIgorBinFile` (`fprocessing.py:324-351`,
  * which delegates to the public `igor` package; record layout per Igor
  * Pro Technical Note PTN003). A .pxp file is a flat sequence of
  * records:
  *
  * {{{
  * PackedFileRecordHeader {      // 8 bytes, little-endian
  *   UInt16 recordType;          // bit 0x8000 = superceded, mask it
  *   Int16  version;
  *   Int32  numDataBytes;        // record payload size
  * }
  * }}}
  *
  * Record types used here: 3 = wave (payload is exactly an .ibw image,
  * parsed by [[IgorIbw.fromBytes]]), 9 = data-folder start (payload is a
  * 32-byte C-string folder name), 10 = data-folder end. Other record
  * types (variables, history, procedures, recreation macros) carry no
  * wave data and are skipped, matching what the reference keeps.
  */
object IgorPxp {

  /** One wave plus its data-folder path inside the experiment. */
  final case class Entry(folder: Seq[String], wave: IgorIbw.Wave)

  private val REC_WAVE = 3
  private val REC_FOLDER_START = 9
  private val REC_FOLDER_END = 10

  def read(path: String): Seq[Entry] = fromBytes(Files.readAllBytes(Paths.get(path)))

  def fromBytes(bytes: Array[Byte]): Seq[Entry] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    val folders = scala.collection.mutable.ArrayBuffer.empty[String]
    var off = 0
    while (off + 8 <= bytes.length) {
      val recordType = bb.getShort(off) & 0x7fff // mask the superceded bit
      val numDataBytes = bb.getInt(off + 4)
      require(numDataBytes >= 0 && off + 8 + numDataBytes <= bytes.length,
        s"pxp record at offset $off overruns the file ($numDataBytes data bytes)")
      val payload = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + numDataBytes)
      recordType match {
        case REC_WAVE =>
          out += Entry(folders.toSeq, IgorIbw.fromBytes(payload))
        case REC_FOLDER_START =>
          folders += new String(payload.takeWhile(_ != 0), "ISO-8859-1")
        case REC_FOLDER_END =>
          if (folders.nonEmpty) folders.remove(folders.length - 1)
        case _ => // variables/history/procedure records carry no waves
      }
      off += 8 + numDataBytes
    }
    out.toSeq
  }

  /** Write a packed experiment with the given folder-pathed waves.
    * Shared folder prefixes become nested data folders in path order.
    */
  def write(path: String, entries: Seq[Entry]): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    def record(recordType: Int, payload: Array[Byte], version: Int = 0): Unit = {
      val h = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      h.putShort(0, recordType.toShort)
      h.putShort(2, version.toShort)
      h.putInt(4, payload.length)
      buf.write(h.array()); buf.write(payload)
    }
    def folderName(n: String): Array[Byte] = {
      val b = new Array[Byte](32)
      val s = n.getBytes("ISO-8859-1").take(31)
      System.arraycopy(s, 0, b, 0, s.length)
      b
    }
    var open = Seq.empty[String]
    entries.foreach { e =>
      // close folders down to the common prefix, then open the rest
      val common = open.zip(e.folder).takeWhile { case (a, b) => a == b }.length
      (common until open.length).foreach(_ => record(REC_FOLDER_END, Array.empty))
      (common until e.folder.length).foreach(i =>
        record(REC_FOLDER_START, folderName(e.folder(i))))
      open = e.folder
      // wave records carry the embedded wave's version in their header
      record(REC_WAVE, IgorIbw.toBytes(e.wave), version = 5)
    }
    open.foreach(_ => record(REC_FOLDER_END, Array.empty))
    Files.write(Paths.get(path), buf.toByteArray)
  }
}
