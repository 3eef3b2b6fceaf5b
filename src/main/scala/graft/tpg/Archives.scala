package graft.tpg

import java.io.{File, FileOutputStream}
import java.nio.{ByteBuffer, CharBuffer}
import java.nio.charset.{CodingErrorAction, StandardCharsets}
import java.nio.file.Files

/** Driver-side archive + charset utilities shared by the ingest modules
  * (reference `src/01_ingest_gtfs.py` and `src/02_ingest_istdaten.py:113-207`).
  *
  * Archives are enumerated/extracted on the driver with commons-compress
  * (Deflate64-capable, where `java.util.zip` is not — the opentransportdata
  * ZIPs use it); members then become plain distributed CSV scans. Feeds are
  * MBs, so driver-side extraction is not a scale concern — the data volume
  * lives in the extracted scans, which are fully distributed.
  */
object Archives {

  /** List an archive's member names. */
  def listMembers(zipPath: String): Seq[String] = {
    import org.apache.commons.compress.archivers.zip.ZipFile
    val zf = ZipFile.builder().setFile(new File(zipPath)).get()
    try {
      val it = zf.getEntries
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasMoreElements) {
        val e = it.nextElement()
        if (!e.isDirectory) names += e.getName
      }
      names.toSeq
    } finally zf.close()
  }

  /** Extract the members accepted by `wanted` to a temp dir; returns
    * member name → local path (insertion order = archive order).
    */
  def extractMembers(zipPath: String, wanted: String => Boolean): Seq[(String, String)] = {
    import org.apache.commons.compress.archivers.zip.ZipFile
    val tmp = Files.createTempDirectory("graft_zip_").toFile
    val zf = ZipFile.builder().setFile(new File(zipPath)).get()
    try {
      val it = zf.getEntries
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasMoreElements) {
        val e = it.nextElement()
        if (!e.isDirectory && wanted(e.getName)) {
          // Preserve the member's directory structure under the temp dir:
          // flattening to basenames would let `a/istdaten.csv` and
          // `b/istdaten.csv` silently overwrite each other. Canonical-path
          // check rejects `../` traversal (zip-slip).
          val dst = new File(tmp, e.getName)
          if (!dst.getCanonicalPath.startsWith(tmp.getCanonicalPath + File.separator))
            sys.error(s"archive member escapes extraction dir: ${e.getName}")
          dst.getParentFile.mkdirs()
          val os = new FileOutputStream(dst)
          try zf.getInputStream(e).transferTo(os) finally os.close()
          out += e.getName -> dst.getAbsolutePath
        }
      }
      out.toSeq
    } finally zf.close()
  }

  /** Strict UTF-8 validity probe. The reference retries Latin-1 *per file*
    * on `UnicodeDecodeError` (`02:184-207`); Spark's CSV reader never
    * throws — it silently substitutes U+FFFD — so validity must be decided
    * before the read. Streams up to `probeBytes` through a REPORT-mode
    * decoder; a multi-byte sequence truncated at the probe boundary is NOT
    * counted as invalid (endOfInput=false). The bounded probe keeps the
    * driver-side cost per file constant; Latin-1 transit data (station
    * names with umlauts/accents) shows up within the first MBs in practice.
    */
  def isValidUtf8(path: String, probeBytes: Int = 4 << 20): Boolean = {
    val f = new File(path)
    val n = math.min(f.length(), probeBytes.toLong).toInt
    val bytes = new Array[Byte](n)
    val in = new java.io.DataInputStream(new java.io.FileInputStream(f))
    try in.readFully(bytes) finally in.close()
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val bb = ByteBuffer.wrap(bytes)
    val cb = CharBuffer.allocate(64 * 1024)
    var res = dec.decode(bb, cb, false)
    while (res.isOverflow) { cb.clear(); res = dec.decode(bb, cb, false) }
    !res.isError
  }
}
