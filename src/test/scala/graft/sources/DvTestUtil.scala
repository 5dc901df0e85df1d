package graft.sources

/** Test-side encoders for hand-crafting deletion vectors: Z85 encode
  * and a portable RoaringBitmapArray serializer (array containers) —
  * the write-side mirrors of the production decoders, shared by the
  * delta read/stream suites.
  */
object DvTestUtil {

  private val z85Chars =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0)
    val sb = new StringBuilder
    bytes.grouped(4).foreach { g =>
      var v = 0L
      g.foreach(b => v = (v << 8) | (b & 0xFFL))
      val digits = new Array[Char](5)
      var i = 4
      while (i >= 0) { digits(i) = z85Chars((v % 85).toInt); v /= 85; i -= 1 }
      sb.appendAll(digits)
    }
    sb.toString
  }

  /** Portable RoaringBitmapArray bytes for small row-index sets
    * (array containers only — what delta-spark's portable writer emits
    * for test-sized DVs).
    */
  def roaringArrayBytes(rows: Seq[Long]): Array[Byte] = {
    val byBitmap = rows.sorted.groupBy(r => (r >> 32).toInt)
    val n = if (byBitmap.isEmpty) 0 else byBitmap.keys.max + 1
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    def le32(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF) }
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le32(1681511377) // portable magic
    le32(n); le32(0) // bitmap count as 8-byte LE
    (0 until n).foreach { b =>
      val vals = byBitmap.getOrElse(b, Nil).map(v => (v & 0xFFFFFFFFL).toInt)
      val byKey = vals.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      le32(12346) // no-run cookie
      le32(byKey.size)
      byKey.foreach { case (k, vs) => le16(k); le16(vs.size - 1) }
      var off = 4 + 4 + 4 * byKey.size + 4 * byKey.size
      byKey.foreach { case (_, vs) => le32(off); off += 2 * vs.size }
      byKey.foreach { case (_, vs) => vs.foreach(v => le16(v & 0xFFFF)) }
    }
    out.flush(); bos.toByteArray
  }

  /** The `deletionVector` JSON fragment for an inline ("i") DV. */
  def inlineDvJson(rows: Seq[Long]): String = {
    val bm = roaringArrayBytes(rows)
    val padded = bm ++ Array.fill[Byte]((4 - bm.length % 4) % 4)(0)
    s""""deletionVector":{"storageType":"i","pathOrInlineDv":"${z85Encode(padded)}",""" +
      s""""sizeInBytes":${bm.length},"cardinality":${rows.size}}"""
  }
}
