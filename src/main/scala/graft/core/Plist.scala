package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Read-only Apple property-list decoder (binary `bplist00` + XML).
  *
  * The webarchive container format is a plist dict (see
  * /root/reference/webarchive/webarchive.py:491-527, which delegates to
  * CPython plistlib). This is a from-scratch reader of the publicly
  * documented format covering the subset webarchives use: dict, array,
  * string (ascii/utf-16be), data, int, real, bool, date.
  */
object Plist {

  sealed trait Value
  final case class PStr(s: String) extends Value
  final case class PData(b: Array[Byte]) extends Value
  final case class PInt(v: Long) extends Value
  final case class PReal(v: Double) extends Value
  final case class PBool(v: Boolean) extends Value
  case object PNull extends Value
  final case class PArray(items: Vector[Value]) extends Value
  final case class PDict(entries: Vector[(String, Value)]) extends Value {
    lazy val map: Map[String, Value] = entries.toMap
    def get(k: String): Option[Value] = map.get(k)
  }

  final class PlistException(msg: String) extends RuntimeException(msg)

  def parse(bytes: Array[Byte]): Value = {
    if (bytes.length >= 8 && new String(bytes, 0, 8, StandardCharsets.US_ASCII).startsWith("bplist"))
      parseBinary(bytes)
    else parseXml(bytes)
  }

  // --- binary ---------------------------------------------------------------

  private def parseBinary(bytes: Array[Byte]): Value = {
    if (bytes.length < 40) throw new PlistException("truncated bplist")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val tlr = bytes.length - 32
    val offsetIntSize = bytes(tlr + 6) & 0xff
    val objectRefSize = bytes(tlr + 7) & 0xff
    val numObjects = buf.getLong(tlr + 8)
    val topObject = buf.getLong(tlr + 16)
    val offsetTableOffset = buf.getLong(tlr + 24)
    if (numObjects < 0 || numObjects > Int.MaxValue) throw new PlistException("bad object count")

    def readUint(pos: Int, size: Int): Long = {
      var v = 0L
      var i = 0
      while (i < size) { v = (v << 8) | (bytes(pos + i) & 0xffL); i += 1 }
      v
    }

    val offsets = new Array[Long](numObjects.toInt)
    var i = 0
    while (i < numObjects) {
      offsets(i) = readUint((offsetTableOffset + i.toLong * offsetIntSize).toInt, offsetIntSize)
      i += 1
    }

    val seen = new java.util.HashSet[Integer]()

    def readObject(ref: Int): Value = {
      if (ref < 0 || ref >= offsets.length) throw new PlistException("bad ref")
      if (!seen.add(ref)) throw new PlistException("cyclic plist")
      try readObjectAt(offsets(ref).toInt)
      finally seen.remove(ref)
    }

    def sizeAndPos(marker: Int, pos0: Int): (Int, Int) = {
      val n = marker & 0x0f
      if (n != 0x0f) (n, pos0)
      else {
        val m2 = bytes(pos0) & 0xff
        if ((m2 >> 4) != 1) throw new PlistException("bad length int marker")
        val cnt = 1 << (m2 & 0x0f)
        (readUint(pos0 + 1, cnt).toInt, pos0 + 1 + cnt)
      }
    }

    def readObjectAt(pos: Int): Value = {
      val marker = bytes(pos) & 0xff
      (marker >> 4) match {
        case 0x0 => marker match {
          case 0x00 => PNull
          case 0x08 => PBool(false)
          case 0x09 => PBool(true)
          case _    => PNull
        }
        case 0x1 =>
          val cnt = 1 << (marker & 0x0f)
          if (cnt == 8) PInt(buf.getLong(pos + 1))
          else PInt(readUint(pos + 1, cnt))
        case 0x2 =>
          (marker & 0x0f) match {
            case 2 => PReal(buf.getFloat(pos + 1).toDouble)
            case 3 => PReal(buf.getDouble(pos + 1))
            case _ => throw new PlistException("bad real size")
          }
        case 0x3 => PReal(buf.getDouble(pos + 1)) // date: secs since 2001-01-01
        case 0x4 =>
          val (n, p) = sizeAndPos(marker, pos + 1)
          PData(java.util.Arrays.copyOfRange(bytes, p, p + n))
        case 0x5 =>
          val (n, p) = sizeAndPos(marker, pos + 1)
          PStr(new String(bytes, p, n, StandardCharsets.US_ASCII))
        case 0x6 =>
          val (n, p) = sizeAndPos(marker, pos + 1)
          PStr(new String(bytes, p, n * 2, StandardCharsets.UTF_16BE))
        case 0x8 =>
          val cnt = (marker & 0x0f) + 1
          PInt(readUint(pos + 1, cnt)) // UID
        case 0xA | 0xC =>
          val (n, p) = sizeAndPos(marker, pos + 1)
          val items = Vector.tabulate(n)(k => readObject(readUint(p + k * objectRefSize, objectRefSize).toInt))
          PArray(items)
        case 0xD =>
          val (n, p) = sizeAndPos(marker, pos + 1)
          val entries = Vector.tabulate(n) { k =>
            val keyRef = readUint(p + k * objectRefSize, objectRefSize).toInt
            val valRef = readUint(p + (n + k) * objectRefSize, objectRefSize).toInt
            val key = readObject(keyRef) match {
              case PStr(s) => s
              case other   => throw new PlistException(s"non-string dict key: $other")
            }
            key -> readObject(valRef)
          }
          PDict(entries)
        case t => throw new PlistException(f"unsupported marker 0x$marker%02x")
      }
    }

    readObject(topObject.toInt)
  }

  // --- XML ------------------------------------------------------------------

  private def parseXml(bytes: Array[Byte]): Value = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    val doc = f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(bytes))
    val root = doc.getDocumentElement
    if (root.getTagName != "plist") throw new PlistException("not a plist")
    val first = childElems(root).headOption.getOrElse(throw new PlistException("empty plist"))
    fromXml(first)
  }

  private def childElems(n: org.w3c.dom.Node): Vector[org.w3c.dom.Element] = {
    val l = n.getChildNodes
    (0 until l.getLength).iterator.map(l.item).collect {
      case e: org.w3c.dom.Element => e
    }.toVector
  }

  private def fromXml(e: org.w3c.dom.Element): Value = e.getTagName match {
    case "dict" =>
      val kids = childElems(e)
      val entries = kids.grouped(2).collect {
        case Vector(k, v) if k.getTagName == "key" => k.getTextContent -> fromXml(v)
      }.toVector
      PDict(entries)
    case "array"   => PArray(childElems(e).map(fromXml))
    case "string"  => PStr(e.getTextContent)
    case "data"    => PData(java.util.Base64.getMimeDecoder.decode(e.getTextContent.trim))
    case "integer" => PInt(e.getTextContent.trim.toLong)
    case "real"    => PReal(e.getTextContent.trim.toDouble)
    case "true"    => PBool(true)
    case "false"   => PBool(false)
    case "date"    => PStr(e.getTextContent.trim)
    case t         => throw new PlistException(s"unsupported xml plist tag <$t>")
  }
}
