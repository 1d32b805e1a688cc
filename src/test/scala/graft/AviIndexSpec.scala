package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO

import graft.operators.{AviIndex, Multimodal}

/** The RIFF/AVI demuxer against a real (minimal, spec-conformant) MJPEG
  * AVI built in-test: LIST hdrl declaring an AUDIO stream 0 and a VIDEO
  * stream 1 (so the stream-numbering logic is actually exercised — frames
  * are '01dc', not the lazy '00dc'), LIST movi interleaving '00wb' audio
  * chunks, '01dc' JPEG frames (one inside a LIST 'rec ' group), and one
  * odd-sized non-JPEG '01db' frame (exercises even-padding and the
  * coded-byte fallback). The frames are REAL JPEGs written by ImageIO, so
  * the layer above must decode REAL pixels — the one container+codec pair
  * fully inside the JDK. */
class AviIndexSpec extends SparkSpec {

  // RIFF is little-endian, unlike ISO BMFF
  private def u32le(x: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(x).array()

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
    id.getBytes("ISO-8859-1") ++ u32le(data.length) ++ data ++ pad
  }
  private def list(typ: String, kids: Array[Byte]*): Array[Byte] = {
    val body = typ.getBytes("ISO-8859-1") ++ kids.flatten
    "LIST".getBytes("ISO-8859-1") ++ u32le(body.length) ++ body
  }
  private def riff(kids: Array[Byte]*): Array[Byte] = {
    val body = "AVI ".getBytes("ISO-8859-1") ++ kids.flatten
    "RIFF".getBytes("ISO-8859-1") ++ u32le(body.length) ++ body
  }

  /** strh whose fccType is the given 4cc; the rest of the 56-byte header
    * is zeros (the demuxer only reads the type). */
  private def strh(fccType: String): Array[Byte] =
    chunk("strh", fccType.getBytes("ISO-8859-1") ++ Array.fill[Byte](52)(0))

  private def strl(fccType: String): Array[Byte] =
    list("strl", strh(fccType), chunk("strf", Array.fill[Byte](40)(0)))

  /** A real JPEG of a solid color, sized so frames differ. */
  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "jpg", bos), "JDK lost its JPEG writer?")
    bos.toByteArray
  }

  private val jpegs = Vector(
    jpeg(8, 6, 0xff0000), jpeg(8, 6, 0x00ff00), jpeg(8, 6, 0x0000ff))
  // odd length on purpose: the NEXT chunk must start one pad byte later
  private val rawFrame: Array[Byte] = Array.tabulate[Byte](33)(i => i.toByte)
  private val audio: Array[Byte] = Array.fill[Byte](16)(0x55)

  /** stream 0 = audio, stream 1 = MJPEG video; frame 1 rides inside a
    * LIST 'rec ' interleave group; frame order: j0, raw, j1, j2. */
  private def buildAvi(): Array[Byte] = riff(
    list("hdrl", chunk("avih", Array.fill[Byte](56)(0)),
      strl("auds"), strl("vids")),
    list("movi",
      chunk("00wb", audio),
      chunk("01dc", jpegs(0)),
      chunk("01db", rawFrame),
      list("rec ", chunk("00wb", audio), chunk("01dc", jpegs(1))),
      chunk("01dc", jpegs(2))),
    chunk("idx1", Array.fill[Byte](64)(0)))

  test("index recovers the video stream's frames exactly, skipping audio") {
    val avi = buildAvi()
    val idx = AviIndex.sampleIndex(avi).getOrElse(fail("rejected a valid AVI"))
    val expected = Vector(jpegs(0), rawFrame, jpegs(1), jpegs(2))
    assert(idx.length == 4)
    idx.zip(expected).foreach { case ((off, sz), want) =>
      assert(sz == want.length)
      assert(avi.slice(off.toInt, off.toInt + sz).toSeq == want.toSeq,
        s"sliced bytes differ at offset $off")
    }
  }

  test("sampleAviFrames decodes MJPEG frames to REAL pixels") {
    val r = Multimodal.MediaRecord(9L, "video", buildAvi())
    val out = Multimodal.sampleAviFrames(r, stride = 1)
      .getOrElse(fail("avi path did not engage"))
    assert(out.map(_.frame_idx) == Vector(0, 1, 2, 3))
    // JPEG frames decode: n_bytes is the RASTER size (8·6·3), not the
    // compressed chunk size; the raw frame falls back to coded bytes
    assert(out(0).n_bytes == 8L * 6 * 3)
    assert(out(2).n_bytes == 8L * 6 * 3)
    assert(out(3).n_bytes == 8L * 6 * 3)
    assert(out(1).n_bytes == rawFrame.length.toLong)
    // decoded content distinguishes the (differently-colored) frames
    assert(Set(out(0).checksum, out(2).checksum, out(3).checksum).size == 3,
      "distinct solid-color frames decoded to identical rasters")
    // stride over DEMUXED frame order
    val strided = Multimodal.sampleAviFrames(r, stride = 2).get
    assert(strided.map(_.frame_idx) == Vector(0, 2))
  }

  test("sampleFrames dispatches AVI payloads through the real demuxer") {
    import Multimodal.MediaRecord
    import spark.implicits._
    val media = Seq(MediaRecord(1L, "video", buildAvi())).toDS()
    val frames = Multimodal.sampleFrames(media, stride = 1).collect()
    // the stub would chunk the payload into 64-byte windows (dozens of
    // rows); the real path yields exactly the 4 demuxed frames
    assert(frames.length == 4)
    assert(frames.map(_.n_bytes).count(_ == 8L * 6 * 3) == 3)
  }

  private def avix(kids: Array[Byte]*): Array[Byte] = {
    val body = "AVIX".getBytes("ISO-8859-1") ++ kids.flatten
    "RIFF".getBytes("ISO-8859-1") ++ u32le(body.length) ++ body
  }

  test("OpenDML AVIX extension chunks contribute their movi frames in order") {
    val extra = Vector(jpeg(8, 6, 0xffff00), jpeg(8, 6, 0x00ffff))
    val file = buildAvi() ++
      avix(list("movi", chunk("01dc", extra(0)))) ++
      avix(list("movi", chunk("00wb", audio), chunk("01dc", extra(1))))
    val idx = AviIndex.sampleIndex(file).getOrElse(fail("ODML file rejected"))
    val expected = Vector(jpegs(0), rawFrame, jpegs(1), jpegs(2)) ++ extra
    assert(idx.length == 6, "primary 4 + 2 extension frames")
    idx.zip(expected).foreach { case ((off, sz), want) =>
      assert(sz == want.length)
      assert(file.slice(off.toInt, off.toInt + sz).toSeq == want.toSeq,
        s"sliced bytes differ at offset $off")
    }
  }

  test("a truncated or malformed AVIX rejects the file; trailing junk does not") {
    val ext = avix(list("movi", chunk("01dc", jpegs(0))))
    val odml = buildAvi() ++ ext
    // committed-to extension truncated mid-chunk → reject, don't salvage
    assert(AviIndex.sampleIndex(odml.dropRight(6)).isEmpty)
    // an AVIX with no movi is malformed
    assert(AviIndex.sampleIndex(buildAvi() ++
      avix(chunk("JUNK", Array.fill[Byte](8)(0)))).isEmpty)
    // non-AVIX trailing bytes stay tolerated: primary frames only
    val junky = buildAvi() ++ "not a riff chunk".getBytes("ISO-8859-1")
    assert(AviIndex.sampleIndex(junky).map(_.length).contains(4))
  }

  test("truncated, non-AVI, and over-nested files are rejected, never thrown") {
    val avi = buildAvi()
    assert(AviIndex.sampleIndex(avi.dropRight(10)).isEmpty, "truncation accepted")
    // RIFF but not AVI (a WAVE) must not parse
    val wave = "RIFF".getBytes ++ u32le(8) ++ "WAVE".getBytes ++ u32le(0)
    assert(AviIndex.sampleIndex(wave).isEmpty)
    assert(AviIndex.sampleIndex(Array.empty[Byte]).isEmpty)
    assert(AviIndex.sampleIndex("RIFF".getBytes).isEmpty)
    // a declared chunk size overrunning its parent rejects the file
    val bad = riff(
      list("hdrl", chunk("avih", Array.fill[Byte](56)(0)), strl("vids")),
      list("movi", "00dc".getBytes ++ u32le(Int.MaxValue) ++ Array.fill[Byte](4)(1)))
    assert(AviIndex.sampleIndex(bad).isEmpty)
    // rec-in-rec nesting is malformed per spec → reject
    val nested = riff(
      list("hdrl", chunk("avih", Array.fill[Byte](56)(0)), strl("vids")),
      list("movi", list("rec ", list("rec ", chunk("00dc", Array.fill[Byte](4)(1))))))
    assert(AviIndex.sampleIndex(nested).isEmpty)
  }

  test("an AVI with no video stream or a single frame yields no frames") {
    val audioOnly = riff(
      list("hdrl", chunk("avih", Array.fill[Byte](56)(0)), strl("auds")),
      list("movi", chunk("00wb", audio)))
    assert(AviIndex.sampleIndex(audioOnly).isEmpty)
    val oneFrame = riff(
      list("hdrl", chunk("avih", Array.fill[Byte](56)(0)), strl("vids")),
      list("movi", chunk("00dc", jpegs(0))))
    // the INDEX sees it, but the sampler refuses single-frame "video"
    assert(AviIndex.sampleIndex(oneFrame).map(_.length).contains(1))
    val r = Multimodal.MediaRecord(1L, "video", oneFrame)
    assert(Multimodal.sampleAviFrames(r, 1).isEmpty)
  }

  test("solid-gray JPEG round-trip is EXACT for every value — the mm_video_pixels contract") {
    // the analytic-oracle premise: r=g=b makes YCbCr lossless and the
    // constant block's DC is a multiple of 8, so decode == encode exactly
    (0 to 255).foreach { v =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.jpegSolidGray(v, Multimodal.MjpegW, Multimodal.MjpegH)))
      assert(img.getWidth == Multimodal.MjpegW && img.getHeight == Multimodal.MjpegH)
      for (x <- 0 until img.getWidth; y <- 0 until img.getHeight) {
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xff) == v && ((p >> 8) & 0xff) == v && (p & 0xff) == v,
          s"gray $v decoded to ${p.toHexString} at ($x,$y)")
      }
    }
  }

  test("mm_video_pixels frames agree with a SECOND decode path (readRaster)") {
    // ImageIO.read goes through color-model conversion; ImageReader.readRaster
    // reads the decoded raster directly — two independent JDK decode paths
    (Seq(0L, 5L, 13L, 44L)).foreach { id =>
      val payload = Multimodal.syntheticMjpegAvi(id)
      val idx = AviIndex.sampleIndex(payload).get
      idx.zipWithIndex.foreach { case ((off, sz), i) =>
        val slice = java.util.Arrays.copyOfRange(payload, off.toInt, off.toInt + sz)
        val expected = Multimodal.mjpegGray(id, i)
        // path 1: BufferedImage
        val img = ImageIO.read(new java.io.ByteArrayInputStream(slice))
        assert((img.getRGB(3, 4) & 0xff) == expected)
        // path 2: raw raster through ImageReader (YCbCr->RGB done by the
        // reader's raster path independently of the BufferedImage route)
        val rd = ImageIO.getImageReadersByFormatName("jpeg").next()
        rd.setInput(ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(slice)))
        val raster = rd.read(0).getRaster
        rd.dispose()
        for (x <- 0 until Multimodal.MjpegW; y <- 0 until Multimodal.MjpegH;
             c <- 0 until raster.getNumBands) {
          assert(raster.getSample(x, y, c) == expected,
            s"avi $id frame $i band $c at ($x,$y): ${raster.getSample(x, y, c)} vs $expected")
        }
      }
    }
  }
}
