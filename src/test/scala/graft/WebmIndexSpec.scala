package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, WebmIndex}

/** The Matroska/WebM sample-index demuxer against a minimal
  * grammar-conformant EBML file built in-test: EBML header + Segment
  * holding Tracks (a video track AND an audio track) and two Clusters of
  * SimpleBlocks for both tracks. The parser must recover exactly the
  * video track's unlaced frame ranges in stream order — and reject laced
  * blocks, foreign tracks, and non-EBML payloads. */
class WebmIndexSpec extends AnyFunSuite {

  /** EBML element: verbatim ID bytes + 1-or-8-byte size varint + payload. */
  private def el(idBytes: Array[Byte], payload: Array[Byte]): Array[Byte] = {
    val size =
      if (payload.length < 127) Array((0x80 | payload.length).toByte)
      else {
        val b = new Array[Byte](8)
        b(0) = 0x01
        var v = payload.length.toLong
        for (i <- 7 to 1 by -1) { b(i) = (v & 0xff).toByte; v >>= 8 }
        b
      }
    idBytes ++ size ++ payload
  }
  private def id(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  private val frames: Seq[Array[Byte]] =
    Seq(10, 20, 30).zipWithIndex.map { case (n, i) => Array.fill(n)((i + 1).toByte) }
  private val audioFrame = Array.fill(99)(0x7f.toByte)

  /** SimpleBlock payload: track varint + s16 timestamp + flags + frame. */
  private def simpleBlock(track: Int, frame: Array[Byte], flags: Int = 0): Array[Byte] =
    el(id(0xA3), Array[Byte]((0x80 | track).toByte, 0, 0, flags.toByte) ++ frame)

  private def trackEntry(num: Int, typ: Int): Array[Byte] =
    el(id(0xAE), el(id(0xD7), Array(num.toByte)) ++ el(id(0x83), Array(typ.toByte)))

  private def buildWebm(videoFlags: Int = 0): Array[Byte] = {
    val ebmlHeader = el(id(0x1A, 0x45, 0xDF, 0xA3),
      el(id(0x42, 0x82), "webm".getBytes("ISO-8859-1")))
    val tracks = el(id(0x16, 0x54, 0xAE, 0x6B),
      trackEntry(num = 2, typ = 2) ++ // audio FIRST: type filter must skip it
        trackEntry(num = 1, typ = 1))
    val cluster1 = el(id(0x1F, 0x43, 0xB6, 0x75),
      el(id(0xE7), Array(0.toByte)) ++ // cluster timestamp
        simpleBlock(1, frames(0), videoFlags) ++
        simpleBlock(2, audioFrame) ++ // foreign track: must be excluded
        simpleBlock(1, frames(1), videoFlags))
    val cluster2 = el(id(0x1F, 0x43, 0xB6, 0x75),
      el(id(0xE7), Array(1.toByte)) ++
        // BlockGroup>Block shape, same frame layout as SimpleBlock
        el(id(0xA0), el(id(0xA1),
          Array[Byte]((0x80 | 1).toByte, 0, 0, videoFlags.toByte) ++ frames(2))))
    val segment = el(id(0x18, 0x53, 0x80, 0x67), tracks ++ cluster1 ++ cluster2)
    ebmlHeader ++ segment
  }

  test("index recovers the video track's frames in stream order, audio excluded") {
    val webm = buildWebm()
    val idx = WebmIndex.sampleIndex(webm).getOrElse(fail("parser rejected a valid file"))
    assert(idx.map(_._2) == Seq(10, 20, 30))
    idx.zipWithIndex.foreach { case ((off, sz), i) =>
      assert(webm.slice(off.toInt, off.toInt + sz).toSeq == frames(i).toSeq,
        s"frame $i bytes differ at offset $off")
    }
  }

  test("sampleFrames demuxes webm through the index with real checksums") {
    val r = Multimodal.MediaRecord(9L, "video", buildWebm())
    val out = Multimodal.sampleWebmFrames(r, stride = 2)
      .getOrElse(fail("webm path did not engage"))
    assert(out.map(_.frame_idx) == Vector(0, 2))
    assert(out.map(_.n_bytes) == Vector(10L, 30L))
    def ck(b: Array[Byte]): Long =
      b.foldLeft(0L)((a, x) => (a * 31 + (x & 0xff)) % 1000000007L)
    assert(out.map(_.checksum) == Vector(ck(frames(0)), ck(frames(2))))
  }

  test("laced blocks are skipped, never mis-sliced") {
    // lacing bits 01 (Xiph): the parser cannot slice frame boundaries
    // without lace-size decoding, so these blocks must contribute nothing
    assert(WebmIndex.sampleIndex(buildWebm(videoFlags = 0x02)).isEmpty)
  }

  test("non-EBML and truncated payloads are rejected") {
    assert(WebmIndex.sampleIndex("plain text, no container".getBytes).isEmpty)
    assert(WebmIndex.sampleIndex(Array.empty[Byte]).isEmpty)
    val truncated = buildWebm().dropRight(25)
    // a block whose declared size runs past EOF must stop the walk, not slice
    assert(WebmIndex.sampleIndex(truncated).forall(idx =>
      idx.forall { case (off, sz) => off + sz <= truncated.length }))
  }
}
