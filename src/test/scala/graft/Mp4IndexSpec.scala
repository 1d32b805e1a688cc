package graft

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Mp4Index, Multimodal}

/** The mp4 sample-index demuxer against a real (minimal, spec-conformant)
  * ISO BMFF file built in-test: ftyp + mdat carrying 5 coded frames +
  * moov/trak/mdia(hdlr=vide)/minf/stbl with stsz/stsc/stco describing
  * them. The parser must recover each frame's exact (offset, size) from
  * the tables alone — and refuse (None, stub fallback) anything whose
  * index walks outside the payload. */
class Mp4IndexSpec extends AnyFunSuite {

  private def box(typ: String, payloads: Array[Byte]*): Array[Byte] = {
    val total = 8 + payloads.map(_.length).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(total).put(typ.getBytes("ISO-8859-1"))
    payloads.foreach(bb.put)
    bb.array()
  }
  private def u32s(xs: Int*): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * xs.length)
    xs.foreach(bb.putInt)
    bb.array()
  }

  // 5 coded "frames" with distinct sizes and recognizable content
  private val frameSizes = Seq(10, 20, 30, 40, 50)
  private val frames: Seq[Array[Byte]] =
    frameSizes.zipWithIndex.map { case (n, i) => Array.fill(n)((i + 1).toByte) }

  private def buildMp4(chunkOffset: Int => Int = identity): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes, u32s(0), "isom".getBytes)
    val mdat = box("mdat", frames.flatten.toArray)
    // chunk 1 holds all 5 samples, laid head-to-tail at the mdat payload
    val firstFrameOffset = chunkOffset(ftyp.length + 8)
    val stsz = box("stsz", u32s(0 /*ver+flags*/, 0 /*non-uniform*/, 5), u32s(frameSizes: _*))
    val stsc = box("stsc", u32s(0, 1 /*one run*/), u32s(1, 5, 1))
    val stco = box("stco", u32s(0, 1 /*one chunk*/), u32s(firstFrameOffset))
    val stbl = box("stbl", stsz, stsc, stco)
    val minf = box("minf", stbl)
    // hdlr payload: ver+flags(4), pre_defined(4), handler(4cc), reserved
    val hdlr = box("hdlr", u32s(0, 0), "vide".getBytes, u32s(0, 0, 0), Array[Byte](0))
    val mdia = box("mdia", hdlr, minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)
    ftyp ++ mdat ++ moov
  }

  test("sample index recovers every frame's exact offset and size") {
    val mp4 = buildMp4()
    val idx = Mp4Index.sampleIndex(mp4).getOrElse(fail("parser rejected a valid file"))
    assert(idx.map(_._2) == frameSizes)
    // each indexed range slices back exactly the frame bytes that went in
    idx.zipWithIndex.foreach { case ((off, sz), i) =>
      val got = mp4.slice(off.toInt, off.toInt + sz).toSeq
      assert(got == frames(i).toSeq, s"frame $i bytes differ at offset $off")
    }
  }

  test("sampleFrames demuxes mp4 through the index, stride respected") {
    val r = Multimodal.MediaRecord(7L, "video", buildMp4())
    val out = Multimodal.sampleMp4Frames(r, stride = 2)
      .getOrElse(fail("mp4 path did not engage"))
    assert(out.map(_.frame_idx) == Vector(0, 2, 4))
    assert(out.map(_.n_bytes) == Vector(10L, 30L, 50L))
    // checksums are of the coded sample bytes the index locates
    def ck(b: Array[Byte]): Long =
      b.foldLeft(0L)((a, x) => (a * 31 + (x & 0xff)) % 1000000007L)
    assert(out.map(_.checksum) == Vector(ck(frames(0)), ck(frames(2)), ck(frames(4))))
  }

  test("an index pointing outside the payload is rejected, not sliced") {
    // same tables, chunk offset shifted past EOF — a truncated download
    val bad = buildMp4(chunkOffset = _ + 10000)
    assert(Mp4Index.sampleIndex(bad).isEmpty)
  }

  test("non-video handlers and non-BMFF payloads are rejected") {
    val soun = {
      val mp4 = buildMp4()
      // corrupt the handler 4cc in place: vide → soun
      val i = mp4.indexOfSlice("vide".getBytes)
      "soun".getBytes.zipWithIndex.foreach { case (b, j) => mp4(i + j) = b }
      mp4
    }
    assert(Mp4Index.sampleIndex(soun).isEmpty, "audio-only track accepted")
    assert(Mp4Index.sampleIndex("not a container at all".getBytes).isEmpty)
    assert(Mp4Index.sampleIndex(Array.empty[Byte]).isEmpty)
  }
}
