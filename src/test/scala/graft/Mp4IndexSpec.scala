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

  // ---- fragmented mp4 (fMP4/CMAF): empty stbl, moof/traf/trun runs ----

  private def emptyStblMoov(trexDefaultSize: Int = 0): Array[Byte] = {
    // classic tables all empty — the fragmented-file signature
    val stbl = box("stbl",
      box("stsz", u32s(0, 0, 0)), box("stsc", u32s(0, 0)), box("stco", u32s(0, 0)))
    val hdlr = box("hdlr", u32s(0, 0), "vide".getBytes, u32s(0, 0, 0), Array[Byte](0))
    val mdia = box("mdia", hdlr, box("minf", stbl))
    // tkhd v0: ver+flags, creation, modification, track_ID=1, reserved
    val tkhd = box("tkhd", u32s(0, 0, 0, 1, 0))
    val trak = box("trak", tkhd, mdia)
    val mvex = box("mvex",
      box("trex", u32s(0, 1 /*track*/, 1 /*desc*/, 0 /*dur*/, trexDefaultSize, 0)))
    box("moov", trak, mvex)
  }

  /** One fragment: moof(mfhd, traf(tfhd, trun)) + mdat holding `sizes`
    * samples head-to-tail; trun carries per-sample sizes and a data
    * offset relative to the moof box start (default-base-is-moof). */
  private def fragment(seq: Int, sizes: Seq[Int], fill: Byte): Array[Byte] = {
    val mfhd = box("mfhd", u32s(0, seq))
    // tfhd flags = 0x020000 default-base-is-moof; track_ID 1
    val tfhdF = box("tfhd", u32s(0x020000, 1))
    // trun flags = 0x201 data-offset + sample-size; data_offset filled below
    val trun = box("trun", u32s(0x201, sizes.length, 0), u32s(sizes: _*))
    val traf = box("traf", tfhdF, trun)
    val moof = box("moof", mfhd, traf)
    // patch data_offset: first sample starts right after moof + mdat header
    val doPos = moof.length - trun.length + 8 + 8 // into trun payload, after ver+count
    ByteBuffer.wrap(moof).putInt(doPos, moof.length + 8)
    moof ++ box("mdat", Array.fill(sizes.sum)(fill))
  }

  test("fragmented mp4: two moof/trun fragments, exact offsets and sizes") {
    val moov = emptyStblMoov()
    val ftyp = box("ftyp", "isom".getBytes, u32s(0), "iso6".getBytes)
    val f1 = fragment(1, Seq(10, 20, 30), fill = 0x11)
    val f2 = fragment(2, Seq(40, 50), fill = 0x22)
    val mp4 = ftyp ++ moov ++ f1 ++ f2
    val idx = Mp4Index.sampleIndex(mp4).getOrElse(fail("fragmented file rejected"))
    assert(idx.map(_._2) == Seq(10, 20, 30, 40, 50))
    // exact offsets: each fragment's samples lie head-to-tail in its mdat
    val m1 = ftyp.length + moov.length         // first moof box start
    val d1 = m1 + (f1.length - 68) + 8         // its mdat payload (60 bytes + header)
    val m2 = m1 + f1.length
    val d2 = m2 + (f2.length - 98) + 8
    assert(idx.map(_._1) == Seq(d1, d1 + 10, d1 + 30, d2, d2 + 40).map(_.toLong))
    // and the slices hand back exactly the mdat bytes
    idx.take(3).foreach { case (off, sz) =>
      assert(mp4.slice(off.toInt, off.toInt + sz).forall(_ == 0x11.toByte)) }
    idx.drop(3).foreach { case (off, sz) =>
      assert(mp4.slice(off.toInt, off.toInt + sz).forall(_ == 0x22.toByte)) }
  }

  test("fragmented mp4: trex default size covers size-less truns") {
    // trun omits per-sample sizes; tfhd omits default → trex's 25 rules
    val moov = emptyStblMoov(trexDefaultSize = 25)
    val mfhd = box("mfhd", u32s(0, 1))
    val tfhdF = box("tfhd", u32s(0x020000, 1))
    val trun = box("trun", u32s(0x1 /*data-offset only*/, 2, 0))
    val traf = box("traf", tfhdF, trun)
    val moof = {
      val m = box("moof", mfhd, traf)
      ByteBuffer.wrap(m).putInt(m.length - trun.length + 8 + 8, m.length + 8)
      m
    }
    val mp4 = moov ++ moof ++ box("mdat", Array.fill(50)(0x33.toByte))
    val idx = Mp4Index.sampleIndex(mp4).getOrElse(fail("trex-default file rejected"))
    val base = moov.length + moof.length + 8
    assert(idx == Vector((base.toLong, 25), (base + 25L, 25)))
  }

  test("fragmented mp4: run pointing outside the payload is rejected") {
    val moov = emptyStblMoov()
    val f1 = fragment(1, Seq(10, 20, 30), fill = 0x11)
    // truncate the final mdat so the last sample overruns
    val truncated = (moov ++ f1).dropRight(5)
    assert(Mp4Index.sampleIndex(truncated).isEmpty)
    // and a size-less run with no default anywhere is malformed, not guessed
    val mfhd = box("mfhd", u32s(0, 1))
    val tfhdF = box("tfhd", u32s(0x020000, 1))
    val trun = box("trun", u32s(0x1, 2, 16))
    val moof = box("moof", mfhd, box("traf", tfhdF, trun))
    val noDefault = moov ++ moof ++ box("mdat", Array.fill(50)(0x33.toByte))
    assert(Mp4Index.sampleIndex(noDefault).isEmpty)
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
