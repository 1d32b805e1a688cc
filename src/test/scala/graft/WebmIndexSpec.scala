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

  /** Minimal big-endian uint payload (Matroska integer encoding). */
  private def uintBytes(v: Long): Array[Byte] =
    if (v == 0) Array(0.toByte)
    else {
      var x = v
      val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
      while (x > 0) { buf.prepend((x & 0xff).toByte); x >>= 8 }
      buf.toArray
    }

  private def cuePoint(time: Long, track: Long, pos: Long): Array[Byte] =
    el(id(0xBB),
      el(id(0xB3), uintBytes(time)) ++
        el(id(0xB7),
          el(id(0xF7), uintBytes(track)) ++ el(id(0xF1), uintBytes(pos))))

  /** Like buildWebm but with a trailing Cues element (the live-recording
    * layout: cues written after the clusters, so cluster offsets are
    * known when the cues are built — no circular sizing). `which` selects
    * the cue-pointed clusters (0-based). */
  private def buildWebmWithCues(which: Seq[Int],
                                cueTrack: Long = 1L,
                                skew: Long = 0L): Array[Byte] = {
    val ebmlHeader = el(id(0x1A, 0x45, 0xDF, 0xA3),
      el(id(0x42, 0x82), "webm".getBytes("ISO-8859-1")))
    val tracks = el(id(0x16, 0x54, 0xAE, 0x6B),
      trackEntry(num = 2, typ = 2) ++ trackEntry(num = 1, typ = 1))
    val cluster1 = el(id(0x1F, 0x43, 0xB6, 0x75),
      el(id(0xE7), Array(0.toByte)) ++
        simpleBlock(1, frames(0)) ++ simpleBlock(2, audioFrame) ++
        simpleBlock(1, frames(1)))
    val cluster2 = el(id(0x1F, 0x43, 0xB6, 0x75),
      el(id(0xE7), Array(1.toByte)) ++
        el(id(0xA0), el(id(0xA1),
          Array[Byte]((0x80 | 1).toByte, 0, 0, 0) ++ frames(2))))
    // cluster offsets relative to the Segment payload start
    val offsets = Seq(tracks.length.toLong, (tracks.length + cluster1.length).toLong)
    val cues = el(id(0x1C, 0x53, 0xBB, 0x6B),
      which.map(i => cuePoint(i.toLong, cueTrack, offsets(i) + skew))
        .fold(Array.empty[Byte])(_ ++ _))
    ebmlHeader ++ el(id(0x18, 0x53, 0x80, 0x67),
      tracks ++ cluster1 ++ cluster2 ++ cues)
  }

  test("cue index resolves to absolute offsets of real Cluster elements") {
    val webm = buildWebmWithCues(Seq(0, 1))
    val cues = WebmIndex.cueIndex(webm).getOrElse(fail("cues rejected"))
    assert(cues.map(_._1) == Vector(0L, 1L))
    cues.foreach { case (_, off) =>
      assert(webm.slice(off.toInt, off.toInt + 4).toSeq ==
        Seq(0x1F, 0x43, 0xB6, 0x75).map(_.toByte),
        s"cue offset $off does not land on a Cluster id")
    }
  }

  test("cue-driven index equals the full walk when every cluster is cued") {
    val webm = buildWebmWithCues(Seq(0, 1))
    assert(WebmIndex.sampleIndexViaCues(webm) == WebmIndex.sampleIndex(webm))
  }

  test("cues select clusters: a single cue yields only that cluster's frames") {
    val webm = buildWebmWithCues(Seq(1))
    val idx = WebmIndex.sampleIndexViaCues(webm).getOrElse(fail("seek path rejected"))
    assert(idx.map(_._2) == Seq(30), "expected only cluster 2's frame")
    val (off, sz) = idx.head
    assert(webm.slice(off.toInt, off.toInt + sz).toSeq == frames(2).toSeq)
  }

  test("cues for a foreign track or bogus positions contribute nothing") {
    // audio-track cues: not OUR track's seek table → no cue index
    assert(WebmIndex.cueIndex(buildWebmWithCues(Seq(0, 1), cueTrack = 2L)).isEmpty)
    // positions skewed off the cluster boundary: never throw, never
    // slice — the misaligned cue parses as a non-Cluster id and drops out
    assert(WebmIndex.sampleIndexViaCues(buildWebmWithCues(Seq(0, 1), skew = 1L)).isEmpty)
    // a file without cues has no seek path (the full walk still works)
    assert(WebmIndex.sampleIndexViaCues(buildWebm()).isEmpty)
    assert(WebmIndex.sampleIndex(buildWebm()).nonEmpty)
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
