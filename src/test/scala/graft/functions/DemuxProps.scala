package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.{AviIndex, Mp4Index, WebmIndex}

/** Fuzz properties for the pure-byte container demuxers. A media column at
  * 100 TB contains truncated downloads, bit-flipped blobs, and outright
  * garbage; the corrupt-media contract says the index readers NEVER throw
  * out of the kernel and never emit a byte range outside the payload —
  * any violation would either kill a task (throw) or slice garbage
  * (out-of-bounds copy) deep inside an executor. Randomized inputs cover
  * what the structured in-test files in Mp4IndexSpec/WebmIndexSpec cannot:
  * arbitrary byte soup, valid-prefix truncations, and adversarial
  * size/offset fields. */
object DemuxProps extends Properties("graft.demux") {

  /** A structurally-valid fMP4 prelude (empty-stbl moov for video track 1)
    * so fragment-box soup reaches the moof/traf/trun walk instead of dying
    * at the video-trak check. */
  private val fmp4Prelude: Array[Byte] = {
    def box(typ: String, payloads: Array[Byte]*): Array[Byte] = {
      val total = 8 + payloads.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(total)
      bb.putInt(total).put(typ.getBytes("ISO-8859-1"))
      payloads.foreach(bb.put)
      bb.array()
    }
    def u32s(xs: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * xs.length)
      xs.foreach(bb.putInt)
      bb.array()
    }
    val stbl = box("stbl",
      box("stsz", u32s(0, 0, 0)), box("stsc", u32s(0, 0)), box("stco", u32s(0, 0)))
    val hdlr = box("hdlr", u32s(0, 0), "vide".getBytes, u32s(0, 0, 0), Array[Byte](0))
    val trak = box("trak", box("tkhd", u32s(0, 0, 0, 1, 0)),
      box("mdia", hdlr, box("minf", stbl)))
    box("moov", trak, box("mvex", box("trex", u32s(0, 1, 1, 0, 0, 0))))
  }

  /** Soup of PROPERLY-NESTED fragment-grammar boxes with random field
    * bytes: adversarial tfhd/trun flag combinations, data offsets, and
    * sample counts land in the exact fields the fragment walk trusts
    * least — with tfhd's track_ID biased to the prelude's video track so
    * the run parser (not the track filter) takes the hit. */
  private val genFragmentSoup: Gen[Array[Byte]] = {
    def mk(typ: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put(typ.getBytes("ISO-8859-1")).put(body)
      bb.array()
    }
    val rawU32 = Gen.chooseNum(Int.MinValue, Int.MaxValue)
    def u32(x: Int) = java.nio.ByteBuffer.allocate(4).putInt(x).array()
    val genTfhd = for {
      flags <- rawU32
      track <- Gen.frequency(3 -> Gen.const(1), 1 -> rawU32) // mostly OUR track
      tailN <- Gen.chooseNum(0, 24)
      tail <- Gen.listOfN(tailN, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield mk("tfhd", u32(flags) ++ u32(track) ++ tail.toArray)
    val genTrun = for {
      flags <- Gen.frequency(2 -> Gen.oneOf(0x1, 0x201, 0x301, 0x205, 0xf01, 0x200, 0x0),
        1 -> rawU32)
      count <- Gen.frequency(3 -> Gen.chooseNum(0, 8), 1 -> rawU32) // incl. huge/negative
      tailN <- Gen.chooseNum(0, 48)
      tail <- Gen.listOfN(tailN, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield mk("trun", u32(flags) ++ u32(count) ++ tail.toArray)
    val genTraf = for {
      h <- genTfhd
      nRuns <- Gen.chooseNum(0, 2)
      runs <- Gen.listOfN(nRuns, genTrun)
    } yield mk("traf", h ++ runs.flatten.toArray)
    val genMoof = for {
      nTrafs <- Gen.chooseNum(0, 2)
      trafs <- Gen.listOfN(nTrafs, genTraf)
    } yield mk("moof", mk("mfhd", u32(0) ++ u32(1)) ++ trafs.flatten.toArray)
    val genMdat = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(b =>
        mk("mdat", b.toArray)))
    for {
      k <- Gen.chooseNum(1, 4)
      boxes <- Gen.listOfN(k, Gen.frequency(3 -> genMoof, 1 -> genMdat))
      // sometimes chop the tail so declared sizes lie (truncated download)
      chop <- Gen.chooseNum(0, 4)
    } yield fmp4Prelude ++ boxes.flatten.dropRight(chop)
  }

  private val genBytes: Gen[Array[Byte]] = Gen.frequency(
    // fragment-grammar soup behind a valid fMP4 prelude (reaches the
    // moof/traf/trun walk with adversarial flags/counts/offsets)
    2 -> genFragmentSoup,
    // pure noise of assorted lengths (covers the tiny-header edge cases)
    4 -> Gen.chooseNum(0, 512).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)),
    // noise that STARTS like each container (forces the parsers past the
    // magic check into the deep table/element walks)
    1 -> Gen.chooseNum(8, 256).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(bs =>
        Array[Byte](0, 0, 0, 16, 'f', 't', 'y', 'p') ++ bs.toArray)),
    1 -> Gen.chooseNum(8, 256).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(bs =>
        Array[Byte](0x1A, 0x45.toByte, 0xDF.toByte, 0xA3.toByte) ++ bs.toArray)),
    1 -> Gen.chooseNum(8, 256).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(bs =>
        Array[Byte](0x18, 0x53, 0x80.toByte, 0x67) ++ bs.toArray)))

  private def inBounds(payload: Array[Byte],
                       idx: Option[Vector[(Long, Int)]]): Boolean =
    idx.forall(_.forall { case (off, sz) =>
      off >= 0 && sz >= 0 && off + sz <= payload.length
    })

  property("Mp4Index never throws and never indexes out of bounds") =
    forAll(genBytes) { bs => inBounds(bs, Mp4Index.sampleIndex(bs)) }

  // ---- generative fragmented-mp4 ROUNDTRIP: any spec-conformant file
  // with random fragment/sample geometry must index back EXACTLY ----

  private def mkBox(typ: String, payloads: Array[Byte]*): Array[Byte] = {
    val total = 8 + payloads.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(total).put(typ.getBytes("ISO-8859-1"))
    payloads.foreach(bb.put)
    bb.array()
  }
  private def mkU32s(xs: Int*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * xs.length)
    xs.foreach(bb.putInt)
    bb.array()
  }

  private val genFragGeometry: Gen[Seq[Seq[Int]]] = for {
    nFrags <- Gen.chooseNum(1, 4)
    frags <- Gen.listOfN(nFrags, for {
      nSamples <- Gen.chooseNum(1, 6)
      sizes <- Gen.listOfN(nSamples, Gen.chooseNum(0, 40))
    } yield sizes)
  } yield frags

  property("Mp4Index roundtrips any conformant fragmented geometry exactly") =
    forAll(genFragGeometry) { frags =>
      var file = fmp4Prelude
      val expected = Vector.newBuilder[(Long, Int)]
      frags.zipWithIndex.foreach { case (sizes, i) =>
        val mfhd = mkBox("mfhd", mkU32s(0, i + 1))
        val tfhd = mkBox("tfhd", mkU32s(0x020000, 1)) // default-base-is-moof
        val trun = mkBox("trun", mkU32s(0x201, sizes.length, 0), mkU32s(sizes: _*))
        val moof = mkBox("moof", mfhd, mkBox("traf", tfhd, trun))
        // patch data_offset (after trun hdr + ver/flags + count) to the
        // mdat payload right behind this moof
        java.nio.ByteBuffer.wrap(moof)
          .putInt(moof.length - trun.length + 16, moof.length + 8)
        var off = (file.length + moof.length + 8).toLong
        sizes.foreach { s => expected += ((off, s)); off += s }
        file = file ++ moof ++ mkBox("mdat", Array.fill(sizes.sum)(i.toByte))
      }
      Mp4Index.sampleIndex(file).contains(expected.result())
    }

  property("WebmIndex never throws and never indexes out of bounds") =
    forAll(genBytes) { bs => inBounds(bs, WebmIndex.sampleIndex(bs)) }

  property("WebmIndex cue paths never throw and never index out of bounds") =
    forAll(genBytes) { bs =>
      WebmIndex.cueIndex(bs).forall(_.forall {
        case (_, off) => off >= 0 && off <= bs.length
      }) && inBounds(bs, WebmIndex.sampleIndexViaCues(bs))
    }

  // ---- RIFF/AVI: noise arms + a generative conformant roundtrip ----

  /** Noise behind the RIFF/AVI magic with a PLAUSIBLE declared size, so
    * the walk gets past the truncation gate into the chunk grammar. */
  private val genAviNoise: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(4, 256)
    bs <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    // declared size: sometimes exact, sometimes lying in either direction
    declared <- Gen.frequency(2 -> Gen.const(n + 4), 1 -> Gen.chooseNum(0, 512))
  } yield {
    val bb = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(declared)
      .put("AVI ".getBytes("ISO-8859-1"))
    bb.array() ++ bs.toArray
  }

  /** AVI-noise followed by an AVIX-tagged tail with adversarial declared
    * size and random body — lands the fuzz in the OpenDML extension walk
    * instead of the trailing-junk early exit. */
  private val genAvixNoise: Gen[Array[Byte]] = for {
    base <- genAviNoise
    n <- Gen.chooseNum(0, 128)
    body <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    declared <- Gen.frequency(2 -> Gen.const(n + 4), 1 -> Gen.chooseNum(0, 512))
  } yield {
    val bb = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(declared)
      .put("AVIX".getBytes("ISO-8859-1"))
    base ++ bb.array() ++ body.toArray
  }

  property("AviIndex never throws and never indexes out of bounds") =
    forAll(Gen.frequency(2 -> genAviNoise, 1 -> genAvixNoise, 1 -> genBytes)) { bs =>
      inBounds(bs, AviIndex.sampleIndex(bs))
    }

  /** Any conformant AVI with random stream count/position, frame sizes
    * (odd sizes force pad bytes), and rec-group placement must index back
    * exactly the video stream's frames in stream order. */
  private val genAviGeometry: Gen[(Int, Seq[(Int, Boolean)])] = for {
    vidsPos <- Gen.chooseNum(0, 2) // video is the (pos+1)-th of 3 streams
    nFrames <- Gen.chooseNum(2, 8)
    frames <- Gen.listOfN(nFrames, for {
      sz <- Gen.chooseNum(0, 41)
      inRec <- Gen.oneOf(true, false)
    } yield (sz, inRec))
  } yield (vidsPos, frames)

  property("AviIndex roundtrips any conformant geometry exactly") =
    forAll(genAviGeometry) { case (vidsPos, frameSpecs) =>
      def u32le(x: Int) = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(x).array()
      def chunk(id: String, data: Array[Byte]) = {
        val pad = if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
        id.getBytes("ISO-8859-1") ++ u32le(data.length) ++ data ++ pad
      }
      def list(typ: String, kids: Array[Byte]*) = {
        val body = typ.getBytes("ISO-8859-1") ++ kids.flatten
        "LIST".getBytes("ISO-8859-1") ++ u32le(body.length) ++ body
      }
      def strl(t: String) = list("strl",
        chunk("strh", t.getBytes("ISO-8859-1") ++ Array.fill[Byte](52)(0)),
        chunk("strf", Array.fill[Byte](40)(0)))
      val streams = Vector.tabulate(3)(k => if (k == vidsPos) strl("vids") else strl("auds"))
      val nn = f"$vidsPos%02d"
      val other = f"${(vidsPos + 1) % 3}%02d"
      val moviKids = frameSpecs.zipWithIndex.flatMap { case ((sz, inRec), i) =>
        val fr = chunk(nn + "dc", Array.fill(sz)(i.toByte))
        val noise = chunk(other + "wb", Array.fill(5)(0x55.toByte))
        Seq(noise, if (inRec) list("rec ", fr) else fr)
      }
      val hdrl = list("hdrl", chunk("avih", Array.fill[Byte](56)(0)) +: streams: _*)
      val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ list("movi", moviKids: _*)
      val file = "RIFF".getBytes("ISO-8859-1") ++ u32le(body.length) ++ body
      AviIndex.sampleIndex(file) match {
        case Some(idx) =>
          idx.length == frameSpecs.length &&
            idx.zipWithIndex.forall { case ((off, sz), i) =>
              sz == frameSpecs(i)._1 &&
                file.slice(off.toInt, off.toInt + sz)
                  .forall(_ == i.toByte)
            }
        case None => false
      }
    }
}
