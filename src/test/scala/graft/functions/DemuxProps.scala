package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.{Mp4Index, WebmIndex}

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

  private val genBytes: Gen[Array[Byte]] = Gen.frequency(
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

  property("WebmIndex never throws and never indexes out of bounds") =
    forAll(genBytes) { bs => inBounds(bs, WebmIndex.sampleIndex(bs)) }
}
