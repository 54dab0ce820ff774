package graft

import java.nio.charset.StandardCharsets

import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalacheck.{Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RiffOps

/** Round-5: property-based container fuzz (the round-4 mutation fuzz was
  * fixed-case). Generators cover random chunk ORDER, random junk chunks,
  * random (odd) payload sizes, random single-byte corruption and
  * truncation at arbitrary offsets. The parser contract under test:
  * encode∘decode is the identity on valid containers, and EVERY invalid
  * input is refused with IllegalArgumentException — never an index /
  * negative-size / NPE escape. Seeded: failures replay deterministically. */
class ContainerPropSpec extends AnyFunSuite {

  private def run(name: String, prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(Seed(0x5eed5eedL)),
      prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  /** parse-or-IllegalArgumentException — the only acceptable outcomes. */
  private def cleanly(parse: => Any): Boolean =
    try { parse; true }
    catch {
      case _: IllegalArgumentException => true
      case _: Throwable => false
    }

  // ---- generators -------------------------------------------------------

  private val genBytes: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 400)
    b <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte))
  } yield b

  private val genRate = Gen.chooseNum(1, 192000)
  private val genCh = Gen.chooseNum(1, 8)

  private val genWav: Gen[Array[Byte]] = for {
    pcm <- genBytes; r <- genRate; c <- genCh
  } yield RiffOps.wavEncode(pcm, r, c)

  private val genFrames: Gen[Array[Array[Byte]]] = for {
    n <- Gen.chooseNum(0, 5)
    fs <- Gen.containerOfN[Array, Array[Byte]](n, for {
      m <- Gen.chooseNum(0, 200)
      b <- Gen.containerOfN[Array, Byte](m, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield b)
  } yield fs

  private val genAvi: Gen[Array[Byte]] = for {
    fs <- genFrames
    w <- Gen.chooseNum(1, 64); h <- Gen.chooseNum(1, 64)
    fps <- Gen.chooseNum(1, 30)
  } yield RiffOps.aviMjpegEncode(fs, w, h, fps)

  // a hand-rolled RIFF/WAVE writer the PARSER has never seen: random chunk
  // order, random junk chunks (odd sizes → pad bytes), fmt/data anywhere
  private def handWav(pcm: Array[Byte], rate: Int, ch: Int,
                      junk: Seq[(String, Array[Byte])],
                      order: Seq[Int]): Array[Byte] = {
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(tag.getBytes(StandardCharsets.US_ASCII))
      val s = body.length
      out.write(s & 0xff); out.write((s >>> 8) & 0xff)
      out.write((s >>> 16) & 0xff); out.write((s >>> 24) & 0xff)
      out.write(body)
      if (s % 2 == 1) out.write(0) // RIFF pad to even
      out.toByteArray
    }
    val fmt = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { fmt.write(v & 0xff); fmt.write((v >>> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    u16(1); u16(ch); u32(rate); u32(rate * ch * 2); u16(ch * 2); u16(16)
    val pieces: Seq[Array[Byte]] =
      Seq(chunk("fmt ", fmt.toByteArray), chunk("data", pcm)) ++
        junk.map { case (t, b) => chunk(t, b) }
    val ordered = order.map(i => pieces(i % pieces.length)).distinct
    // ensure fmt and data each appear exactly once whatever the order draw
    val body = (Seq(pieces(0), pieces(1)) ++
      ordered.filterNot(p => p.eq(pieces(0)) || p.eq(pieces(1))))
    val shuffled = order.headOption.getOrElse(0) % body.length match {
      case k => body.drop(k) ++ body.take(k) // rotate: data can precede fmt
    }
    val payload = shuffled.flatten.toArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes(StandardCharsets.US_ASCII))
    val riffSize = 4 + payload.length
    out.write(riffSize & 0xff); out.write((riffSize >>> 8) & 0xff)
    out.write((riffSize >>> 16) & 0xff); out.write((riffSize >>> 24) & 0xff)
    out.write("WAVE".getBytes(StandardCharsets.US_ASCII))
    out.write(payload)
    out.toByteArray
  }

  private val genJunk: Gen[Seq[(String, Array[Byte])]] =
    Gen.listOfN(3, for {
      tag <- Gen.listOfN(4, Gen.alphaChar).map(_.mkString)
      if tag != "fmt " && tag != "data"
      n <- Gen.chooseNum(0, 51) // odd sizes included → pad-byte path
      b <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield (tag, b)).map(_.take(3))

  // ---- properties -------------------------------------------------------

  test("wav: encode ∘ decode is the identity (pcm bytes, rate, channels)") {
    run("wav-roundtrip", Prop.forAll(genBytes, genRate, genCh) { (pcm, r, c) =>
      val i = RiffOps.wavDecode(RiffOps.wavEncode(pcm, r, c))
      i.sampleRate == r && i.channels == c && java.util.Arrays.equals(i.pcm, pcm)
    })
  }

  test("wav: foreign writer — random chunk order + junk chunks still decode") {
    run("wav-foreign", Prop.forAll(genBytes, genRate, genCh, genJunk,
      Gen.listOfN(6, Gen.chooseNum(0, 10))) { (pcm, r, c, junk, order) =>
      val i = RiffOps.wavDecode(handWav(pcm, r, c, junk, order))
      i.sampleRate == r && i.channels == c && java.util.Arrays.equals(i.pcm, pcm)
    }, n = 150)
  }

  test("wav: random corruption and truncation never escape cleanly-typed failure") {
    run("wav-corrupt", Prop.forAll(genWav, Gen.chooseNum(0, 1 << 20),
      Gen.chooseNum(1, 255)) { (wav, posSeed, delta) =>
      val pos = posSeed % wav.length
      val mutated = wav.clone(); mutated(pos) = (mutated(pos) + delta).toByte
      cleanly(RiffOps.wavDecode(mutated)) &&
        cleanly(RiffOps.wavDecode(wav.take(posSeed % (wav.length + 1))))
    })
  }

  test("avi: encode ∘ decode identity — frames byte-exact, header fields right") {
    run("avi-roundtrip", Prop.forAll(genFrames, Gen.chooseNum(1, 64),
      Gen.chooseNum(1, 64), Gen.chooseNum(1, 30)) { (fs, w, h, fps) =>
      val avi = RiffOps.aviMjpegEncode(fs, w, h, fps)
      val back = RiffOps.aviFrames(avi)
      val (hw, hh, hn) = RiffOps.aviHeader(avi)
      hw == w && hh == h && hn == fs.length && back.length == fs.length &&
        back.zip(fs).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    })
  }

  test("avi: random corruption and truncation never escape cleanly-typed failure") {
    run("avi-corrupt", Prop.forAll(genAvi, Gen.chooseNum(0, 1 << 20),
      Gen.chooseNum(1, 255)) { (avi, posSeed, delta) =>
      val pos = posSeed % avi.length
      val mutated = avi.clone(); mutated(pos) = (mutated(pos) + delta).toByte
      cleanly(RiffOps.aviFrames(mutated)) && cleanly(RiffOps.aviHeader(mutated)) &&
        cleanly(RiffOps.aviFrames(avi.take(posSeed % (avi.length + 1))))
    })
  }
}
