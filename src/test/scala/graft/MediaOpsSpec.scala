package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MediaOps

/** Multimodal binary plumbing: PCM16 decode round-trip + feature kernels,
  * toy video container parse + strided frame sampling. */
class MediaOpsSpec extends AnyFunSuite {

  test("pcm16 synthesis/decode round-trip and window RMS") {
    val pcm = MediaOps.synthPcm16(7L, 512)
    assert(pcm.length === 1024)
    // hand-decode sample 3: ((7*31 + 3*7919) % 65536) - 32768
    val v3 = ((7L * 31 + 3L * 7919) % 65536 - 32768).toInt
    val lo = pcm(6) & 0xff; val hi = pcm(7).toInt
    assert(((hi << 8) | lo) === v3)
    val rms = MediaOps.audioRmsWindows(pcm, 256)
    assert(rms.length === 2)
    assert(rms.forall(r => r > 0 && r < 32768))
    // constant signal: RMS == |v|
    val const = Array.tabulate(64)(_ => 0).flatMap(_ => Array[Byte](0x10, 0x00))
    assert(MediaOps.audioRmsWindows(const, 32).forall(_ === 16.0))
    // trailing partial window dropped
    assert(MediaOps.audioRmsWindows(pcm, 300).length === 1)
  }

  test("zero crossings: alternating-sign signal crosses every step") {
    // +100, -100 alternating → n-1 crossings
    val n = 100
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = if (i % 2 == 0) 100 else -100
      pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    assert(MediaOps.audioZeroCrossings(pcm) === (n - 1).toLong)
    assert(MediaOps.audioZeroCrossings(MediaOps.synthPcm16(1L, 0)) === 0L)
  }

  test("video container: header parse, strided sampling, luma stats") {
    val vid = MediaOps.synthVideo(3L, 8, 4, 10)
    assert(vid.length === 12 + 10 * 32)
    assert(MediaOps.videoFrameCount(vid) === 10)
    val frames = MediaOps.videoFrameSample(vid, 4)
    assert(frames.length === 3) // frames 0, 4, 8
    assert(frames.forall(_.length === 32))
    // frame 4, pixel 5 = (3 + 4*31 + 5*7) % 256
    val expected = ((3L + 4 * 31 + 5 * 7) % 256).toInt
    assert((frames(1)(5) & 0xff) === expected)
    // stride larger than the stream: frame 0 only
    assert(MediaOps.videoFrameSample(vid, 99).length === 1)
    // bytesMean of a uniform frame
    assert(MediaOps.bytesMean(Array.fill[Byte](16)(0x20)) === 32.0)
  }
}
