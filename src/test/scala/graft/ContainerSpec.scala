package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ImageOps, MediaOps, RiffOps}

/** Real public-spec A/V containers (RIFF/WAVE, MJPEG-in-AVI): byte-exact
  * round-trips, chunk-walking correctness (padding, foreign chunks), and
  * malformed-header fuzz — every bad input must raise a descriptive
  * IllegalArgumentException, never an index/arithmetic error. */
class ContainerSpec extends AnyFunSuite {

  private def boom(msgPart: String)(body: => Any): Unit = {
    val e = intercept[IllegalArgumentException](body)
    assert(e.getMessage.contains(msgPart),
      s"message '${e.getMessage}' should mention '$msgPart'")
  }

  // ------------------------------------------------------------------ WAV

  test("wav round-trip is byte-exact and recovers header fields") {
    val pcm = MediaOps.synthPcm16(42L, 777) // odd sample count
    val wav = RiffOps.wavEncode(pcm, 44100, 2)
    val info = RiffOps.wavDecode(wav)
    assert(info.sampleRate === 44100)
    assert(info.channels === 2)
    assert(java.util.Arrays.equals(info.pcm, pcm))
    // file-level RIFF size field covers everything after the first 8 bytes
    assert(wav.length % 2 === 0, "RIFF files are even-padded")
  }

  test("wav parser walks chunks (LIST-INFO between fmt and data) and pads odd sizes") {
    // encoder writes fmt, LIST(INFO/ISFT "graft" — 5 bytes, odd → padded),
    // data; a fixed-offset reader would land mid-LIST
    val pcm = MediaOps.synthPcm16(1L, 8)
    val wav = RiffOps.wavEncode(pcm, 8000, 1)
    assert(new String(wav, 36, 4, "US-ASCII") !== "data",
      "canonical 44-byte layout would defeat the chunk-walk test")
    assert(java.util.Arrays.equals(RiffOps.wavDecode(wav).pcm, pcm))
  }

  test("wav kernels compose: RMS/ZCR identical through the container") {
    val pcm = MediaOps.synthPcm16(9L, 1024)
    val viaWav = RiffOps.wavDecode(RiffOps.wavEncode(pcm, 16000, 1)).pcm
    assert(MediaOps.audioRmsWindows(viaWav, 256).toSeq ===
      MediaOps.audioRmsWindows(pcm, 256).toSeq)
    assert(MediaOps.audioZeroCrossings(viaWav) === MediaOps.audioZeroCrossings(pcm))
  }

  test("wav fuzz: malformed inputs raise clear errors") {
    val good = RiffOps.wavEncode(MediaOps.synthPcm16(3L, 64), 8000, 1)
    boom("too short")(RiffOps.wavDecode(Array[Byte](1, 2, 3)))
    boom("bad magic") {
      val b = good.clone(); b(0) = 'X'.toByte; RiffOps.wavDecode(b)
    }
    boom("form type") {
      val b = good.clone(); b(8) = 'Z'.toByte; RiffOps.wavDecode(b)
    }
    boom("truncated")(RiffOps.wavDecode(good.take(good.length - 5)))
    boom("missing 'data'")(RiffOps.wavDecode(good.take(12 + 8 + 16))) // header+fmt only
    boom("unsupported audio format") {
      val b = good.clone(); b(20) = 3 // fmt payload byte 0: audioFormat → 3 (float)
      RiffOps.wavDecode(b)
    }
    boom("bits per sample") {
      val b = good.clone(); b(34) = 8 // fmt payload byte 14
      RiffOps.wavDecode(b)
    }
    boom("sampleRate must be positive")(RiffOps.wavEncode(Array[Byte](0, 0), 0, 1))
    boom("channels must be positive")(RiffOps.wavEncode(Array[Byte](0, 0), 8000, -1))
  }

  // ------------------------------------------------------------------ AVI

  private def jpegFrame(id: Long, f: Int): Array[Byte] =
    RiffOps.frameSynth(id, f, 16, 16, "jpeg")

  test("avi mjpeg round-trip: payloads byte-exact, order preserved, header right") {
    val frames = Array.tabulate(5)(f => jpegFrame(7L, f))
    val avi = RiffOps.aviMjpegEncode(frames, 16, 16, 10)
    assert(RiffOps.aviWidth(avi) === 16)
    assert(RiffOps.aviHeight(avi) === 16)
    assert(RiffOps.aviFrameCount(avi) === 5)
    val back = RiffOps.aviFrames(avi)
    assert(back.length === 5)
    (frames zip back).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("avi payloads decode through the real JPEG path at >= 40dB vs lossless ref") {
    val avi = RiffOps.aviMjpegEncode(Array.tabulate(3)(f => jpegFrame(3L, f)), 16, 16, 8)
    RiffOps.aviFrames(avi).zipWithIndex.foreach { case (jpeg, f) =>
      assert(ImageOps.dims(jpeg) === ((16, 16)))
      val ref = RiffOps.frameSynth(3L, f, 16, 16, "png")
      assert(ImageOps.psnr(jpeg, ref) >= 40.0, s"frame $f below 40dB")
    }
  }

  test("avi odd-size payloads are even-padded without corrupting neighbours") {
    // raw odd-length payloads (not JPEG) — the container must pad between
    // chunks and strip the pad on read
    val frames = Array(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6, 7, 8, 9))
    val back = RiffOps.aviFrames(RiffOps.aviMjpegEncode(frames, 2, 2, 1))
    assert(back.map(_.toSeq).toSeq === frames.map(_.toSeq).toSeq)
  }

  test("avi empty stream round-trips") {
    val avi = RiffOps.aviMjpegEncode(Array.empty[Array[Byte]], 8, 8, 1)
    assert(RiffOps.aviFrames(avi).isEmpty)
    assert(RiffOps.aviFrameCount(avi) === 0)
  }

  test("avi fuzz: malformed inputs raise clear errors") {
    val good = RiffOps.aviMjpegEncode(Array.tabulate(2)(f => jpegFrame(1L, f)), 16, 16, 8)
    boom("too short")(RiffOps.aviFrames(Array[Byte]('R', 'I')))
    boom("bad magic") {
      val b = good.clone(); b(1) = 'X'.toByte; RiffOps.aviFrames(b)
    }
    boom("form type") {
      val b = good.clone(); b(8) = 'W'.toByte; RiffOps.aviFrames(b) // 'WVI '
    }
    boom("truncated")(RiffOps.aviFrames(good.take(good.length - 3)))
    boom("missing LIST 'movi'") {
      // header-only file: RIFF 'AVI ' with no chunks at all
      val b = new Array[Byte](12)
      System.arraycopy(good, 0, b, 0, 12)
      b(4) = 4; b(5) = 0; b(6) = 0; b(7) = 0 // RIFF size = form type only
      RiffOps.aviFrames(b)
    }
    boom("bad dimensions")(RiffOps.aviMjpegEncode(Array.empty, 0, 16, 8))
    boom("fps must be positive")(RiffOps.aviMjpegEncode(Array.empty, 16, 16, 0))
    boom("missing 'avih'") {
      val b = new Array[Byte](12)
      System.arraycopy(good, 0, b, 0, 12)
      b(4) = 4; b(5) = 0; b(6) = 0; b(7) = 0
      RiffOps.aviHeader(b)
    }
  }

  test("avi_mjpeg_encode rejects a null frame element with a clear message") {
    import SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(
      array(lit(Array[Byte](1, 2)), lit(null).cast("binary")).as("frames"))
    val e = intercept[Exception](
      df.select(call_function("avi_mjpeg_encode", col("frames"),
        lit(2), lit(1), lit(1))).collect())
    assert(e.getMessage.contains("null frame at index 1") ||
      Option(e.getCause).exists(_.getMessage.contains("null frame at index 1")))
  }

  test("file-level ingestion: real .wav/.avi files through the binaryFile source") {
    import SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("media_files")
    // write REAL container files to disk (plus a decoy the glob must skip)
    for (id <- 0 until 5) {
      val pcm = MediaOps.synthPcm16(id.toLong, 1024)
      java.nio.file.Files.write(dir.resolve(s"clip_$id.wav"),
        RiffOps.wavEncode(pcm, 16000, 1))
      val frames = Array.tabulate(3)(f => RiffOps.frameSynth(id.toLong, f, 16, 16, "jpeg"))
      java.nio.file.Files.write(dir.resolve(s"vid_$id.avi"),
        RiffOps.aviMjpegEncode(frames, 16, 16, 8))
    }
    java.nio.file.Files.write(dir.resolve("notes.txt"), "not media".getBytes)

    val wav = graft.sources.Media.wavFeatures(spark, dir.toString).collect()
    assert(wav.length === 5)
    wav.foreach { r =>
      val id = r.getString(0).split("clip_")(1).stripSuffix(".wav").toLong
      assert(r.getAs[Int]("sample_rate") === 16000)
      assert(r.getAs[Int]("channels") === 1)
      // features equal the direct kernel on the original PCM
      val pcm = MediaOps.synthPcm16(id, 1024)
      assert(r.getAs[Long]("zcr") === MediaOps.audioZeroCrossings(pcm))
      assert(r.getSeq[Double](r.fieldIndex("rms")) ===
        MediaOps.audioRmsWindows(pcm, 256).toSeq)
    }

    // a valid zero-frame AVI must keep its file-level row (outer explode)
    java.nio.file.Files.write(dir.resolve("vid_empty.avi"),
      RiffOps.aviMjpegEncode(Array.empty[Array[Byte]], 16, 16, 8))

    val avi = graft.sources.Media.readAviFrames(spark, dir.toString)
    assert(avi.count() === 16) // 5 files × 3 frames + 1 empty-file row
    val empty = avi.where(col("path").endsWith("vid_empty.avi")).collect()
    assert(empty.length === 1 && empty(0).getAs[Int]("n_frames") === 0 &&
      empty(0).isNullAt(empty(0).fieldIndex("jpeg")))
    val frames = avi.where(col("jpeg").isNotNull)
    assert(frames.count() === 15)
    val one = avi.where(col("path").endsWith("vid_2.avi") && col("frame_idx") === 1)
      .collect()(0)
    assert(one.getAs[Int]("w") === 16 && one.getAs[Int]("n_frames") === 3)
    assert(java.util.Arrays.equals(one.getAs[Array[Byte]]("jpeg"),
      RiffOps.frameSynth(2L, 1, 16, 16, "jpeg")))
    // payloads decode through the real JPEG path
    val dims = frames.select(
      call_function("img_width", col("jpeg")).as("jw"),
      call_function("img_height", col("jpeg")).as("jh")).collect()
    assert(dims.forall(r => r.getInt(0) == 16 && r.getInt(1) == 16))
  }

  test("mutation fuzz: corrupted containers parse or fail CLEANLY, never crash") {
    // deterministic single-byte corruptions at every offset of the header
    // region and a stride through the payload: the parser contract is
    // "valid result or IllegalArgumentException with a message" — an
    // ArrayIndexOutOfBounds / NegativeArraySize / NPE is a bug
    def fuzz(bytes: Array[Byte], parse: Array[Byte] => Any, what: String): Unit = {
      val offsets = (0 until math.min(64, bytes.length)) ++
        (64 until bytes.length by 37)
      for (off <- offsets; delta <- Seq(1, 0x55, -1)) {
        val mutated = bytes.clone()
        mutated(off) = (mutated(off) + delta).toByte
        try { parse(mutated); () }
        catch {
          case _: IllegalArgumentException => () // clean refusal
          case e: Throwable =>
            fail(s"$what: byte $off+$delta → ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
      // truncation at every length in the header region
      for (len <- 0 until math.min(80, bytes.length)) {
        try { parse(bytes.take(len)); () }
        catch {
          case _: IllegalArgumentException => ()
          case e: Throwable =>
            fail(s"$what: truncated to $len → ${e.getClass.getSimpleName}")
        }
      }
    }
    val wav = RiffOps.wavEncode(MediaOps.synthPcm16(5L, 200), 8000, 1)
    fuzz(wav, RiffOps.wavDecode, "wav")
    val avi = RiffOps.aviMjpegEncode(
      Array.tabulate(2)(f => jpegFrame(5L, f)), 16, 16, 8)
    fuzz(avi, RiffOps.aviFrames, "avi frames")
    fuzz(avi, RiffOps.aviHeader, "avi header")
  }

  test("media kernels guard degenerate parameters") {
    boom("window must be positive")(
      MediaOps.audioRmsWindows(MediaOps.synthPcm16(1L, 8), 0))
    boom("stride must be positive")(
      MediaOps.videoFrameSample(MediaOps.synthVideo(1L, 4, 4, 2), 0))
  }
}
