package graft

import graft.functions.BinaryCodecs
import graft.ops.Multimodal

/** MPEG audio frame-header walk: frame arithmetic per version/layer,
  * ID3v2/ID3v1 tag handling, the strict-tiling quarantine contract
  * (corrupt sync, free-format, reserved codes, mid-stream changes),
  * and the Multimodal metadata surface.
  */
class Mp3Spec extends SparkSpec {
  import spark.implicits._

  test("mp3 writer/walker roundtrip: frame counts, clocks, durations, VBR") {
    // MPEG1 Layer III @ 44100, CBR 128 kbps (idx 9), 10 frames
    val cbr = BinaryCodecs.mp3("1", 0, Seq.fill(10)(9))
    val m = BinaryCodecs.mp3Meta(cbr).get
    assert(m.version == "1" && m.layer == 3 && m.sampleRate == 44100)
    assert(m.nFrames == 10 && m.frameBitratesKbps.forall(_ == 128))
    assert(m.samplesPerFrame == 1152)
    assert(m.durationUs == 10L * 1152L * 1000000L / 44100L)
    // frame length arithmetic: 144000·128/44100 = 417 bytes per frame
    assert(cbr.length == 10 * (144000 * 128 / 44100))
    // MPEG2 halves the samples per frame and the length coefficient
    val m2 = BinaryCodecs.mp3Meta(BinaryCodecs.mp3("2", 2, Seq.fill(4)(4))).get
    assert(m2.sampleRate == 16000 && m2.samplesPerFrame == 576)
    assert(m2.durationUs == 4L * 576L * 1000000L / 16000L)
    // VBR: alternating indices surface as differing per-frame bitrates
    val vbr = BinaryCodecs.mp3Meta(BinaryCodecs.mp3("1", 1, Seq(9, 5, 9, 5))).get
    assert(vbr.frameBitratesKbps == Vector(128, 64, 128, 64))
  }

  test("mp3Meta: ID3v2 skipped by synchsafe size, trailing ID3v1 accepted") {
    val tagged = BinaryCodecs.mp3("1", 0, Seq.fill(3)(9),
      id3v2Bytes = 300, id3v1 = true)
    val m = BinaryCodecs.mp3Meta(tagged).get
    assert(m.nFrames == 3 && m.sampleRate == 44100)
    // the synchsafe encoding really is 7-bit bytes: 300 = 0x02,0x2C
    assert(tagged(8) == 2 && tagged(9) == 0x2C)
    // an ID3v2 size running past EOF quarantines
    assert(BinaryCodecs.mp3Meta(tagged.take(200)).isEmpty)
    // the ID3v2.4 FOOTER flag adds 10 bytes the synchsafe size
    // excludes - a footered file must not false-quarantine
    val frames = BinaryCodecs.mp3("1", 0, Seq.fill(3)(9))
    val hdr = "ID3".getBytes ++ Array[Byte](4, 0, 0x10.toByte, 0, 0, 0, 20)
    val footered = hdr ++ new Array[Byte](20) ++
      ("3DI".getBytes ++ Array[Byte](4, 0, 0x10.toByte, 0, 0, 0, 20)) ++ frames
    val fm = BinaryCodecs.mp3Meta(footered).get
    assert(fm.nFrames == 3 && fm.sampleRate == 44100)
  }

  test("mp3Meta: quarantine contract — sync, codes, tiling, mid-stream change") {
    val good = BinaryCodecs.mp3("1", 0, Seq.fill(5)(9))
    assert(BinaryCodecs.mp3Meta(good).nonEmpty)
    assert(BinaryCodecs.mp3Meta("not audio".getBytes).isEmpty)
    assert(BinaryCodecs.mp3Meta(Array.emptyByteArray).isEmpty)
    // truncation mid-frame: declared length past EOF
    assert(BinaryCodecs.mp3Meta(good.dropRight(1)).isEmpty)
    // broken sync mid-file (a corpus walk must NOT resync over garbage)
    val broken = good.clone
    broken(144000 * 128 / 44100) = 0x00 // first byte of frame 2
    assert(BinaryCodecs.mp3Meta(broken).isEmpty)
    // free-format bitrate (idx 0) and forbidden (15) quarantine
    val free = good.clone; free(2) = (0 << 4 | 0).toByte
    assert(BinaryCodecs.mp3Meta(free).isEmpty)
    val forbidden = good.clone; forbidden(2) = (15 << 4).toByte
    assert(BinaryCodecs.mp3Meta(forbidden).isEmpty)
    // reserved sample-rate code
    val badRate = good.clone; badRate(2) = (9 << 4 | 3 << 2).toByte
    assert(BinaryCodecs.mp3Meta(badRate).isEmpty)
    // mid-stream version change: an MPEG1 stream suddenly carrying an
    // MPEG2 header is corrupt, not a feature
    val mixed = BinaryCodecs.mp3("1", 0, Seq(9)) ++ BinaryCodecs.mp3("2", 0, Seq(9))
    assert(BinaryCodecs.mp3Meta(mixed).isEmpty)
    // a lone ID3v1 tag with no frames is not an audio stream
    assert(BinaryCodecs.mp3Meta("TAG".getBytes ++ new Array[Byte](125)).isEmpty)
  }

  test("Multimodal.mp3Meta: parseable streams become rows, junk drops") {
    val docs = (0L until 30L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val media = Multimodal.syntheticMp3s(docs)
    val got = Multimodal.mp3Meta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == 30)
    // id 3: MPEG2 leg (3 % 7 == 3), rate idx 0 → 22050, 23 frames
    assert(got(3L).getString(1) == "2" && got(3L).getInt(3) == 22050 &&
      got(3L).getLong(4) == 23L)
    // id 1: the VBR leg (1 % 6 == 1), frame-0 bitrate = idx 7 → 96 kbps
    assert(got(1L).getBoolean(7) && got(1L).getInt(6) == 96)
    // id 0: CBR, no VBR flag, ID3v2 absent (0 % 17 == 0 content bytes)
    assert(!got(0L).getBoolean(7))
    // junk rows quarantine
    val junk = Seq(Multimodal.MediaRow(99L, "audio", "zzz".getBytes,
      "audio/mpeg", 3L)).toDS()
    assert(Multimodal.mp3Meta(junk).isEmpty)
  }
}
