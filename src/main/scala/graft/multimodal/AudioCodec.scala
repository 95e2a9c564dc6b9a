package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, IOException}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real JVM-native audio codec — no external dependency: WAV (RIFF PCM)
  * encode/decode via `javax.sound.sampled` (in the JDK), features computed
  * from actual decoded samples. Closes the audio modality the same way
  * [[ImageCodec]]/[[GifCodec]] closed stills and video: the payload is a
  * genuine audio container, the sample count/rate come from the parsed
  * header, and every feature is arithmetic over the real PCM samples.
  *
  *  - decode: exact `sampleRate`/`channels`/`nSamples` from the parsed WAV
  *    header (`AudioInputStream.getFrameLength` — the real frame count,
  *    not a size heuristic), mean |amplitude| and RMS over every sample,
  *    and a 64-bit RMS-profile fingerprint: pool the |sample| series into
  *    64 equal windows, set bit k when window k's mean exceeds the global
  *    mean — the audio analog of the image aHash (duration-invariant on
  *    piecewise-constant envelopes, local: one changed envelope segment
  *    moves one bit).
  *  - encode: 8-bit unsigned PCM mono WAV; lossless for 8-bit content, so
  *    decode(encode(samples)) recovers the exact samples.
  *
  * Pure deterministic arithmetic — safe on executors, no audio hardware,
  * no resampling pipeline.
  */
object AudioCodec {

  final case class DecodedAudio(
      sampleRate: Int,
      channels: Int,
      nSamples: Int,           // frames, from the REAL parsed header
      meanAmp: Double,         // mean |s|, s in [-128, 127] (8-bit centered)
      rms: Double,             // sqrt(mean s²)
      fingerprint: Long        // 64-bit RMS-profile hash, bit k = window k
  )

  /** Lossless 8-bit unsigned PCM mono WAV encode. `samples` are centered
    * bytes (−128..127); the WAV stores them offset-binary per the RIFF
    * spec.
    */
  def encodeWav(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    require(samples.nonEmpty, "empty sample buffer")
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, false)
    val unsigned = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) {
      unsigned(i) = ((samples(i) & 0xff) ^ 0x80).toByte // center → offset-binary
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(unsigned), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload and compute the real features. IOException
    * channel on undecodable bytes — never returns garbage.
    */
  def decode(bytes: Array[Byte]): DecodedAudio = {
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case e: Exception => throw new IOException(s"audio decode failed: ${e.getMessage}", e) }
    try {
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 8 || fmt.getChannels != 1)
        throw new IOException(
          s"unsupported WAV shape: ${fmt.getSampleSizeInBits}-bit x${fmt.getChannels} " +
            "(this codec writes and reads 8-bit mono PCM)")
      val n = ais.getFrameLength.toInt
      if (n <= 0) throw new IOException(s"WAV header declares $n frames")
      val raw = ais.readAllBytes()
      if (raw.length < n) throw new IOException(
        s"WAV payload truncated: ${raw.length} of $n declared frames")
      val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
      // one pass: totals plus 64-window |amplitude| pooling (exact integers)
      val winSum = new Array[Long](64)
      val winN = new Array[Long](64)
      var sumAbs = 0L
      var sumSq = 0L
      var i = 0
      while (i < n) {
        val s = if (signed) raw(i).toInt else (raw(i) & 0xff) - 128
        val a = math.abs(s)
        sumAbs += a
        sumSq += s.toLong * s
        val w = (i.toLong * 64 / n).toInt
        winSum(w) += a
        winN(w) += 1
        i += 1
      }
      // merge-safe pooling for sub-64-sample clips: nearest-neighbor over
      // the window axis (the ImageCodec sub-8px discipline)
      if (n < 64) {
        java.util.Arrays.fill(winSum, 0L)
        java.util.Arrays.fill(winN, 0L)
        var w = 0
        while (w < 64) {
          val src = w * n / 64
          val s = if (signed) raw(src).toInt else (raw(src) & 0xff) - 128
          winSum(w) = math.abs(s)
          winN(w) = 1
          w += 1
        }
      }
      val means = Array.tabulate(64)(w => winSum(w).toDouble / winN(w))
      val global = means.sum / 64.0
      var fp = 0L
      var w = 0
      while (w < 64) {
        if (means(w) > global) fp |= (1L << w)
        w += 1
      }
      DecodedAudio(Math.round(fmt.getSampleRate).toInt, fmt.getChannels, n,
        sumAbs.toDouble / n, math.sqrt(sumSq.toDouble / n), fp)
    } finally ais.close()
  }

  /** Deterministic synthetic audio clip: `mediaId % families` selects a
    * family ENVELOPE (a 64-segment two-level |amplitude| profile — the
    * audio analog of the image cell pattern, driven by the same
    * [[ImageCodec.member]] seeds); the member index jitters the duration
    * and flips 0–3 envelope segments. Members of one family are REAL
    * near-duplicates: fingerprint hamming ≤ 6, slightly different
    * durations/rates — the corpus shape the audio dedup operator screens.
    * The waveform is a square wave whose half-period amplitude equals the
    * envelope level, so window means are exact.
    */
  def synthesizeClip(mediaId: Long, families: Int = 97): Array[Byte] = {
    val m = ImageCodec.member(mediaId, families)
    // reuse the pattern's 64 luma cells as amplitude levels 8..247 → 4..123
    val env = m.pattern.map(_ / 2)
    // FAMILY-stable traits (the image corpus's banded-dimension
    // discipline): the sample rate and the 32-wide duration band come from
    // the family seed, member jitter stays inside the band — so the au2
    // blocking key (rate, duration band) groups family members
    val rates = Array(8000, 11025, 16000, 22050)
    val rate = rates(java.lang.Math.floorMod(ImageCodec.mix(m.fseed + 9), 4L).toInt)
    val perWin = 64 +
      java.lang.Math.floorMod(ImageCodec.mix(m.fseed + 10), 4L).toInt * 32 +
      java.lang.Math.floorMod(ImageCodec.mix(m.mseed + 10), 32L).toInt // 64..223
    val n = perWin * 64
    val samples = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val w = i / perWin
      val amp = env(w)
      // square wave, period 8 samples: |s| == amp at every sample
      samples(i) = (if ((i / 4) % 2 == 0) amp else -amp).toByte
      i += 1
    }
    encodeWav(samples, rate)
  }
}
