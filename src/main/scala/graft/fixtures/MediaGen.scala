package graft.fixtures

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** Deterministic multimodal fixtures: every byte blob is a pure function of
  * `docId`, and every decoded property (dimensions, channel means, sample
  * counts, peak amplitude) has a CLOSED FORM in `docId` — so the DuckDB
  * oracle can compute the expected decode output in SQL and pin the engine's
  * real encode→decode round-trip (q24/q36/q37), not just its row counts.
  *
  * No external data: blobs are synthesized in-process with the JDK's own
  * codecs, mirroring how [[WebTextGen]] synthesizes the webtext corpus.
  */
object MediaGen {

  /** Image dims/color closed forms (mirrored in the q24 oracle SQL). */
  def imgWidth(docId: Long): Int = (16 + (docId % 8) * 16).toInt
  def imgHeight(docId: Long): Int = (16 + ((docId / 8) % 8) * 16).toInt
  def imgR(docId: Long): Int = ((docId * 37) % 256).toInt
  def imgG(docId: Long): Int = ((docId * 73) % 256).toInt
  def imgB(docId: Long): Int = ((docId * 101) % 256).toInt

  /** A solid-color PNG whose dimensions and channel means are closed forms
    * of `docId`. Solid fill ⇒ per-channel mean is exactly the fill value,
    * invariant under any correct resize. */
  def pngFor(docId: Long): Array[Byte] = {
    val img = new BufferedImage(imgWidth(docId), imgHeight(docId),
      BufferedImage.TYPE_3BYTE_BGR)
    val rgb = (imgR(docId) << 16) | (imgG(docId) << 8) | imgB(docId)
    val row = Array.fill(img.getWidth)(rgb) // bulk row writes (per-pixel setRGB is ~10x slower)
    var y = 0
    while (y < img.getHeight) { img.setRGB(0, y, img.getWidth, 1, row, 0, img.getWidth); y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** WAV closed forms: a 16-bit mono PCM sine at 8 kHz whose period is a
    * multiple of 4 samples, so the waveform hits sin = ±1 on exact sample
    * indices ⇒ decoded `peak` == `wavAmp` exactly. Whole cycles only ⇒
    * `n_frames` == samplesPerCycle × nCycles exactly. */
  def wavSamplesPerCycle(docId: Long): Int = (4 * (2 + docId % 6)).toInt
  def wavCycles(docId: Long): Int = (50 + docId % 50).toInt
  def wavAmp(docId: Long): Int = (1000 + (docId % 20) * 500).toInt
  def wavFrames(docId: Long): Int = wavSamplesPerCycle(docId) * wavCycles(docId)
  val WavSampleRate = 8000

  /** RIFF/WAVE container written field-by-field (PCM 16-bit LE mono). */
  def wavFor(docId: Long): Array[Byte] = {
    val spc = wavSamplesPerCycle(docId)
    val n = wavFrames(docId)
    val amp = wavAmp(docId)
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1)                       // PCM
    bb.putShort(1)                       // mono
    bb.putInt(WavSampleRate)
    bb.putInt(WavSampleRate * 2)         // byte rate
    bb.putShort(2)                       // block align
    bb.putShort(16)                      // bits per sample
    bb.put("data".getBytes); bb.putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort(math.round(amp * math.sin(2 * math.Pi * i / spc)).toShort)
      i += 1
    }
    bb.array()
  }

  /** Video closed forms (mirrored in the q37 oracle SQL). */
  def videoFrameCount(docId: Long): Int = (2 + docId % 5).toInt
  def videoFrameWidth(docId: Long): Int = (16 + (docId % 4) * 16).toInt
  val VideoFrameHeight = 16
  def videoFrameR(docId: Long, frame: Int): Int = ((docId * 37 + frame * 11) % 256).toInt

  /** A concatenated-PNG "video": `videoFrameCount` solid-color frames whose
    * red channel varies per frame. */
  def videoFor(docId: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    (0 until videoFrameCount(docId)).foreach { f =>
      val img = new BufferedImage(videoFrameWidth(docId), VideoFrameHeight,
        BufferedImage.TYPE_3BYTE_BGR)
      val rgb = (videoFrameR(docId, f) << 16) | (imgG(docId) << 8) | imgB(docId)
      val row = Array.fill(img.getWidth)(rgb)
      var y = 0
      while (y < img.getHeight) { img.setRGB(0, y, img.getWidth, 1, row, 0, img.getWidth); y += 1 }
      ImageIO.write(img, "png", bos)
    }
    bos.toByteArray
  }
}
