package graft.multimodal

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, IOException}

import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
import javax.imageio.metadata.IIOMetadataNode

/** Real multi-frame GIF codec on the JDK's own `javax.imageio` GIF plugin —
  * no external dependency; the VIDEO analog of [[ImageCodec]]'s still path.
  *
  *  - encode: frames write through `ImageWriter.writeToSequence` as
  *    TYPE_BYTE_INDEXED rasters over an identity 256-level gray palette, so
  *    gray luma survives the GIF palette EXACTLY (encode→decode is lossless
  *    for gray content, the way PNG is for stills). Per-frame metadata
  *    carries the image offsets and the disposal method.
  *  - decodeFrames: real multi-frame decode — `getNumImages(true)` +
  *    `read(i)` — COMPOSITED per GIF89a screen semantics: each stored
  *    frame draws at its (left, top) offset onto the logical-screen
  *    canvas, and its disposal method decides what the NEXT frame sees
  *    (`none`/`doNotDispose` keep the canvas, `restoreToBackgroundColor`
  *    clears the frame's rectangle, `restoreToPrevious` rewinds the draw).
  *    Per-frame features are [[ImageCodec.features]] of the composited
  *    canvas — the frame a viewer actually displays, not the stored
  *    sub-rectangle.
  *
  * Non-GIF payloads (a PNG/BMP still handed to the frame path) decode as a
  * single frame, so every media row — image, audio-with-poster, video —
  * takes the same executor-side code path.
  *
  * The reference delegates all media handling to external tooling; this
  * closes the engine's last stubbed feature path (the former `frameStub`
  * payload rewrite) with actual decoded frames.
  */
object GifCodec {

  ImageIO.setUseCache(false) // never spill stream caches to executor temp

  /** Identity 256-level gray palette: index i ↦ rgb(i, i, i). */
  private val grayPalette: IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new IndexColorModel(8, 256, g, g, g)
  }

  /** Build an indexed-gray frame from a luma function — the GIF analog of
    * [[ImageCodec.grayImage]]; the identity palette makes the encode
    * lossless for gray content.
    */
  def grayIndexedImage(w: Int, h: Int, luma: (Int, Int) => Int): BufferedImage = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, luma(x, y) & 0xff); x += 1 }
      y += 1
    }
    img
  }

  /** Where a stored frame sits on the logical screen and how it disposes.
    * `disposal` is the GIF metadata vocabulary: `none`, `doNotDispose`,
    * `restoreToBackgroundColor`, `restoreToPrevious`.
    */
  final case class FramePlacement(left: Int = 0, top: Int = 0,
      disposal: String = "doNotDispose")

  private def firstChild(root: IIOMetadataNode, name: String): IIOMetadataNode = {
    var n = root.getFirstChild
    while (n != null) {
      if (n.getNodeName == name) return n.asInstanceOf[IIOMetadataNode]
      n = n.getNextSibling
    }
    val created = new IIOMetadataNode(name)
    root.appendChild(created)
    created
  }

  private def removeChildren(root: IIOMetadataNode, name: String): Unit = {
    var n = root.getFirstChild
    while (n != null) {
      val next = n.getNextSibling
      if (n.getNodeName == name) root.removeChild(n)
      n = next
    }
  }

  /** The frame's ACTUAL palette as a LocalColorTable metadata node. Without
    * it the JDK GIF writer falls back to a generic web-safe global palette
    * in sequence mode — indices survive but their COLORS are remapped, and
    * gray luma is destroyed (observed: index 60 ↦ rgb 0x33cc00).
    */
  private def localColorTable(icm: IndexColorModel): IIOMetadataNode = {
    val lct = new IIOMetadataNode("LocalColorTable")
    lct.setAttribute("sizeOfLocalColorTable", icm.getMapSize.toString)
    lct.setAttribute("sortFlag", "FALSE")
    var i = 0
    while (i < icm.getMapSize) {
      val e = new IIOMetadataNode("ColorTableEntry")
      e.setAttribute("index", i.toString)
      e.setAttribute("red", icm.getRed(i).toString)
      e.setAttribute("green", icm.getGreen(i).toString)
      e.setAttribute("blue", icm.getBlue(i).toString)
      lct.appendChild(e)
      i += 1
    }
    lct
  }

  /** Encode an animated GIF (one frame is a legal, single-image GIF). The
    * logical screen is the writer's default: the first frame's bounds —
    * offset frames must therefore fit inside frame 0, which every real
    * optimizer's output satisfies (frame 0 paints the full screen).
    */
  def encodeGif(frames: Seq[BufferedImage],
      placements: Seq[FramePlacement] = Nil): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val pl =
      if (placements.isEmpty) frames.map(_ => FramePlacement())
      else {
        require(placements.length == frames.length,
          s"${placements.length} placements for ${frames.length} frames")
        placements
      }
    val writers = ImageIO.getImageWritersByFormatName("gif")
    if (!writers.hasNext) throw new IOException("no GIF writer available in this JVM")
    val writer = writers.next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.zip(pl).foreach { case (f, p) =>
        val param = writer.getDefaultWriteParam
        val meta = writer.getDefaultImageMetadata(
          ImageTypeSpecifier.createFromRenderedImage(f), param)
        val fmt = "javax_imageio_gif_image_1.0"
        val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        val desc = firstChild(root, "ImageDescriptor")
        desc.setAttribute("imageLeftPosition", p.left.toString)
        desc.setAttribute("imageTopPosition", p.top.toString)
        // rebuild LocalColorTable + GraphicControlExtension in DTD order
        // right after the descriptor, palette first
        removeChildren(root, "LocalColorTable")
        removeChildren(root, "GraphicControlExtension")
        val gce = new IIOMetadataNode("GraphicControlExtension")
        gce.setAttribute("disposalMethod", p.disposal)
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "10")
        gce.setAttribute("transparentColorIndex", "0")
        root.insertBefore(gce, desc.getNextSibling)
        f.getColorModel match {
          case icm: IndexColorModel =>
            root.insertBefore(localColorTable(icm), gce)
          case _ => () // non-indexed input: accept the writer's own palette
        }
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new IIOImage(f, null, meta), param)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  private def attr(node: IIOMetadataNode, name: String, dflt: String): String = {
    val v = node.getAttribute(name)
    if (v == null || v.isEmpty) dflt else v
  }

  /** Open a reader over the payload and hand it to `f`; IOException channel
    * for undecodable bytes, reader/stream always released.
    */
  private def withReader[T](bytes: Array[Byte])(
      f: (javax.imageio.ImageReader, Boolean) => T): T = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(iis)
    if (!readers.hasNext) {
      iis.close()
      throw new IOException("undecodable media payload (no ImageIO reader matched)")
    }
    val reader = readers.next()
    try {
      reader.setInput(iis, false, false) // seekForwardOnly=false, ignoreMetadata=false
      try f(reader, reader.getFormatName.equalsIgnoreCase("gif"))
      catch {
        case e: IOException => throw e
        case e: Exception => throw new IOException(s"frame decode failed: ${e.getMessage}", e)
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** REAL frame count: `getNumImages(true)` walks the container's block
    * structure (1 for any still format).
    */
  def frameCount(bytes: Array[Byte]): Int =
    withReader(bytes)((reader, _) => reader.getNumImages(true))

  /** Fold over the COMPOSITED frames in order. Non-GIF payloads yield one
    * frame (the still itself).
    */
  private def foldFrames[T](bytes: Array[Byte])(
      f: (Int, BufferedImage) => Option[T]): Seq[T] =
    withReader(bytes) { (reader, isGif) =>
      if (!isGif) f(0, reader.read(0)).toSeq
      else {
      val n = reader.getNumImages(true)
      // logical screen from the stream metadata; a malformed header falls
      // back to frame 0's bounds
      val (sw, sh) = {
        val smd = reader.getStreamMetadata
        val dims =
          if (smd == null) None
          else {
            val root = smd.getAsTree("javax_imageio_gif_stream_1.0")
              .asInstanceOf[IIOMetadataNode]
            val lsd = root.getElementsByTagName("LogicalScreenDescriptor")
            if (lsd.getLength == 0) None
            else {
              val d = lsd.item(0).asInstanceOf[IIOMetadataNode]
              try Some((d.getAttribute("logicalScreenWidth").toInt,
                d.getAttribute("logicalScreenHeight").toInt))
              catch { case _: NumberFormatException => None }
            }
          }
        dims.getOrElse((reader.read(0).getWidth, reader.read(0).getHeight))
      }
      if (sw <= 0 || sh <= 0) throw new IOException(s"bad GIF logical screen ${sw}x$sh")
      val canvas = new BufferedImage(sw, sh, BufferedImage.TYPE_INT_RGB)
      val g = canvas.createGraphics()
      val out = Seq.newBuilder[T]
      try {
        var i = 0
        while (i < n) {
          val frame = reader.read(i)
          val root = reader.getImageMetadata(i)
            .getAsTree("javax_imageio_gif_image_1.0").asInstanceOf[IIOMetadataNode]
          val desc = firstChild(root, "ImageDescriptor")
          val left = attr(desc, "imageLeftPosition", "0").toInt
          val top = attr(desc, "imageTopPosition", "0").toInt
          val gceList = root.getElementsByTagName("GraphicControlExtension")
          val disposal =
            if (gceList.getLength == 0) "none"
            else attr(gceList.item(0).asInstanceOf[IIOMetadataNode],
              "disposalMethod", "none")
          // snapshot only when this frame will be rewound afterwards
          val before: BufferedImage =
            if (disposal == "restoreToPrevious") {
              val c = new BufferedImage(sw, sh, BufferedImage.TYPE_INT_RGB)
              c.createGraphics().drawImage(canvas, 0, 0, null)
              c
            } else null
          g.drawImage(frame, left, top, null)
          out ++= f(i, canvas)
          disposal match {
            case "restoreToBackgroundColor" =>
              // the deterministic reading of "background": clear the
              // frame's rectangle to black (viewers disagree between the
              // background index and transparency; black is index 0 of
              // every gray palette this codec writes)
              g.setColor(java.awt.Color.BLACK)
              g.fillRect(left, top, frame.getWidth, frame.getHeight)
            case "restoreToPrevious" =>
              g.drawImage(before, 0, 0, null)
            case _ => () // none / doNotDispose: canvas persists
          }
          i += 1
        }
      } finally g.dispose()
      out.result()
      }
    }

  /** Per-frame features of the COMPOSITED frames — the real replacement
    * for the former size-derived frame stub.
    */
  def decodeFrames(bytes: Array[Byte]): Seq[ImageCodec.Decoded] =
    foldFrames(bytes)((_, img) => Some(ImageCodec.features(img)))

  /** Every `stride`-th composited frame, re-encoded as a lossless PNG —
    * the extract-frames-for-training shape (payload is the REAL displayed
    * frame, not a rewrite).
    */
  def sampleFramePayloads(bytes: Array[Byte], stride: Int): Seq[(Int, Array[Byte])] = {
    require(stride >= 1, s"need stride >= 1: $stride")
    foldFrames(bytes)((i, img) =>
      if (i % stride == 0) Some(i -> ImageCodec.encodePng(img)) else None)
  }

  /** True when animation frame `k` (k ≥ 1) of `mediaId` opens a NEW SCENE
    * rather than drifting one cell — one deterministic rule shared by the
    * synthesizer, its tests, and anything replaying the corpus structure.
    */
  def isSceneCut(mediaId: Long, k: Int, families: Int = 97): Boolean = {
    val m = ImageCodec.member(mediaId, families)
    java.lang.Math.floorMod(ImageCodec.mix(m.mseed + 200 + k), 5L) == 0
  }

  /** Deterministic synthetic ANIMATION: frame 0 is exactly the member
    * pattern [[ImageCodec.synthesize]] would paint (so first-frame features
    * match the still corpus). Each later frame either DRIFTS — flips ONE
    * cell, so adjacent frames are genuine near-duplicates (hamming ≤ 1 at
    * the pattern level) — or, on the deterministic [[isSceneCut]] marks
    * (~1 frame in 5), opens a NEW SCENE: a fresh two-level pattern at the
    * same luma levels, a large aHash jump. That gives videos real temporal
    * structure: within-scene frames near-dup, cross-scene frames far —
    * exactly what shot-boundary detection (m9) exists to find, while
    * frames of same-family videos before their first cuts stay within the
    * banded near-dup envelope the media dedup operators screen for.
    * 2..8 frames, full-size, doNotDispose.
    */
  def synthesizeAnimation(mediaId: Long, families: Int = 97): Array[Byte] = {
    val m = ImageCodec.member(mediaId, families)
    val nFrames = 2 + java.lang.Math.floorMod(ImageCodec.mix(m.mseed + 99), 7L).toInt
    var pattern = m.pattern.clone()
    val frames = (0 until nFrames).map { k =>
      if (k > 0) {
        if (isSceneCut(mediaId, k, families)) {
          // new scene: reshuffle which cells are high (same lo/hi levels,
          // same ≥4-cells-per-level floor as ImageCodec.member)
          val sseed = ImageCodec.mix(m.mseed + 300 + k)
          val nHigh = 4 + java.lang.Math.floorMod(ImageCodec.mix(sseed + 3), 57L).toInt
          val order = (0 until 64).sortBy(c => ImageCodec.mix(sseed + 16 + c))
          val fresh = new Array[Int](64)
          order.zipWithIndex.foreach { case (cell, rank) =>
            fresh(cell) = if (rank < nHigh) m.hi else m.lo
          }
          pattern = fresh
        } else {
          val c = java.lang.Math.floorMod(ImageCodec.mix(m.mseed + 100 + k), 64L).toInt
          pattern(c) = if (pattern(c) == m.hi) m.lo else m.hi
        }
      }
      grayIndexedImage(m.w, m.h, (x, y) => pattern((y * 8 / m.h) * 8 + (x * 8 / m.w)))
    }
    encodeGif(frames)
  }
}
