package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batched per-partition feature extraction.
  *
  * The image codec is REAL: `javax.imageio` (in every JDK — PNG, JPEG,
  * GIF, BMP readers) decodes, measures and resizes inside the existing
  * mapPartitions batch shape. Payloads no installed reader understands
  * (exotic codecs, audio/video containers — their libraries are not in
  * this environment) fall back to `decodeStub`/`resizeStub`, a
  * deterministic fake that derives "features" from the raw bytes, so the
  * pipeline stays TOTAL: every row yields a feature row, and the `codec`
  * column says which path produced it. Everything Spark-cares-about is
  * identical on both paths: the schema contract, the mapPartitions
  * batching (the Scala analogue of `mapInPandas` batch shape), partition
  * sizing, and the metadata columns computed as native expressions.
  *
  * Scale posture: binary payloads stay in executor space end-to-end
  * (no collect); partition size is controlled upstream by
  * `spark.sql.files.maxPartitionBytes`, and the per-partition iterator
  * keeps memory at one record batch (decode buffers are per-row,
  * row-strided — never a whole-partition pixel buffer).
  */
/** SPI for real video-frame decoding. No JDK codec can decode mp4
  * FRAMES, so the engine ships NO default provider — [[Multimodal
  * .decodeMedia]] keeps the honest `mp4` codec label and byte-histogram
  * stub feature. A deployment with a real codec (e.g. a jcodec-backed
  * provider) plugs in WITHOUT forking, either programmatically
  * ([[VideoFrameDecoder.register]]) or by dropping a jar with a
  * `META-INF/services/graft.ext.VideoFrameDecoder` entry on the
  * classpath (`java.util.ServiceLoader`). Providers must be
  * Serializable: the instance is resolved once on the driver and
  * shipped inside the task closure. */
trait VideoFrameDecoder extends Serializable {
  /** Short provenance label; decoded rows are tagged `mp4+<name>`. */
  def name: String

  /** Average-pooled feature over up to `maxFrames` decoded frames, or
    * None when this provider cannot decode the payload (the row then
    * falls back to the honest stub path). */
  def decode(bytes: Array[Byte], maxFrames: Int): Option[Array[Float]]
}

object VideoFrameDecoder {
  @volatile private var registered: Option[VideoFrameDecoder] = None

  /** Install a provider for this JVM (tests, embedding applications);
    * takes precedence over ServiceLoader discovery. */
  def register(d: VideoFrameDecoder): Unit = registered = Some(d)

  /** Remove the programmatic provider (ServiceLoader jars, if any,
    * become visible again). */
  def clear(): Unit = registered = None

  /** Resolution order: programmatic > ServiceLoader > none (the honest
    * default). */
  def installed: Option[VideoFrameDecoder] = registered.orElse {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[VideoFrameDecoder])
      .iterator().asScala.nextOption()
  }
}

object Multimodal {

  // decode from memory: ImageIO's default disk cache would write a temp
  // file per decode on every executor
  javax.imageio.ImageIO.setUseCache(false)

  /** Canonical media record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),    // image | audio | video
    StructField("content", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),        // metadata, nullable pre-decode
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType)))

  /** Cheap native metadata: byte length, digest, magic-byte sniff —
    * pure Column expressions, no decode needed. */
  def withByteMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)))
      .withColumn("digest", md5(col(binCol)))
      .withColumn("magic_hex", hex(substring(col(binCol), 1, 4)))

  final case class MediaFeatures(media_id: Long, n_bytes: Int,
      byte_entropy: Double, feature: Array[Float])

  /** Decoded-image record: dimensions + which codec path produced the
    * feature ("imageio" = real decode, "stub" = byte-derived fallback). */
  final case class DecodedMedia(media_id: Long, codec: String,
      width: Option[Int], height: Option[Int], feature: Array[Float])

  /** REAL image decode via `javax.imageio` (PNG/JPEG/GIF/BMP in every
    * JDK): (width, height, 8-bin normalized luminance histogram) — the
    * same 8-dim feature shape as the stub, but computed from pixels.
    * Returns None when no installed reader accepts the payload (or it is
    * truncated/corrupt) so callers can fall back without dropping the
    * row. Pixels are read ROW-STRIDED (one int row reused), never a
    * whole-image buffer beyond what the JDK decoder itself allocates. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val hist = new Array[Int](8)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            // integer Rec.601 luma in [0, 255] -> 8 bins
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum >> 5) += 1
            x += 1
          }
          y += 1
        }
        val n = math.max(w * h, 1).toFloat
        Some((w, h, hist.map(_ / n)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Magic-byte gates for the decode ROUTING: `ImageIO.read` and
    * `AudioSystem.getAudioInputStream` both run a provider scan and an
    * exception-driven rejection on every non-matching payload — measured
    * ~0.3 ms/row, which turned the mostly-stub codec sweep superlinear at
    * sf1 (0.4 s → 16 s). A 4–12 byte header check keeps the hot path
    * free for the overwhelming stub majority; formats are exactly the
    * stock-JDK reader set (PNG/JPEG/GIF/BMP/TIFF; RIFF-WAVE/AIFF/AU), so
    * the gate never rejects a payload the decoder would accept — except
    * headerless WBMP, which no corpus-scale pipeline can distinguish
    * from arbitrary bytes anyway (documented stub trade). */
  private[ext] def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 0x50) || // PNG
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) || // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
      (b(0) == 'B' && b(1) == 'M') ||
      (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) || // TIFF LE
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)) // TIFF BE

  /** Container format behind a payload [[looksLikeImage]] accepted —
    * the same magic branches, so the gate and the label can never
    * disagree. The codec column carries THIS (png/jpeg/gif/bmp/tiff),
    * not a flat "imageio": a curation filter like "drop gif" needs the
    * container, and a jpeg silently routed through the png path would be
    * invisible under one shared label. */
  private[ext] def imageFormat(b: Array[Byte]): String =
    if (b(0) == 0x89.toByte) "png"
    else if (b(0) == 0xFF.toByte) "jpeg"
    else if (b(0) == 'G') "gif"
    else if (b(0) == 'B') "bmp"
    else "tiff"

  private[ext] def looksLikeAudio(b: Array[Byte]): Boolean =
    (b.length >= 12 &&
      ((b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
       (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
        b(8) == 'A' && b(9) == 'I' && b(10) == 'F'))) || // AIFF/AIFC
    (b.length >= 4 &&
      b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd') // AU

  /** Total codec: real decode when a reader exists, byte-stub otherwise. */
  def decodeAuto(bytes: Array[Byte]): Array[Float] = {
    val gated =
      if (bytes != null && looksLikeImage(bytes)) decodeImage(bytes).map(_._3)
      else None
    gated.orElse(
      if (bytes != null && looksLikeAudio(bytes)) decodeWav(bytes).map(_._2)
      else None
    ).getOrElse(decodeStub(if (bytes == null) Array.empty[Byte] else bytes))
  }

  /** REAL audio decode via `javax.sound.sampled` (WAV/AIFF/AU PCM readers
    * ship in every JDK, same dependency-free posture as the imageio
    * path): (duration_ms, 8-bin normalized |amplitude| histogram) — the
    * same 8-dim feature shape as the image/stub paths. Non-PCM encodings
    * the JDK can transcode (A-law/µ-law) are converted to 16-bit PCM
    * first. Streaming frame loop: one 8 KiB buffer regardless of clip
    * length, never a whole-clip sample array. None when no reader
    * accepts the payload (or it is truncated/corrupt). */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Float])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (bytes == null || bytes.length == 0) return None
    try {
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val rf = raw.getFormat
        val durationMs =
          if (raw.getFrameLength >= 0 && rf.getFrameRate > 0)
            math.round(raw.getFrameLength * 1000.0 / rf.getFrameRate).toInt
          else return None
        val pcm16 = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          rf.getSampleRate, 16, rf.getChannels, rf.getChannels * 2,
          rf.getSampleRate, false)
        val in =
          if (rf.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            rf.getSampleSizeInBits == 16 && !rf.isBigEndian) raw
          else AudioSystem.getAudioInputStream(pcm16, raw)
        val hist = new Array[Long](8)
        var nSamples = 0L
        val buf = new Array[Byte](8192)
        var read = in.read(buf)
        var carry = -1 // low byte awaiting its high byte across reads
        while (read > 0) {
          var i = 0
          if (carry >= 0 && read >= 1) {
            val s = ((buf(0) << 8) | carry).toShort
            hist(math.min(7, math.abs(s.toInt) * 8 / 32768)) += 1
            nSamples += 1; carry = -1; i = 1
          }
          while (i + 1 < read) {
            val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
            hist(math.min(7, math.abs(s.toInt) * 8 / 32768)) += 1
            nSamples += 1; i += 2
          }
          if (i < read) carry = buf(i) & 0xff
          read = in.read(buf)
        }
        if (nSamples == 0) None
        else Some((durationMs, hist.map(_ / nSamples.toFloat)))
      } finally raw.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic mono 16-bit PCM WAV fixture: `nSamples` samples of a
    * seed-scaled sine at `sampleRate` Hz — every engine can restate its
    * duration (`nSamples / sampleRate` seconds) literally. */
  def syntheticWav(seed: Int, nSamples: Int,
      sampleRate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (math.sin(i * 0.05 * (seed + 1)) * 16384).toInt.toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** REAL video-container metadata via a dependency-free ISO BMFF (MP4 /
    * MOV / M4V) box walk: (duration_ms, width, height). No JDK ships a
    * video FRAME decoder, so frames stay honestly stubbed — but the
    * container metadata a curation pipeline filters on (clip length,
    * resolution) is in plain big-endian box structure that sixty lines of
    * bounds-checked Scala can read: `moov/mvhd` carries timescale +
    * duration, `moov/trak/tkhd` carries per-track 16.16-fixed width and
    * height (audio tracks record 0×0; the first visual track wins).
    * Handles 64-bit largesize (size==1), to-end-of-file (size==0), and
    * version-1 (64-bit time) mvhd/tkhd variants. None for anything
    * malformed, truncated, or not starting with an `ftyp` — a text
    * payload can never sneak in (the total codec falls through to the
    * byte stub, and the codec column says so). */
  def parseMp4Meta(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes == null || bytes.length < 16) return None
    val n = bytes.length.toLong
    def u16(o: Long): Int = (((bytes(o.toInt) & 0xff) << 8) |
      (bytes(o.toInt + 1) & 0xff))
    def u32(o: Long): Long = ((bytes(o.toInt) & 0xffL) << 24) |
      ((bytes(o.toInt + 1) & 0xffL) << 16) |
      ((bytes(o.toInt + 2) & 0xffL) << 8) | (bytes(o.toInt + 3) & 0xffL)
    def u64(o: Long): Long = (u32(o) << 32) | u32(o + 4)
    def boxType(o: Long): String =
      new String(bytes, o.toInt + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    /** (payloadStart, payloadEnd) of the first `want` box in [from, to). */
    def findBox(from: Long, to: Long, want: String): Option[(Long, Long)] = {
      var o = from
      while (o + 8 <= to) {
        val sz0 = u32(o)
        val (payload, end) =
          if (sz0 == 1L) { if (o + 16 > to) return None; (o + 16, o + u64(o + 8)) }
          else if (sz0 == 0L) (o + 8, to)
          else (o + 8, o + sz0)
        if (end < payload || end > to) return None // malformed / truncated
        if (boxType(o) == want) return Some((payload, end))
        o = end
      }
      None
    }
    try {
      // sniff: an ISO BMFF file leads with ftyp (styp for segments)
      val lead = boxType(0)
      if (lead != "ftyp" && lead != "styp") return None
      val (ms, me) = findBox(0, n, "moov").getOrElse(return None)
      // fragmented file (moov/mvex present): the REAL duration lives in
      // the moof fragments, not mvhd (which is 0 or a lie there) — refuse
      // rather than report a wrong measurement; the total codec falls to
      // the byte stub and the codec column says so
      if (findBox(ms, me, "mvex").isDefined) return None
      val durationMs = findBox(ms, me, "mvhd").flatMap { case (p, e) =>
        val v = bytes(p.toInt) & 0xff
        val (timescale, duration) =
          if (v == 1) { if (p + 32 > e) return None; (u32(p + 20), u64(p + 24)) }
          else { if (p + 20 > e) return None; (u32(p + 12), u32(p + 16)) }
        if (timescale <= 0) None
        else Some((duration * 1000.0 / timescale).round.toInt)
      }.getOrElse(return None)
      // first trak whose tkhd has nonzero dimensions = the visual track
      var o = ms
      var dims: Option[(Int, Int)] = None
      while (dims.isEmpty && o < me) {
        findBox(o, me, "trak") match {
          case Some((tp, te)) =>
            dims = findBox(tp, te, "tkhd").flatMap { case (p, e) =>
              val v = bytes(p.toInt) & 0xff
              val wOff = if (v == 1) p + 88 else p + 76
              if (wOff + 8 > e) None
              else {
                val (w, h) = (u16(wOff), u16(wOff + 4)) // 16.16 integer part
                if (w > 0 && h > 0) Some((w, h)) else None
              }
            }
            o = te
          case None => o = me
        }
      }
      dims.map { case (w, h) => (durationMs, w, h) }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic minimal-but-valid MP4 fixture (`ftyp` + `moov(mvhd +
    * trak(tkhd))`): exact millisecond duration at timescale 1000 and
    * exact pixel dimensions, so every engine can restate the metadata
    * literally — the video analogue of [[syntheticWav]]. */
  def syntheticMp4(durationMs: Int, width: Int, height: Int,
      fragmented: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = { out.write(((v >> 24) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write((v & 0xff).toInt) }
    def tag(t: String): Unit = out.write(t.getBytes("ISO-8859-1"))
    val unityMatrix = Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L,
      0x40000000L)
    u32(20); tag("ftyp"); tag("isom"); u32(0); tag("isom")
    // fragmented variant: an (empty) moov/mvex marker — parseMp4Meta must
    // REFUSE it (mvhd duration is not the clip duration there)
    u32(if (fragmented) 224 else 216); tag("moov")
    if (fragmented) { u32(8); tag("mvex") }
    u32(108); tag("mvhd"); u32(0) // version 0 + flags
    u32(0); u32(0)                // creation, modification
    u32(1000); u32(durationMs)    // timescale, duration
    u32(0x00010000); u32(0x01000000) // rate 1.0; volume 1.0 + reserved16
    u32(0); u32(0)                // reserved64
    unityMatrix.foreach(u32); (0 until 6).foreach(_ => u32(0)) // predefined
    u32(2)                        // next_track_ID
    u32(100); tag("trak")
    u32(92); tag("tkhd"); u32(7)  // version 0 + flags (enabled|in-movie)
    u32(0); u32(0); u32(1); u32(0) // creation, modification, track_ID, rsvd
    u32(durationMs); u32(0); u32(0) // duration, reserved64
    u32(0); u32(0)                // layer+altgroup; volume+reserved16
    unityMatrix.foreach(u32)
    u32(width.toLong << 16); u32(height.toLong << 16) // 16.16 fixed
    out.toByteArray
  }

  /** Decoded record for the four-way total codec: codec ∈ an image
    * format (png/jpeg/gif/bmp/tiff — [[imageFormat]]; width/height set),
    * wav (duration_ms set), mp4 (all three set), stub (byte-derived
    * feature only). */
  final case class DecodedAny(media_id: Long, codec: String,
      width: Option[Int], height: Option[Int], duration_ms: Option[Int],
      feature: Array[Float])

  /** Batched four-way decode: image readers first, audio readers next,
    * MP4 container metadata third, byte-stub last — total over any
    * payload, one row per input, same mapPartitions batch shape as
    * [[decodeImages]]. By default the mp4 feature stays the byte
    * histogram (no JDK frame decoder exists — the codec column keeps
    * that honest) while width/height/duration are REAL container
    * measurements; a deployment with a real codec plugs a
    * [[VideoFrameDecoder]] in (programmatic register or ServiceLoader
    * jar) and mp4 rows route through it, labeled `mp4+<name>` so
    * provenance stays visible. */
  def decodeMedia(df: DataFrame, idCol: String, binCol: String):
      Dataset[DecodedAny] = {
    val spark = df.sparkSession
    import spark.implicits._
    // resolved ON THE DRIVER (one lookup per query, not per row) and
    // serialized into the closure — the SPI contract requires providers
    // to be Serializable for exactly this reason
    val dec = VideoFrameDecoder.installed
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        // magic-byte gates (looksLike*) keep the per-row cost of the
        // stub majority at a header compare, not a provider scan
        (if (looksLikeImage(b)) decodeImage(b) else None) match {
          case Some((w, h, f)) =>
            DecodedAny(id, imageFormat(b), Some(w), Some(h), None, f)
          case None => (if (looksLikeAudio(b)) decodeWav(b) else None) match {
            case Some((ms, f)) =>
              DecodedAny(id, "wav", None, None, Some(ms), f)
            case None => parseMp4Meta(b) match {
              case Some((ms, w, h)) =>
                dec.flatMap(p => p.decode(b, maxFrames = 4).map(f =>
                  DecodedAny(id, "mp4+" + p.name, Some(w), Some(h),
                    Some(ms), f)))
                  .getOrElse(DecodedAny(id, "mp4", Some(w), Some(h),
                    Some(ms), decodeStub(b)))
              case None =>
                DecodedAny(id, "stub", None, None, None, decodeStub(b))
            }
          }
        }
      })
  }

  /** DECODE STUB — deterministic fallback for payloads without an
    * installed codec (and the audio/video stand-in). Derives an 8-dim
    * "feature vector" from a byte histogram: same signature and shape as
    * the real path, so the two are interchangeable per row. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Int](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    hist.map(_ / n)
  }

  private def entropy(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 0.0
    val counts = new Array[Int](256)
    bytes.foreach(b => counts(b & 0xff) += 1)
    val n = bytes.length.toDouble
    counts.filter(_ > 0).map { c =>
      val p = c / n; -p * math.log(p) / math.log(2)
    }.sum
  }

  /** Batched per-partition feature extraction (the `mapInPandas` shape in
    * Scala: one iterator pass per partition, no per-row task overhead).
    * `codec` defaults to the real-image-then-stub total codec. */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
      codec: Array[Byte] => Array[Float] = decodeAuto):
      Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        MediaFeatures(id, b.length, entropy(b), codec(b))
      })
  }

  /** Batched decode with dimensions: one [[DecodedMedia]] row per input,
    * real-decoded rows carry (width, height) and codec="imageio",
    * fallback rows carry None and codec="stub" — the total-pipeline
    * contract downstream filters/joins can rely on. */
  def decodeImages(df: DataFrame, idCol: String, binCol: String):
      Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        decodeImage(b) match {
          case Some((w, h, f)) => DecodedMedia(id, "imageio", Some(w), Some(h), f)
          case None => DecodedMedia(id, "stub", None, None, decodeStub(b))
        }
      })
  }

  /** REAL image resize: decode, scale the long edge to `maxDim`
    * (aspect-preserving, bilinear), re-encode as PNG. None when the
    * payload doesn't decode; unchanged bytes when already small enough. */
  def resizeImage(bytes: Array[Byte], maxDim: Int): Option[Array[Byte]] = {
    require(maxDim >= 1, "maxDim must be positive")
    decodeImage(bytes) match {
      case None => None
      case Some((w, h, _)) if math.max(w, h) <= maxDim => Some(bytes)
      case Some((w, h, _)) =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val scale = maxDim.toDouble / math.max(w, h)
          val (nw, nh) = (math.max(1, math.round(w * scale).toInt),
            math.max(1, math.round(h * scale).toInt))
          val out = new java.awt.image.BufferedImage(nw, nh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, nw, nh, null)
          } finally g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          Some(baos.toByteArray)
        } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Batched image resize (same mapPartitions contract as [[resized]]):
    * decodable payloads come back re-encoded with the long edge at
    * `maxDim`; non-decodable payloads pass through UNCHANGED (a byte
    * subsample of a non-image has no meaning — the stub path is for the
    * feature extractor, not the resizer). */
  def resizedImages(df: DataFrame, idCol: String, binCol: String,
      maxDim: Int): Dataset[(Long, Array[Byte])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        (id, resizeImage(b, maxDim).getOrElse(b))
      })
  }

  /** RESIZE STUB — deterministic byte-level resample for codec-less
    * payloads: stride-subsample the payload down to ~targetBytes. Kept as
    * the fallback contract for environments without media readers; the
    * per-partition batching in [[resized]] is the production shape. */
  def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    if (bytes.length <= targetBytes) bytes
    else {
      val stride = bytes.length.toDouble / targetBytes
      Array.tabulate(targetBytes)(i => bytes((i * stride).toInt))
    }

  /** Batched resize over a binary column (same mapPartitions shape as
    * [[extractFeatures]]: payloads never leave executor space). */
  def resized(df: DataFrame, idCol: String, binCol: String,
      targetBytes: Int): Dataset[(Long, Array[Byte])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, resizeStub(if (bytes == null) Array.empty[Byte] else bytes,
          targetBytes))
      })
  }

  /** Evenly sample up to `k` distinct fixed-size frames (chunks) from a
    * payload column — the video frame-sampling shape. Works on BinaryType
    * (frames of `frameSize` bytes) and StringType (frames of `frameSize`
    * chars): Spark's `length`/`substring` handle both. One row per
    * sampled frame: all original columns + (frame_idx, frame).
    *
    * Pure Column expressions (sequence → transform → explode → substring),
    * so the whole thing stays distributed and codegen-adjacent — no UDF,
    * no driver round-trip, no payload copy beyond the sampled frames. */
  def frameSample(df: DataFrame, payloadCol: String,
      frameSize: Int, k: Int): DataFrame =
    df.withColumn("__nf", expr(
        s"greatest((length($payloadCol) + ${frameSize - 1}) div $frameSize," +
          " CAST(1 AS BIGINT))"))
      .withColumn("frame_idx", explode(array_distinct(
        expr(s"transform(sequence(0, ${k - 1}), j -> (j * __nf) div $k)"))))
      .withColumn("frame", expr(
        s"substring($payloadCol, CAST(frame_idx * $frameSize + 1 AS INT), $frameSize)"))
      .drop("__nf")

  /** Deterministic synthetic media table for tests/demos: bytes derived
    * from the id so every engine can reproduce them. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val bytes = Array.tabulate[Byte](64 + i % 64)(j => ((i * 31 + j * 7) % 251).toByte)
      (i.toLong, "image", bytes, "image/fake")
    }.toDF("media_id", "media_type", "content", "mime")
  }
}
