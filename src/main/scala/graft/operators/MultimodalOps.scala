package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media payload as it would arrive from a lakehouse scan: opaque bytes
  * plus typed metadata. At 100 TB the `bytes` column dominates I/O, so
  * every transform here keeps metadata-only paths separate from
  * payload-touching paths (column pruning drops `bytes` entirely for
  * metadata queries). */
final case class MediaRecord(
    doc_id: Long,
    media_type: String, // "image" | "audio" | "video"
    bytes: Array[Byte],
    source: String)

/** Decoded features. In production the decoder is a native library; this
  * container has none, so `decode` below is a clearly-marked deterministic
  * STUB — the Spark-side plumbing (schema, batching, partitioning, typed
  * Dataset shape) is the real deliverable and is exactly what a JNI/FFI
  * decoder would plug into. */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    content_hash: String,
    width: Int,     // stub: derived from n_bytes
    height: Int,    // stub: derived from n_bytes
    n_frames: Int,  // stub: frame-sample count
    channels: Int)  // stub

object MultimodalOps {

  /** STUB decode — deterministic arithmetic on the payload size standing in
    * for a real image/audio decoder (none available in this container).
    * Mirrors 1:1 into the DuckDB oracle. A real deployment swaps ONLY the
    * body of this function for the native decode; the mapPartitions batch
    * shape (one decoder init per partition, streamed records) stays. */
  def decodeStub(r: MediaRecord, contentHash: String): MediaFeatures = {
    val n = r.bytes.length.toLong
    MediaFeatures(
      doc_id = r.doc_id,
      media_type = r.media_type,
      n_bytes = n,
      content_hash = contentHash,
      width = (64 + n % 577).toInt,
      height = (48 + (n * 31) % 433).toInt,
      n_frames = (1 + n % 30).toInt,
      channels = if (r.media_type == "audio") 2 else 3)
  }

  /** Build the typed media Dataset from `documents` (the container has no
    * real media files; text bytes stand in as the opaque payload). The
    * repartition on doc_id models the decode stage's partitioning: payload
    * work spreads evenly regardless of upstream file layout. */
  def mediaFrom(documents: DataFrame, partitions: Int): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(
        col("doc_id"),
        // deterministic media_type from doc_id: image/audio/video round-robin
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("bytes"),
        col("source"))
      .repartition(partitions, col("doc_id"))
      .as[MediaRecord]
  }

  /** STUB resize — deterministic target-fit arithmetic standing in for a
    * real scaler. Preserves aspect via integer math (floor), mirrored 1:1
    * in the oracle. */
  def resizeStub(f: MediaFeatures, maxW: Int, maxH: Int): MediaFeatures = {
    // scale = min(maxW/w, maxH/h) capped at 1, in 1/1000ths (integer math
    // keeps both engines bit-identical)
    val scaleMilli = math.min(
      1000L, math.min(maxW * 1000L / f.width, maxH * 1000L / f.height))
    f.copy(
      width = (f.width * scaleMilli / 1000L).toInt,
      height = (f.height * scaleMilli / 1000L).toInt)
  }

  /** Resize stage over decoded features (same typed mapPartitions shape
    * as decodeAll — a real implementation transforms the payload too). */
  def resizeAll(features: Dataset[MediaFeatures], maxW: Int, maxH: Int)
      : Dataset[MediaFeatures] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.mapPartitions(_.map(resizeStub(_, maxW, maxH)))
  }

  // ---------------------------------------------------------------------
  // REAL decoder: PPM (P6) — a genuine binary image format that needs no
  // native library, so the decode stage is an actual byte-level parse
  // (magic, whitespace/comment-tolerant header, dimension extraction,
  // pixel traversal), not arithmetic on the payload size. The stub above
  // remains only for codecs that require native libs (JPEG/PNG/audio).

  /** Decoded PPM image features. `mean_milli` is the mean pixel value in
    * 1/1000ths computed with integer math only — bit-identical across
    * engines, no FP aggregation. */
  final case class PpmFeatures(
      doc_id: Long, width: Int, height: Int, n_pix: Long, mean_milli: Long)

  /** Serialize a P6 image whose pixel k is `(docId * 31 + k) % 256` — a
    * deterministic payload the oracle can mirror in closed form while the
    * Spark side round-trips REAL bytes through a REAL parser. */
  def encodePpm(docId: Long, w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h * 3)
    var k = 0
    while (k < px.length) {
      px(k) = ((docId * 31 + k) % 256).toByte
      k += 1
    }
    header ++ px
  }

  /** Parse a P6 payload: magic check, whitespace/`#`-comment-tolerant
    * header ints (width, height, maxval), then one pass over the pixel
    * bytes. Throws on malformed input — a decode stage must fail loudly,
    * not emit plausible garbage. */
  def decodePpm(docId: Long, bytes: Array[Byte]): PpmFeatures = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      s"not a P6 PPM payload (doc $docId)")
    var pos = 2
    def headerInt(): Int = {
      // skip whitespace and '#'-to-EOL comments between header fields
      var inComment = false
      while (pos < bytes.length &&
          (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') inComment = true
        else if (bytes(pos) == '\n') inComment = false
        pos += 1
      }
      var v = 0
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        pos += 1
      }
      require(pos > start, s"malformed PPM header (doc $docId)")
      v
    }
    val w = headerInt(); val h = headerInt(); val maxval = headerInt()
    require(w >= 1 && h >= 1, s"degenerate dimensions ${w}x$h (doc $docId)")
    require(maxval == 255, s"unsupported maxval $maxval (doc $docId)")
    pos += 1 // the single whitespace byte after maxval
    // Long math: a corrupt header like "37838 37838" would overflow
    // w*h*3 as Int and pass a wrapped length check
    val n = w.toLong * h * 3
    require(bytes.length.toLong - pos == n,
      s"pixel payload ${bytes.length - pos} != $n (doc $docId)")
    var sum = 0L
    var k = pos
    while (k < bytes.length) { sum += bytes(k) & 0xff; k += 1 }
    PpmFeatures(docId, w, h, w.toLong * h, sum * 1000L / n)
  }

  // ---------------------------------------------------------------------
  // REAL decoder #2: WAV (RIFF/PCM16) — the audio sibling of the PPM
  // parser: chunked container traversal (RIFF header, fmt/data chunks,
  // skipping unknown chunks), little-endian field decoding, and a single
  // pass over 16-bit samples. Pure JVM, no native codec.

  /** Decoded WAV features. `mean_abs_milli` is the mean |sample| in
    * 1/1000ths by integer math — engine-exact, no FP aggregation. */
  final case class WavFeatures(
      doc_id: Long, channels: Int, sample_rate: Int,
      n_frames: Long, mean_abs_milli: Long)

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  /** Serialize a PCM16 WAV whose sample k (interleaved) is
    * `(docId * 37 + k * 11) % 2001 - 1000` — closed-form for the oracle,
    * real RIFF bytes for the parser. */
  def encodeWav(docId: Long, channels: Int, sampleRate: Int,
      frames: Int): Array[Byte] = {
    val n = frames * channels
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16.toShort)              // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var k = 0
    while (k < n) {
      buf.putShort(((docId * 37 + k * 11) % 2001 - 1000).toShort)
      k += 1
    }
    buf.array()
  }

  /** Parse a RIFF/WAVE payload: container magic, fmt chunk (PCM16 only),
    * unknown chunks skipped by their declared length, then one pass over
    * the data chunk's 16-bit little-endian samples. Fails loudly on
    * malformed input, like decodePpm. */
  def decodeWav(docId: Long, bytes: Array[Byte]): WavFeatures = {
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      s"not a RIFF/WAVE payload (doc $docId)")
    var pos = 12
    var channels = -1; var sampleRate = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (channels < 0 || dataOff < 0)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = le32(bytes, pos + 4)
      // Long math: a corrupt length near Int.MaxValue would wrap the
      // bound check (same overflow class as decodePpm's dims)
      require(len >= 0 && pos.toLong + 8 + len <= bytes.length,
        s"chunk '$id' overruns payload (doc $docId)")
      id match {
        case "fmt " =>
          // a declared fmt length < 16 would make the field reads below
          // alias the NEXT chunk's bytes — silent misparse, not loud
          require(len >= 16, s"fmt chunk too short ($len) (doc $docId)")
          require(le16(bytes, pos + 8) == 1 && le16(bytes, pos + 22) == 16,
            s"only PCM16 supported (doc $docId)")
          channels = le16(bytes, pos + 10)
          sampleRate = le32(bytes, pos + 12)
          require(channels >= 1 && sampleRate >= 1,
            s"degenerate fmt ${channels}ch @${sampleRate}Hz (doc $docId)")
        case "data" => dataOff = pos + 8; dataLen = len
        case _ => // unknown chunk: skip by declared length
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(channels > 0 && dataOff >= 0,
      s"missing fmt/data chunk (doc $docId)")
    require(dataLen % (channels * 2) == 0,
      s"data length $dataLen not frame-aligned (doc $docId)")
    val n = dataLen / 2
    var sum = 0L
    var k = 0
    while (k < n) {
      val s = le16(bytes, dataOff + 2 * k).toShort.toInt
      sum += math.abs(s)
      k += 1
    }
    WavFeatures(docId, channels, sampleRate, n.toLong / channels,
      if (n == 0) 0L else sum * 1000L / n)
  }

  // ---------------------------------------------------------------------
  // REAL decoder #3: GIF (87a/89a) with a hand-written LZW codec — the
  // ENTROPY-CODED tier the PPM/WAV parsers don't exercise: variable-width
  // codes (9→12 bits), LSB-first bit packing, a dictionary that grows per
  // emitted phrase with CLEAR/EOI control codes, and data sub-block
  // reassembly. Pure JVM; spec fidelity is cross-checked in
  // OperatorUnitSpec by decoding this encoder's output with the JDK's own
  // independent ImageIO GIF reader.

  /** Decoded GIF features. `mean_idx_milli` is the mean decoded palette
    * INDEX in 1/1000ths (integer math — engine-exact); `first_rgb` is the
    * first pixel's palette color packed r*65536+g*256+b, proving the
    * color-table parse on top of the LZW index stream. */
  final case class GifFeatures(
      doc_id: Long, width: Int, height: Int, n_pix: Long,
      mean_idx_milli: Long, first_rgb: Long)

  /** Deterministic 256-entry palette: entry i = (i, 7i%256, 13i%256). */
  private def gifPaletteBytes: Array[Byte] = {
    val p = new Array[Byte](256 * 3)
    var i = 0
    while (i < 256) {
      p(3 * i) = i.toByte
      p(3 * i + 1) = ((i * 7) % 256).toByte
      p(3 * i + 2) = ((i * 13) % 256).toByte
      i += 1
    }
    p
  }

  private final val GIF_CLEAR = 256
  private final val GIF_EOI = 257

  /** GIF-variant LZW compress (minCodeSize=8): codes start at 9 bits and
    * widen when the just-added dictionary value reaches 1<<width; at 4096
    * entries a CLEAR is emitted and the dictionary resets (no deferred
    * clear). LSB-first bit packing per the spec. */
  private[operators] def lzwEncode(indices: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var width = 9
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = GIF_EOI + 1
    emit(GIF_CLEAR)
    var cur = indices(0)
    var k = 1
    while (k < indices.length) {
      val s = indices(k)
      val key = Integer.valueOf((cur << 8) | s)
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        if (nextCode < 4096) {
          dict.put(key, Integer.valueOf(nextCode))
          // non-early-change widening: the value just assigned is the
          // largest a FUTURE emission can carry; widen the moment it
          // no longer fits the current width
          if (nextCode == (1 << width) && width < 12) width += 1
          nextCode += 1
        } else {
          emit(GIF_CLEAR)
          dict.clear(); nextCode = GIF_EOI + 1; width = 9
        }
        cur = s
      }
      k += 1
    }
    emit(cur)
    emit(GIF_EOI)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-variant LZW decompress; exact mirror of lzwEncode's widening
    * rule one step later (the decoder's dictionary trails the encoder's
    * by one entry), including the KwKwK (code == nextCode) case. Fails
    * loudly on out-of-range codes or a missing EOI. */
  private[operators] def lzwDecode(data: Array[Byte], expected: Int,
      docId: Long): Array[Int] = {
    val out = new Array[Int](expected)
    var n = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val stack = new Array[Int](4097)
    var width = 9
    var nextCode = GIF_EOI + 1
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    var prev = -1
    var done = false
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= GIF_EOI + 1) c = prefix(c)
      c
    }
    while (!done) {
      while (bitCnt < width && pos < data.length) {
        bitBuf |= (data(pos) & 0xffL) << bitCnt; bitCnt += 8; pos += 1
      }
      require(bitCnt >= width, s"LZW stream truncated before EOI (doc $docId)")
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      if (code == GIF_CLEAR) {
        nextCode = GIF_EOI + 1; width = 9; prev = -1
      } else if (code == GIF_EOI) {
        done = true
      } else if (prev == -1) {
        require(code < 256, s"first code after clear not a literal (doc $docId)")
        require(n < expected, s"LZW output overruns ${expected}px (doc $docId)")
        out(n) = code; n += 1
        prev = code
      } else {
        require(code <= nextCode && code < 4096,
          s"LZW code $code out of range (next=$nextCode, doc $docId)")
        // KwKwK: the code being defined right now — string(prev)+first
        val seed = if (code == nextCode) prev else code
        var top = 0
        var c = seed
        while (c >= GIF_EOI + 1) { stack(top) = suffix(c); top += 1; c = prefix(c) }
        stack(top) = c; top += 1
        val extra = if (code == nextCode) 1 else 0
        require(n + top + extra <= expected,
          s"LZW output overruns ${expected}px (doc $docId)")
        while (top > 0) { top -= 1; out(n) = stack(top); n += 1 }
        if (code == nextCode) { out(n) = firstOf(prev); n += 1 }
        if (nextCode < 4096) {
          prefix(nextCode) = prev
          suffix(nextCode) = firstOf(code) // KwKwK: prefix(nextCode)=prev is already set, so this walks to firstOf(prev)
          nextCode += 1
          // the decoder's dictionary trails the encoder's by one entry,
          // so it widens one assignment LATER: when nextCode (the value
          // the encoder has already assigned) reaches the width limit
          if (nextCode == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    require(n == expected, s"decoded $n px, expected $expected (doc $docId)")
    out
  }

  /** Serialize a real GIF89a whose pixel k is palette index
    * `(docId * 31 + k) % 256` — closed-form for the oracle, genuinely
    * entropy-coded bytes (global color table, image descriptor, LZW data
    * sub-blocks, trailer) for the parser. */
  def encodeGif(docId: Long, w: Int, h: Int): Array[Byte] = {
    val idx = new Array[Int](w * h)
    var k = 0
    while (k < idx.length) { idx(k) = ((docId * 31 + k) % 256).toInt; k += 1 }
    encodeGifIndices(w, h, idx)
  }

  private[graft] def encodeGifIndices(w: Int, h: Int,
      idx: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xF7) // GCT present, 8-bit color resolution, 256-entry table
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    out.write(gifPaletteBytes)
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0)    // no local color table, not interlaced
    out.write(8)    // LZW minimum code size
    val lzw = lzwEncode(idx)
    var off = 0
    while (off < lzw.length) {
      val blk = math.min(255, lzw.length - off)
      out.write(blk)
      out.write(lzw, off, blk)
      off += blk
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Parse a real GIF payload: signature, logical screen descriptor,
    * global color table, extension blocks skipped by declared length,
    * image descriptor, then the LZW-compressed index stream reassembled
    * from its data sub-blocks and entropy-decoded. Fails loudly on
    * malformed input (like decodePpm/decodeWav) — interlace and local
    * color tables are out of scope and rejected, not misparsed. */
  def decodeGif(docId: Long, bytes: Array[Byte]): GifFeatures = {
    require(bytes.length >= 13 &&
      new String(bytes, 0, 4, "US-ASCII") == "GIF8" &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a',
      s"not a GIF87a/89a payload (doc $docId)")
    def le16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    val packed = bytes(10) & 0xff
    require((packed & 0x80) != 0, s"missing global color table (doc $docId)")
    val gctSize = 2 << (packed & 0x07)
    var pos = 13
    val palette = new Array[Int](gctSize)
    var i = 0
    while (i < gctSize) {
      palette(i) = ((bytes(pos) & 0xff) << 16) |
        ((bytes(pos + 1) & 0xff) << 8) | (bytes(pos + 2) & 0xff)
      pos += 3; i += 1
    }
    // skip extension blocks (0x21 label, then length-prefixed sub-blocks)
    while (pos < bytes.length && (bytes(pos) & 0xff) == 0x21) {
      pos += 2 // introducer + label
      while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
      pos += 1
    }
    require(pos < bytes.length && (bytes(pos) & 0xff) == 0x2C,
      s"missing image descriptor (doc $docId)")
    val w = le16(pos + 5); val h = le16(pos + 7)
    val idPacked = bytes(pos + 9) & 0xff
    require((idPacked & 0x80) == 0, s"local color table unsupported (doc $docId)")
    require((idPacked & 0x40) == 0, s"interlaced GIF unsupported (doc $docId)")
    require(w >= 1 && h >= 1, s"degenerate dimensions ${w}x$h (doc $docId)")
    pos += 10
    val minCodeSize = bytes(pos) & 0xff
    require(minCodeSize == 8, s"unsupported LZW min code size $minCodeSize (doc $docId)")
    pos += 1
    // reassemble the LZW stream from its data sub-blocks
    val lzw = new java.io.ByteArrayOutputStream()
    var blk = bytes(pos) & 0xff
    while (blk != 0) {
      require(pos + 1 + blk <= bytes.length,
        s"data sub-block overruns payload (doc $docId)")
      lzw.write(bytes, pos + 1, blk)
      pos += 1 + blk
      blk = bytes(pos) & 0xff
    }
    val idx = lzwDecode(lzw.toByteArray, w * h, docId)
    var sum = 0L
    var k = 0
    while (k < idx.length) { sum += idx(k); k += 1 }
    GifFeatures(docId, w, h, w.toLong * h,
      sum * 1000L / (w.toLong * h), palette(idx(0)).toLong)
  }

  /** Decode stage: mapPartitions so a real decoder would init once per
    * partition (codec contexts, GPU handles) and stream records through —
    * the MessageDigest here stands in for that per-partition init. */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real decoder: init native context here, once per partition
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val hash = md.digest(r.bytes).map("%02x".format(_)).mkString
        decodeStub(r, hash)
      }
    }
  }
}
