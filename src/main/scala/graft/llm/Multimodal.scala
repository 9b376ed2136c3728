package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque BINARY column with typed metadata — the same shape as the
  * reference's TypeBytes typed blobs (reference:
  * src/ahghee.grpc/types.proto:17-20, `typeiri` + raw bytes).
  *
  *   media STRUCT<media_type: STRING, bytes: BINARY,
  *                meta: STRUCT<origin: STRING, n_bytes: LONG>>
  *
  * Decode / feature-extraction runs batched per partition through
  * `Dataset.mapPartitions` with case-class encoders (rows stay in
  * Tungsten format right up to the lambda — no df→rdd→df round-trip),
  * codec state initialized once per partition, iterator in / iterator
  * out so memory stays bounded.
  *
  * IMAGE decode is REAL: JDK ImageIO (PNG/BMP/GIF/JPEG readers ship
  * with the JVM — no new deps). VIDEO is REAL too, as motion-JPEG:
  * blobs are concatenated genuine JPEG frames, demuxed by SOI/EOI
  * marker scan and decoded/resized through ImageIO + Graphics2D in
  * sampleFrames (general-codec containers like MP4/H.264 would need a
  * demuxer dependency this build doesn't ship).
  */
object Multimodal {

  /** Typed output of the image decode: dimensions + mean luminance
    * (0-255; -1 dims flag an undecodable payload). */
  case class ImageFeat(doc_id: Long, width: Int, height: Int, mean_lum: Int)

  /** One sampled+resized frame: target dims + mean luminance of the
    * RESIZED pixels (the decode-side feature). */
  case class FrameRow(doc_id: Long, frame_idx: Int, width: Int, height: Int,
                      fhash: Int)

  /** REAL video corpus: one motion-JPEG blob per document — a
    * concatenation of genuine JPEG frames (quality 1.0 grayscale:
    * uniform frames round-trip bit-exact, verified for all 256 levels),
    * the same byte layout MJPEG-over-HTTP streams use. Frame count and
    * each frame's gray level derive from doc_id arithmetic so the
    * decode side stays oracle-checkable while every byte is a real
    * codec's output. At 100 TB the same struct wraps `binaryFile`
    * blobs; only this generator is synthetic. */
  def videoTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the single-row-group documents scan is one task — without this
    // barrier the whole generator runs single-threaded (the s13
    // exact-side lesson applied to the media tables; local wall time
    // is unchanged because the encode memoizes to ~12k distinct
    // frames, but a real corpus's decode would serialize on the scan
    // task, so the barrier is the structural default here)
    graft.Tables(spark, dir, "documents").select(col("doc_id"))
      .transform(graft.Part.pin(col("doc_id"))).as[Long]
      .mapPartitions { ids =>
        // one encoder per partition, reused across rows and frames; the
        // encoder is deterministic, so identical (lum, w, h) frames are
        // identical bytes — memoize them (≤ 256·8·6 distinct frames vs
        // ~30 per doc: ~12× fewer encodes, measured 13 s → ~2 s at sf0.1)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(1.0f)
        val memo = new java.util.HashMap[Long, Array[Byte]]()
        def frame(lum: Int, w0: Int, h0: Int): Array[Byte] = {
          val key = (lum.toLong << 16) | (w0.toLong << 8) | h0.toLong
          var bytes = memo.get(key)
          if (bytes == null) {
            val img = new java.awt.image.BufferedImage(
              w0, h0, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            var y = 0
            while (y < h0) {
              var x = 0
              while (x < w0) { img.getRaster.setSample(x, y, 0, lum); x += 1 }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
            writer.setOutput(ios)
            writer.write(null,
              new javax.imageio.IIOImage(img, null, null), param)
            ios.close()
            bytes = bos.toByteArray
            memo.put(key, bytes)
          }
          bytes
        }
        ids.map { id =>
          val nFrames = 25 + (id % 10).toInt
          val w0 = 12 + (id % 8).toInt * 2
          val h0 = 10 + (id % 6).toInt * 2
          val blob = new java.io.ByteArrayOutputStream()
          var f = 0
          while (f < nFrames) {
            blob.write(frame(((id * 31 + f * 17) % 256).toInt, w0, h0))
            f += 1
          }
          (id, blob.toByteArray)
        }
      }
      .toDF("doc_id", "bytes")
      .select(col("doc_id"), struct(
        lit("video/x-motion-jpeg").as("media_type"),
        col("bytes"),
        struct(lit("synthetic").as("origin"),
               length(col("bytes")).cast("long").as("n_bytes")).as("meta")
      ).as("media"))
  }

  /** REAL image corpus: one PNG per document, encoded with ImageIO in
    * the executors (dims and gray fill derived from doc_id, so the
    * decode side is oracle-checkable arithmetic while the bytes are
    * genuine PNG). At 100 TB the same struct wraps `binaryFile`-sourced
    * blobs; only this generator is synthetic. */
  def imageTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents").select(col("doc_id"))
      .transform(graft.Part.pin(col("doc_id"))).as[Long] // scan-task barrier (see videoTable)
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 8 + (id % 16).toInt
          val h = 8 + (id % 8).toInt
          val lum = (id % 256).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (lum << 16) | (lum << 8) | lum
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "bytes")
      .select(col("doc_id"), struct(
        lit("image/png").as("media_type"),
        col("bytes"),
        struct(lit("synthetic").as("origin"),
               length(col("bytes")).cast("long").as("n_bytes")).as("meta")
      ).as("media"))
  }

  /** Image + perceptual-hash output: doc id and the 60-bit dHash. */
  case class ImageHash(doc_id: Long, dhash: Long)

  /** REAL textured-image corpus for perceptual dedup (p50): one 9×8
    * PNG per document whose pixel luminance at (x, y) is hash
    * arithmetic on (doc_id, x, y) — pseudorandom texture, but the
    * oracle can recompute every pixel, so the decode→hash path is
    * gate-able. Each doc also gets a NEAR-DUP twin (id + 1M): the same
    * image with one pixel (4, 3) nudged +7 mod 256 — the planted
    * positive a perceptual dedup must catch and an exact byte/pixel
    * dedup (p01) cannot. At 100 TB the generator is replaced by
    * `binaryFile` blobs; only the corpus is synthetic, the codec path
    * is the production one. */
  def texturedImageTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // two multiply-mod rounds with xor-shifts between (the q48 lesson:
    // a single linear map over sequential doc ids correlates textures
    // across docs — measured 17k chance pairs at the Hamming gate;
    // the finalizer leaves exactly the planted twins)
    def lum(d: Long, x: Int, y: Int): Int = {
      val v = (d * 2654435761L + (y * 9 + x) * 104729L) % 1000000007L
      val v2 = ((v ^ (v >> 13)) * 1779033703L) % 1000000007L
      ((v2 ^ (v2 >> 11)) % 256L).toInt
    }
    graft.Tables(spark, dir, "documents").select(col("doc_id"))
      .transform(graft.Part.pin(col("doc_id"))).as[Long] // scan-task barrier (see videoTable)
      .flatMap(id => Seq(id, id + 1000000L))
      .mapPartitions { ids =>
        ids.map { id =>
          val base = if (id >= 1000000L) id - 1000000L else id
          val img = new java.awt.image.BufferedImage(
            9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 9) {
              var l = lum(base, x, y)
              if (id >= 1000000L && x == 4 && y == 3) l = (l + 7) % 256
              img.setRGB(x, y, (l << 16) | (l << 8) | l)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "bytes")
      .select(col("doc_id"), struct(
        lit("image/png").as("media_type"),
        col("bytes"),
        struct(lit("synthetic").as("origin"),
               length(col("bytes")).cast("long").as("n_bytes")).as("meta")
      ).as("media"))
  }

  /** REAL perceptual hash (dHash): decode the bytes with ImageIO, then
    * bit b = y·8+x of the hash is lum(x+1, y) > lum(x, y) over the
    * 9×8 grid — the standard difference-hash, restricted to the 60
    * low bits so the key stays addressable as a signed 64-bit long in
    * both engines (bits 60-63 would push Σ2^b past BIGINT). Images
    * larger than 9×8 would first go through p15's resize stage; this
    * operator takes the grid as given. */
  def dHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media.bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (img == null || img.getWidth < 9 || img.getHeight < 8)
            ImageHash(id, -1L)
          else {
            def lum(x: Int, y: Int): Int = {
              val p = img.getRGB(x, y)
              (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
            }
            var h = 0L
            var b = 0
            while (b < 60) {
              val x = b % 8
              val y = b / 8
              if (lum(x + 1, y) > lum(x, y)) h |= 1L << b
              b += 1
            }
            ImageHash(id, h)
          }
        }
      }
      .toDF()
  }

  /** REAL batched image decode: ImageIO parses the actual PNG/BMP/JPEG
    * bytes; mean luminance averages every pixel's (r+g+b)/3. Undecodable
    * payloads yield (-1, -1, -1) rather than failing the batch. */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media.bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // ImageIO reader instances are created per call; per-partition
        // init would hold an ImageReader + stream here
        rows.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) ImageFeat(id, -1, -1, -1)
            else {
              val w = img.getWidth
              val h = img.getHeight
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                  x += 1
                }
                y += 1
              }
              ImageFeat(id, w, h, (sum / (3L * w * h)).toInt)
            }
          } catch { case _: Exception => ImageFeat(id, -1, -1, -1) }
        }
      }
      .toDF()
  }

  /** Typed output of the audio decode: container-header facts + exact
    * peak amplitude over the PCM samples. */
  case class AudioFeat(doc_id: Long, sample_rate: Int, channels: Int,
                       n_samples: Long, peak: Int)

  /** REAL audio corpus: one PCM-16 WAV per document, written with the
    * JDK's javax.sound.sampled (header + samples derived from doc_id so
    * the decode side is oracle-checkable arithmetic while the bytes are
    * a genuine RIFF/WAVE container). Square wave ⇒ every sample is
    * ±amplitude exactly — no float rounding in the oracle. */
  /** Audio note: the image/video generators pin their barrier's
    * partition count (graft.Part.pin) so the codec work parallelizes,
    * but the audio paths deliberately DON'T — javax.sound's
    * AudioSystem entry points (write / getAudioInputStream) take a
    * JVM-global provider-registry lock per call, so 32 concurrent
    * tasks convoy on it: measured at sf0.1, the pinned-wide audio
    * stage burned ~100 task-seconds of lock wait against ~1.3 s of
    * actual work. A plain keyed repartition (AQE-sized) keeps the
    * barrier's correctness role and lets the tiny stage stay narrow. */
  def audioTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents").select(col("doc_id"))
      .repartition(col("doc_id")).as[Long] // scan-task barrier; see audio note above
      .mapPartitions { ids =>
        ids.map { id =>
          val n = 400 + (id % 100).toInt
          val amp = (1000 + id % 1000).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = if ((i / 8) % 2 == 0) amp else -amp
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "bytes")
      .select(col("doc_id"), struct(
        lit("audio/wav").as("media_type"),
        col("bytes"),
        struct(lit("synthetic").as("origin"),
               length(col("bytes")).cast("long").as("n_bytes")).as("meta")
      ).as("media"))
  }

  /** REAL batched audio decode: AudioSystem parses the WAV container
    * (format, frame count), then the PCM samples stream through for the
    * exact peak. Undecodable payloads yield (-1, -1, -1, -1). */
  def decodeAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media.bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val n = ais.getFrameLength
            val data = ais.readAllBytes()
            var peak = 0
            var i = 0
            while (i + 1 < data.length) {
              val v = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toInt
              val a = math.abs(v)
              if (a > peak) peak = a
              i += 2
            }
            AudioFeat(id, fmt.getSampleRate.toInt, fmt.getChannels, n, peak)
          } catch { case _: Exception => AudioFeat(id, -1, -1, -1L, -1) }
        }
      }
      .toDF()
  }

  /** Typed output of the audio perceptual hash. */
  case class AudioHash(doc_id: Long, ahash: Long)

  /** Textured audio corpus for perceptual dedup (the audio analog of
    * [[texturedImageTable]]): one 256-sample PCM-16 WAV per document
    * whose samples are the same two-round multiply-mod/xor-shift
    * finalizer over (doc_id, t), mapped to [-100, 100], plus a twin
    * (doc_id + 1e6) with ONE sample (t = 31) nudged +7 — byte-exact
    * dedup misses it, a frame-energy fingerprint must catch it. The
    * nudge lands inside frame 3 only, so at most the two comparison
    * bits touching E(3) can flip: twins sit at Hamming ≤ 2 BY
    * CONSTRUCTION, which the p52 chunk blocking always recalls. At
    * 100 TB the generator is replaced by `binaryFile` blobs; the WAV
    * container and codec path are the production ones. */
  def texturedAudioTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def sample(d: Long, t: Int): Int = {
      val v = (d * 2654435761L + t * 104729L) % 1000000007L
      val v2 = ((v ^ (v >> 13)) * 1779033703L) % 1000000007L
      ((v2 ^ (v2 >> 11)) % 201L).toInt - 100
    }
    graft.Tables(spark, dir, "documents").select(col("doc_id"))
      .repartition(col("doc_id")).as[Long] // scan-task barrier; see audio note above
      .flatMap(id => Seq(id, id + 1000000L))
      .mapPartitions { ids =>
        ids.map { id =>
          val base = if (id >= 1000000L) id - 1000000L else id
          val n = 256
          val pcm = new Array[Byte](n * 2)
          var t = 0
          while (t < n) {
            var s = sample(base, t)
            if (id >= 1000000L && t == 31) s += 7
            pcm(2 * t) = (s & 0xff).toByte
            pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
            t += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "bytes")
      .select(col("doc_id"), struct(
        lit("audio/wav").as("media_type"),
        col("bytes"),
        struct(lit("synthetic").as("origin"),
               length(col("bytes")).cast("long").as("n_bytes")).as("meta")
      ).as("media"))
  }

  /** REAL audio perceptual hash (frame-energy difference hash, the
    * dHash idea on a spectrogram's time axis): AudioSystem decodes the
    * WAV container, the PCM stream folds into 32 frames of 8 samples,
    * E(f) = Σ s² per frame (exact integer — samples are integers), and
    * bit b of the hash is E(b+1) > E(b) for b < 31 (31 bits keeps
    * Σ2^b addressable as BIGINT in both engines, the dHash 60-bit
    * lesson). Robust to small sample perturbations by design; an
    * undecodable or wrong-length payload yields -1. */
  def audioEnergyHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media.bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val data = ais.readAllBytes()
            if (data.length != 512) AudioHash(id, -1L)
            else {
              val e = new Array[Long](32)
              var t = 0
              while (t < 256) {
                val s = ((data(2 * t) & 0xff) | (data(2 * t + 1) << 8))
                  .toShort.toLong
                e(t / 8) += s * s
                t += 1
              }
              var h = 0L
              var b = 0
              while (b < 31) {
                if (e(b + 1) > e(b)) h |= 1L << b
                b += 1
              }
              AudioHash(id, h)
            }
          } catch { case _: Exception => AudioHash(id, -1L) }
        }
      }
      .toDF()
  }

  /** REAL frame sampling + resize, the generator-shaped multimodal op:
    * demux the motion-JPEG blob by scanning SOI (FFD8) / EOI (FFD9)
    * markers — valid inside entropy-coded data FF is stuffed as FF00 and
    * restart markers are FFD0-D7, so FFD9 delimits frames — then decode
    * every `every`-th frame with ImageIO, scale it to w×h through a real
    * Graphics2D drawImage, and emit the resized frame's mean luminance.
    * Only sampled frames are decoded (the demux scan is offsets-only);
    * memory stays bounded at one frame. A payload with no JPEG frames
    * yields one (-1, w, h, -1) flag row rather than failing the batch. */
  def sampleFrames(media: DataFrame, every: Int, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media.bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          // demux: frame k spans [starts(k), ends(k))
          val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
          val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
          var i = 0
          var start = -1
          while (i + 1 < bytes.length) {
            val a = bytes(i) & 0xff
            val b = bytes(i + 1) & 0xff
            if (start < 0 && a == 0xFF && b == 0xD8) { start = i; i += 2 }
            else if (start >= 0 && a == 0xFF && b == 0xD9) {
              starts += start; ends += (i + 2); start = -1; i += 2
            } else i += 1
          }
          if (starts.isEmpty) Iterator.single(FrameRow(id, -1, w, h, -1))
          else (0 until starts.length by every).iterator.map { f =>
            try {
              val src = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(
                  bytes, starts(f), ends(f) - starts(f)))
              val dst = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val g = dst.createGraphics()
              g.drawImage(src, 0, 0, w, h, null)
              g.dispose()
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  sum += dst.getRaster.getSample(x, y, 0); x += 1
                }
                y += 1
              }
              FrameRow(id, f, w, h, (sum / (w.toLong * h)).toInt)
            } catch { case _: Exception => FrameRow(id, f, w, h, -1) }
          }
        }
      }
      .toDF()
  }

  /** Per-frame textured luminance for [[videoSigTable]]: the same
    * two-round multiply-mod/xor-shift finalizer as texturedImageTable,
    * over (doc_id, frame_idx) — decorrelated across docs AND frames, so
    * prefix signatures collide only by 1e9+7-birthday chance, never by
    * structure (the q48/p50 lesson: linear maps over sequential ids
    * correlate). Mirrored verbatim in the p55 oracle SQL. */
  private[graft] def sigLum(d: Long, f: Int): Int = {
    val v = (d * 2654435761L + f * 104729L) % 1000000007L
    val v2 = ((v ^ (v >> 13)) * 1779033703L) % 1000000007L
    (((v2 ^ (v2 >> 11)) % 256L).toInt)
  }

  /** Motion-JPEG corpus for video-signature dedup (p55): every doc gets
    * 21 + d%5 uniform-gray frames with TEXTURED per-frame luminance
    * ([[sigLum]]), and every 100th doc gets a NEAR-DUP twin (id + 1M):
    * the same video with 3 extra tail frames — a re-encoded cut with a
    * trailing credits/outro segment, the canonical video near-dup case.
    * Byte-exact dedup (p01) misses the twin (the blob differs); a
    * prefix keyframe signature must catch it. Frames are genuine JPEG
    * (quality 1.0 grayscale — uniform frames round-trip bit-exact, the
    * videoTable guarantee), so the oracle can recompute every sampled
    * frame hash arithmetically while the engine runs the production
    * encode→demux→decode→resize path. */
  def videoSigTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .flatMap(id => if (id % 100 == 0) Seq(id, id + 1000000L) else Seq(id))
      .mapPartitions { ids =>
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(1.0f)
        val memo = new java.util.HashMap[Int, Array[Byte]]()
        def frame(lum: Int): Array[Byte] = {
          var bytes = memo.get(lum)
          if (bytes == null) {
            val img = new java.awt.image.BufferedImage(
              16, 12, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            var y = 0
            while (y < 12) {
              var x = 0
              while (x < 16) { img.getRaster.setSample(x, y, 0, lum); x += 1 }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
            writer.setOutput(ios)
            writer.write(null,
              new javax.imageio.IIOImage(img, null, null), param)
            ios.close()
            bytes = bos.toByteArray
            memo.put(lum, bytes)
          }
          bytes
        }
        ids.map { id =>
          val base = if (id >= 1000000L) id - 1000000L else id
          val nFrames = 21 + (base % 5).toInt +
            (if (id >= 1000000L) 3 else 0)
          val blob = new java.io.ByteArrayOutputStream()
          var f = 0
          while (f < nFrames) { blob.write(frame(sigLum(base, f))); f += 1 }
          (id, blob.toByteArray)
        }
      }
      .toDF("doc_id", "bytes")
      .select(col("doc_id"), struct(
        lit("video/x-motion-jpeg").as("media_type"),
        col("bytes"),
        struct(lit("synthetic").as("origin"),
               length(col("bytes")).cast("long").as("n_bytes")).as("meta")
      ).as("media"))
  }
}
