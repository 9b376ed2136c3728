package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Real-codec multimodal paths: the production blob source
  * (`binaryFile`) feeds the ImageIO decoder end-to-end, and the WAV
  * decoder flags undecodable payloads instead of failing the batch.
  */
class MultimodalSpec extends SparkSpec {

  test("binaryFile source → media struct → real ImageIO decode") {
    // write two real PNGs to disk, ingest through the binaryFile source
    // (the 100 TB blob path), wrap in the media struct, decode
    val dir = java.nio.file.Files.createTempDirectory("graft_imgs")
    Seq((3, 5, 40), (7, 2, 200)).zipWithIndex.foreach {
      case ((w, h, lum), i) =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (lum << 16) | (lum << 8) | lum
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
        javax.imageio.ImageIO.write(img, "png",
          dir.resolve(s"img_$i.png").toFile)
    }
    val media = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(dir.toString)
      .select(
        xxhash64(col("path")).as("doc_id"),
        struct(lit("image/png").as("media_type"), col("content").as("bytes"),
          struct(col("path").as("origin"),
            col("length").as("n_bytes")).as("meta")).as("media"))
    val feats = Multimodal.decodeImages(media)
      .select("width", "height", "mean_lum").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(feats == Set((3, 5, 40), (7, 2, 200)))
  }

  test("motion-JPEG demux + decode + resize recovers the planted luminance") {
    val media = Multimodal.videoTable(spark, sfDir)
    val frames = Multimodal.sampleFrames(media, every = 10, w = 64, h = 64)
    // the measured mean luminance of every decoded+resized frame must
    // equal the planted gray level — gates encode, demux, decode AND
    // resize arithmetic (uniform gray at q=1.0 round-trips bit-exact)
    val bad = frames.where(col("fhash") =!=
      (col("doc_id") * 31 + col("frame_idx") * 17) % 256).count()
    assert(bad == 0, s"$bad frames decoded to a wrong luminance")
    assert(frames.where(col("width") =!= 64 || col("height") =!= 64)
      .count() == 0)

    // every=1 walks EVERY demuxed frame: per-doc counts must equal the
    // planted 25 + doc_id % 10 — no frame lost or invented by the scan
    val counts = Multimodal.sampleFrames(media.limit(5), 1, 16, 16)
      .groupBy("doc_id").count()
      .where(col("count") =!= lit(25) + col("doc_id") % 10)
      .count()
    assert(counts == 0, "demux lost or invented frames")
  }

  test("payload with no JPEG frames yields a flag row, not a failure") {
    import spark.implicits._
    val junkVideo = Seq((9L, "no frames here".getBytes("UTF-8")))
      .toDF("doc_id", "bytes")
      .select(col("doc_id"), struct(
        lit("video/x-motion-jpeg").as("media_type"), col("bytes"),
        struct(lit("x").as("origin"), lit(1L).as("n_bytes")).as("meta"))
        .as("media"))
    val row = Multimodal.sampleFrames(junkVideo, 10, 64, 64).collect()
    assert(row.length == 1 && row.head.getInt(1) == -1 &&
      row.head.getInt(4) == -1)
  }

  test("undecodable payloads flag (-1) instead of failing the batch") {
    import spark.implicits._
    val junk = Seq((1L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "bytes")
      .select(col("doc_id"), struct(lit("image/?").as("media_type"),
        col("bytes"),
        struct(lit("x").as("origin"), lit(1L).as("n_bytes")).as("meta"))
        .as("media"))
    val img = Multimodal.decodeImages(junk).collect().head
    assert(img.getInt(1) == -1 && img.getInt(3) == -1)
    val wav = Multimodal.decodeAudio(junk).collect().head
    assert(wav.getInt(1) == -1 && wav.getInt(4) == -1)
  }

  test("p50 perceptual dedup: exactly the planted twins, invisible to exact dedup") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("p50_image_phash_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = graft.Tables(spark, sfDir, "documents")
      .select("doc_id").as[Long].collect()
    // every planted (id, id+1M) pair recovered, nothing else — the
    // textured generator's finalizer leaves no chance collisions
    assert(out.toSet == ids.map(i => (i, i + 1000000L)).toSet,
      s"${out.length} pairs vs ${ids.length} twins")
    // the twin is a NEAR-dup: its PNG bytes differ (one perturbed
    // pixel), so a byte-exact dedup (the p01 shape) finds zero pairs —
    // the gap perceptual hashing exists to close
    val tbl = Multimodal.texturedImageTable(spark, sfDir)
      .select(col("doc_id"), md5(col("media.bytes")).as("m"))
    val exactPairs = tbl.groupBy("m").agg(count(lit(1)).as("n"))
      .where(col("n") >= 2).count()
    assert(exactPairs == 0L, s"$exactPairs byte-identical groups")
  }

  test("p52 audio dedup: every planted twin within Hamming 2, bytes differ") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("p52_audio_fp_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = graft.Tables(spark, sfDir, "documents")
      .select("doc_id").as[Long].collect()
    // the +7 nudge only perturbs frame 3's energy, so at most the two
    // comparison bits around it flip — every twin pair MUST be emitted
    // (recall is structural, not probabilistic)
    val twins = ids.map(i => (i, i + 1000000L)).toSet
    assert(twins.subsetOf(out.toSet),
      s"missing twins: ${(twins -- out.toSet).take(3)}")
    // decode really happened: every signature is a valid 31-bit hash
    // (an undecodable WAV flags -1)
    val sigs = Multimodal.audioEnergyHash(
      Multimodal.texturedAudioTable(spark, sfDir))
    assert(sigs.where(col("ahash") < 0).count() == 0L)
    // and the twins are NEAR-dups, not byte dups: exact dedup finds none
    val tbl = Multimodal.texturedAudioTable(spark, sfDir)
      .select(col("doc_id"), md5(col("media.bytes")).as("m"))
    val exactPairs = tbl.groupBy("m").agg(count(lit(1)).as("n"))
      .where(col("n") >= 2).count()
    assert(exactPairs == 0L, s"$exactPairs byte-identical groups")
  }
}
