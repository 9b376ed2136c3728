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
}
