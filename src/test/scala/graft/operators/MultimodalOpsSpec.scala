package graft.operators

import graft.SparkSpec

/** The REAL decode path (javax.imageio) — not the deterministic fake. */
class MultimodalOpsSpec extends SparkSpec {

  test("ImageIoCodec decodes real PNG bytes: header dims + full pixel round trip") {
    val bytes = MultimodalOps.syntheticPng(docId = 7L, w = 13, h = 9)
    // a real PNG came out of the encoder (magic bytes)
    assert((bytes(1) & 0xff, bytes(2) & 0xff, bytes(3) & 0xff) === (0x50, 0x4e, 0x47))

    // header-level decode (the codec under test)
    val f = ImageIoCodec.decode(MediaRecord(7L, "image/png", bytes))
    assert(f.width === 13)
    assert(f.height === 9)
    assert(f.n_frames === 1)
    assert(f.byte_len === bytes.length.toLong)

    // full pixel decode: PNG is lossless, so every pixel must match the
    // generator's gradient exactly — proves real bytes→pixels, not metadata
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until 9; x <- 0 until 13)
      assert((img.getRGB(x, y) & 0xffffff) === ((x * 31 + y * 17 + 7L) & 0xffffff).toInt,
        s"pixel ($x,$y)")
  }

  test("ImageIoCodec sniffs the container format, not the mime string (BMP)") {
    val img = new java.awt.image.BufferedImage(5, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val f = ImageIoCodec.decode(MediaRecord(1L, "application/octet-stream", bos.toByteArray))
    assert((f.width, f.height) === (5, 3))
  }

  test("ImageIoCodec fails loudly on undecodable bytes") {
    intercept[java.io.IOException] {
      ImageIoCodec.decode(MediaRecord(2L, "image/png", "not an image".getBytes))
    }
  }

  test("decodeImages runs the encode→decode pipeline distributed (M2)") {
    val out = MultimodalOps.decodeImages(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("width") === 1 + id % 64)
      assert(r.getAs[Long]("height") === 1 + id % 48)
      assert(r.getAs[Long]("n_pixels") === (1 + id % 64) * (1 + id % 48))
    }
  }
}
