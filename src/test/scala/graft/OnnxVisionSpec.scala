package graft

import graft.operators.{Multimodal, OnnxVision, OnnxVisionModel}

/** The ONNX backend's pure-JVM half (preprocessing, decode-failure
  * contract, unavailable-runtime diagnostics) runs everywhere; the
  * forward-pass tests engage only when ONNX Runtime is on the classpath
  * AND `GRAFT_ONNX_MODEL` points at a classification .onnx — this
  * sandbox has neither, a deployment with the jar dropped in has both.
  */
class OnnxVisionSpec extends SparkSpec {

  private def constPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val model = OnnxVisionModel(
    modelPath = sys.env.getOrElse("GRAFT_ONNX_MODEL", "/nonexistent/model.onnx"),
    labels = Seq("indoor", "outdoor"), outputDim = 2, inputSize = 8)

  test("preprocess: CHW layout, ImageNet normalize, exact on a constant image") {
    // pure red 4x4 → resized 8x8 stays constant; channel planes must be
    // ((1,0,0) - mean) / std in C-major order
    val t = model.preprocess(constPng(4, 4, 0xff0000)).get
    assert(t.length == 3 * 8 * 8)
    val expect = Seq(
      (1.0f - 0.485f) / 0.229f, (0.0f - 0.456f) / 0.224f, (0.0f - 0.406f) / 0.225f)
    for (c <- 0 until 3; px <- 0 until 64)
      assert(math.abs(t(c * 64 + px) - expect(c)) < 1e-5,
        s"channel $c pixel $px: ${t(c * 64 + px)} vs ${expect(c)}")
  }

  test("preprocess: per-pixel golden tensor on a gradient (pins CHW indexing)") {
    // identity-size input (8x8 into inputSize=8) so resize is pass-through
    // and every pixel's expected value is the closed-form
    // ((v/255) - mean_c) / std_c. A constant image cannot catch x/y
    // transposition or plane-order bugs; this gradient pins both: every
    // (x, y, channel) has a distinct hand-computable value.
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, ((x * 30) << 16) | ((y * 25) << 8) | (x * 10 + y * 5))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val t = model.preprocess(bos.toByteArray).get
    val mean = Seq(0.485f, 0.456f, 0.406f); val std = Seq(0.229f, 0.224f, 0.225f)
    for (y <- 0 until 8; x <- 0 until 8) {
      val raw = Seq(x * 30, y * 25, x * 10 + y * 5)
      for (c <- 0 until 3) {
        val expect = (raw(c) / 255.0f - mean(c)) / std(c)
        val got = t(c * 64 + y * 8 + x)
        assert(math.abs(got - expect) < 1e-5,
          s"(x=$x,y=$y,c=$c): $got vs $expect")
      }
    }
  }

  test("preprocess: 2x downscale of a 2x2-block image hits the block values") {
    // 16x16 built from 2x2 constant blocks, resized to 8x8: the sample
    // grid lands inside equal-valued blocks for ANY sane interpolation,
    // so the expected tensor is kernel-independent — this pins that the
    // resize path actually runs (and scales, not crops) without coupling
    // the test to AWT's exact bilinear weights.
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val (bx, by) = (x / 2, y / 2)
      img.setRGB(x, y, ((bx * 31) << 16) | ((by * 29) << 8) | ((bx + by) * 15))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val t = model.preprocess(bos.toByteArray).get
    val mean = Seq(0.485f, 0.456f, 0.406f); val std = Seq(0.229f, 0.224f, 0.225f)
    for (by <- 0 until 8; bx <- 0 until 8) {
      val raw = Seq(bx * 31, by * 29, (bx + by) * 15)
      for (c <- 0 until 3) {
        val expect = (raw(c) / 255.0f - mean(c)) / std(c)
        val got = t(c * 64 + by * 8 + bx)
        assert(math.abs(got - expect) < 2e-2, // interpolation headroom only
          s"(bx=$bx,by=$by,c=$c): $got vs $expect")
      }
    }
  }

  test("preprocess: corrupt input and B/W images → None (reference skip)") {
    assert(model.preprocess("not an image".getBytes).isEmpty)
    val bw = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bw, "png", bos)
    assert(model.preprocess(bos.toByteArray).isEmpty)
  }

  test("all-undecodable batch short-circuits to Nones without touching the runtime") {
    // position-stable failure contract holds even with no jar installed
    assert(model.labelBatch(Seq("x".getBytes, "y".getBytes)) == Seq(None, None))
    assert(model.embedBatch(Seq("x".getBytes)) == Seq(None))
  }

  test("missing runtime → actionable error naming the jar, not a reflection trace") {
    assume(!OnnxVision.available)
    val e = intercept[IllegalStateException](model.label(constPng(4, 4, 0x336699)))
    assert(e.getMessage.contains("onnxruntime"))
    assert(e.getMessage.contains("ImageIoVisionModel")) // the working fallback
  }

  test("anonymize without the runtime still redacts (imageio pixelation path)") {
    val in = constPng(16, 16, 0x808080)
    val out = model.anonymize(in)
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out)) != null)
  }

  test("live forward pass: batch label + embed through a real .onnx graph") {
    assume(OnnxVision.available && sys.env.contains("GRAFT_ONNX_MODEL"))
    val imgs = Seq(constPng(16, 16, 0xff0000), "corrupt".getBytes,
      constPng(16, 16, 0x0000ff))
    val preds = model.labelBatch(imgs)
    assert(preds(1).isEmpty && preds(0).nonEmpty && preds(2).nonEmpty)
    val probs = preds(0).get.map(_._2)
    assert(math.abs(probs.sum - 1.0) < 1e-6 && probs == probs.sortBy(-_))
    val embs = model.embedBatch(imgs)
    assert(embs(0).get.length == model.dim && embs(1).isEmpty)
  }

  test("drop-in for the pipeline operators: labelImages schema parity") {
    // the operator contract is backend-independent: both backends must
    // produce the same schema through Multimodal.labelImages
    import spark.implicits._
    val df = Seq(("a.png", constPng(8, 8, 0x112233))).toDF("image", "content")
    val viaImageIo = Multimodal.labelImages(df, Multimodal.ImageIoVisionModel())
    if (OnnxVision.available && sys.env.contains("GRAFT_ONNX_MODEL")) {
      val viaOnnx = Multimodal.labelImages(df, model)
      assert(viaOnnx.schema == viaImageIo.schema)
    } else assert(viaImageIo.schema.fieldNames.toSeq ==
      Seq("image", "category", "predictions"))
  }
}
