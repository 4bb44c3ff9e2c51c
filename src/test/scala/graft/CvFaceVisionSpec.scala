package graft

import graft.operators.{CvFace, CvFaceVisionModel, Multimodal}

/** The OpenCV face-detection seam (VERDICT r9 next-round #6): the
  * [[OnnxVisionSpec]] treatment for the anonymizer's detector half —
  * everything that doesn't need the native runtime is pinned here
  * (shared pixelation path, delegation, failure contract, actionable
  * missing-runtime error); the live forward pass self-cancels in this
  * sandbox and is the first action on a machine with the OpenCV jar +
  * native lib (same runbook line as the ONNX test).
  */
class CvFaceVisionSpec extends SparkSpec {

  private val img = Multimodal.syntheticImage(42L)

  test("pixelateBoxes with the centered box is byte-identical to the stand-in anonymize") {
    val standIn = Multimodal.ImageIoVisionModel().anonymize(img)
    val viaBoxes = Multimodal.pixelateBoxes(img,
      (w, h) => Seq((w / 4, h / 4, w / 4 + w / 2, h / 4 + h / 2)), blocks = 3)
    assert(java.util.Arrays.equals(standIn, viaBoxes),
      "shared redaction path diverged from ImageIoVisionModel.anonymize")
  }

  test("out-of-frame boxes clamp like the reference's numpy slicing; empty boxes = re-encode only") {
    // a box poking past every edge redacts exactly the in-frame part
    val clamped = Multimodal.pixelateBoxes(img,
      (w, h) => Seq((-5, -5, w + 5, h + 5)), blocks = 3)
    val full = Multimodal.pixelateBoxes(img, (w, h) => Seq((0, 0, w, h)), blocks = 3)
    assert(java.util.Arrays.equals(clamped, full))
    // no detections: pixels unchanged through the lossless re-encode
    val none = Multimodal.pixelateBoxes(img, (_, _) => Nil, blocks = 3)
    val m = Multimodal.ImageIoVisionModel()
    assert(m.channelSums(none) == m.channelSums(img))
  }

  test("undecodable input passes through unchanged without touching the runtime") {
    val junk = Array.tabulate[Byte](64)(_.toByte)
    val model = CvFaceVisionModel("/nonexistent.prototxt", "/nonexistent.caffemodel")
    assert(java.util.Arrays.equals(model.anonymize(junk), junk))
  }

  test("label/embed delegate to the base model unchanged") {
    val base = Multimodal.ImageIoVisionModel()
    val model = CvFaceVisionModel("p", "m", base = base)
    assert(model.label(img) == base.label(img))
    assert(model.embed(img).map(_.toSeq) == base.embed(img).map(_.toSeq))
    assert(model.dim == base.dim)
  }

  test("missing runtime → actionable error naming the jar, not a reflection trace") {
    assume(!CvFace.available)
    val model = CvFaceVisionModel("p.prototxt", "m.caffemodel")
    val e = intercept[IllegalStateException] { model.anonymize(img) }
    assert(e.getMessage.contains("opencv") && e.getMessage.contains("spark.jars"))
  }

  test("live SSD forward: detections land in-frame through a real caffemodel") {
    assume(CvFace.available && sys.env.contains("GRAFT_CV_PROTO") &&
      sys.env.contains("GRAFT_CV_MODEL"))
    val model = CvFaceVisionModel(
      sys.env("GRAFT_CV_PROTO"), sys.env("GRAFT_CV_MODEL"), confidence = 0.15)
    val out = model.anonymize(img) // must not throw; boxes clamp in-frame
    assert(out.nonEmpty)
    // and the decoded dimensions survive the redaction round-trip
    val m = Multimodal.ImageIoVisionModel()
    assert(m.channelSums(out).map(t => (t._1, t._2)) ==
      m.channelSums(img).map(t => (t._1, t._2)))
  }
}
