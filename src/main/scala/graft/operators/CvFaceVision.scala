package graft.operators

/** Real SSD face detection over OpenCV's DNN module, loaded by
  * REFLECTION so this module compiles and ships without the `opencv`
  * Java jar + native library on the build classpath (the sandbox has no
  * network; a deployment drops `opencv-<ver>.jar` next to the Spark jars
  * with `libopencv_java<ver>.so` on `java.library.path` and this backend
  * lights up — [[CvFace.available]] reports which world you're in).
  *
  * This is the production implementation of the DETECTION half of the
  * [[Multimodal.VisionModel]] anonymization seam, the exact analog of
  * [[OnnxVision]] for the classifier/embedding half: the reference's
  * detector is `cv2.dnn.readNet(deploy.prototxt,
  * res10_300x300_ssd_iter_140000.caffemodel)` run on a 300×300
  * mean-subtracted blob, keeping boxes above `confidence`
  * (anonymize_face.py:20-42). The REDACTION arithmetic is NOT duplicated
  * here — detected boxes feed [[Multimodal.pixelateBoxes]], the same
  * bit-exact block-mean fill the i02 gate checks and the centered-box
  * stand-in uses, so swapping detectors cannot change fill semantics.
  *
  * Net handles live in a JVM-static cache keyed by (proto, model) path
  * ([[CvFace.net]]) — built at most once per executor JVM, never
  * serialized from the driver; the case class travels with only paths +
  * the threshold (the [[OnnxVision]] session discipline).
  */
object CvFace {
  /** True iff the OpenCV Java API is on this JVM's classpath AND its
    * native library loads (the Java classes are JNI stubs without it).
    */
  lazy val available: Boolean =
    try {
      val core = Class.forName("org.opencv.core.Core")
      val libName = core.getField("NATIVE_LIBRARY_NAME").get(null).asInstanceOf[String]
      System.loadLibrary(libName)
      true
    } catch { case _: Throwable => false }

  private val nets =
    new java.util.concurrent.ConcurrentHashMap[(String, String), AnyRef]()

  private def requireRuntime(): Unit =
    if (!available)
      throw new IllegalStateException(
        "CvFaceVisionModel needs OpenCV on the executor classpath " +
          "(org.opencv.core.Core not found or its native library failed " +
          "to load). Add the opencv Java jar to spark.jars and " +
          "libopencv_java*.so to java.library.path, or use " +
          "ImageIoVisionModel's centered-box stand-in.")

  private def net(protoPath: String, modelPath: String): AnyRef = {
    requireRuntime()
    nets.computeIfAbsent((protoPath, modelPath), { case (p, m) =>
      Class.forName("org.opencv.dnn.Dnn")
        .getMethod("readNetFromCaffe", classOf[String], classOf[String])
        .invoke(null, p, m)
    })
  }

  /** Detect faces in an INT_RGB pixel buffer: returns (sx, sy, ex, ey)
    * boxes in image coordinates for detections above `confidence` —
    * the blob/forward/box-decode of anonymize_face.py:27-38. Pixels
    * arrive from the JVM decode path (javax.imageio), so OpenCV is used
    * ONLY for the DNN forward, never as a codec — codec behavior stays
    * identical with and without the runtime.
    */
  def detect(protoPath: String, modelPath: String, w: Int, h: Int,
             rgb: Array[Int], confidence: Double): Seq[(Int, Int, Int, Int)] = {
    val n = net(protoPath, modelPath)
    // BGR byte plane — blobFromImage's expected channel order
    val bgr = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val px = rgb(i)
      bgr(3 * i) = (px & 0xff).toByte
      bgr(3 * i + 1) = ((px >> 8) & 0xff).toByte
      bgr(3 * i + 2) = ((px >> 16) & 0xff).toByte
      i += 1
    }
    val cvTypeCls = Class.forName("org.opencv.core.CvType")
    val cv8uc3 = cvTypeCls.getField("CV_8UC3").getInt(null)
    val matCls = Class.forName("org.opencv.core.Mat")
    val mat = matCls.getConstructor(classOf[Int], classOf[Int], classOf[Int])
      .newInstance(Integer.valueOf(h), Integer.valueOf(w), Integer.valueOf(cv8uc3))
      .asInstanceOf[AnyRef]
    matCls.getMethod("put", classOf[Int], classOf[Int], classOf[Array[Byte]])
      .invoke(mat, Integer.valueOf(0), Integer.valueOf(0), bgr)
    val sizeCls = Class.forName("org.opencv.core.Size")
    val size300 = sizeCls.getConstructor(classOf[Double], classOf[Double])
      .newInstance(java.lang.Double.valueOf(300.0), java.lang.Double.valueOf(300.0))
      .asInstanceOf[AnyRef]
    val scalarCls = Class.forName("org.opencv.core.Scalar")
    val mean = scalarCls
      .getConstructor(classOf[Double], classOf[Double], classOf[Double])
      .newInstance(java.lang.Double.valueOf(104.0),
        java.lang.Double.valueOf(177.0), java.lang.Double.valueOf(123.0))
      .asInstanceOf[AnyRef]
    val blob = Class.forName("org.opencv.dnn.Dnn")
      .getMethod("blobFromImage", matCls, classOf[Double], sizeCls, scalarCls)
      .invoke(null, mat, java.lang.Double.valueOf(1.0), size300, mean)
    // cv::dnn::Net is NOT thread-safe (unlike ORT sessions — the cache
    // pattern transfers, the concurrency contract does not): setInput +
    // forward must not interleave across executor task threads, or one
    // task reads the other's detections. AND forward() returns a Mat
    // VIEWING the net's internal output blob, which the next forward
    // overwrites — so the total/reshape/get decode must ALSO happen
    // under the lock; only the copied-out JVM doubles escape it. A
    // throughput-bound deployment caches per-thread nets instead.
    n.synchronized {
      n.getClass.getMethod("setInput", matCls).invoke(n, blob)
      val out = n.getClass.getMethod("forward").invoke(n) // [1,1,N,7]
      // reshape to a 2-D [N,7] view so row-wise get() works uniformly
      val total = matCls.getMethod("total").invoke(out)
        .asInstanceOf[java.lang.Long].longValue().toInt
      // a graph whose output is not detection-shaped (not a multiple of
      // the 7-wide SSD rows) yields no detections rather than garbage boxes
      if (total % 7 != 0) Nil
      else {
        val flat = matCls.getMethod("reshape", classOf[Int], classOf[Int])
          .invoke(out, Integer.valueOf(1), Integer.valueOf(total / 7))
        val getM = matCls.getMethod("get", classOf[Int], classOf[Int])
        val rows = total / 7
        (0 until rows).flatMap { r =>
          def cell(c: Int): Double =
            getM.invoke(flat, Integer.valueOf(r), Integer.valueOf(c))
              .asInstanceOf[Array[Double]](0)
          val conf = cell(2)
          if (conf > confidence)
            // box * [w, h, w, h], astype(int) — anonymize_face.py:36-37
            Some(((cell(3) * w).toInt, (cell(4) * h).toInt,
              (cell(5) * w).toInt, (cell(6) * h).toInt))
          else None
        }
      }
    }
  }
}

/** [[Multimodal.VisionModel]] whose `anonymize` runs the reference's
  * REAL detector (res10 SSD via OpenCV DNN) and feeds detections into
  * the shared bit-exact pixelation ([[Multimodal.pixelateBoxes]]).
  * Classification/embedding delegate to the configured base model —
  * this class exists for the detection seam, exactly as
  * [[OnnxVisionModel]] exists for the classifier seam (its own
  * `anonymize` delegates the other way).
  *
  * @param protoPath  deploy.prototxt reachable on every executor
  * @param modelPath  res10 caffemodel reachable on every executor
  * @param confidence detection threshold (ImageAnonymizer.py:14's 0.2
  *                   default; config/test.json ships 0.15)
  */
final case class CvFaceVisionModel(
    protoPath: String,
    modelPath: String,
    confidence: Double = 0.2,
    blocks: Int = 3,
    base: Multimodal.VisionModel = Multimodal.ImageIoVisionModel())
  extends Multimodal.VisionModel {

  def dim: Int = base.dim
  def label(content: Array[Byte]): Option[Seq[(String, Double)]] = base.label(content)
  def embed(content: Array[Byte]): Option[Array[Float]] = base.embed(content)
  override def labelBatch(contents: Seq[Array[Byte]]): Seq[Option[Seq[(String, Double)]]] =
    base.labelBatch(contents)
  override def embedBatch(contents: Seq[Array[Byte]]): Seq[Option[Array[Float]]] =
    base.embedBatch(contents)

  def anonymize(content: Array[Byte]): Array[Byte] =
    // the detector consumes the SAME decoded, INT_RGB-normalized image
    // the fill works on — one ImageIO pass per image, not two
    Multimodal.pixelateBoxesDecoded(content, { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val rgb = img.getRGB(0, 0, w, h, null, 0, w)
      CvFace.detect(protoPath, modelPath, w, h, rgb, confidence)
    }, blocks)
}
