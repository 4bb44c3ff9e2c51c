package graft.operators

import java.awt.image.BufferedImage
import java.nio.FloatBuffer

/** Real DNN vision backend over ONNX Runtime, loaded by REFLECTION so
  * this module compiles and ships without the `com.microsoft.onnxruntime`
  * jar on the build classpath (the sandbox has no network; a deployment
  * drops `onnxruntime-<ver>.jar` next to the Spark jars and this backend
  * lights up — [[OnnxVision.available]] reports which world you're in).
  *
  * This is the production implementation of the [[Multimodal.VisionModel]]
  * seam that [[Multimodal.ImageIoVisionModel]] stands in for: the same
  * batch grain (one `run()` per `batchSize`-bounded group — the tensor
  * shape ImageLabeler.py:129-140's DataLoader feeds the GPU), the same
  * failure contract (undecodable/rejected input → None for THAT item,
  * position-stable, never a task-failing throw — ImageLabeler.py:142-146's
  * B/W skip), and the same preprocessing the reference's torchvision
  * transform applies (ImageLabeler.py:115-123: resize → center-crop-free
  * square resize → float32 CHW → per-channel ImageNet mean/std
  * normalize).
  *
  * Session handling follows the trait's documented pattern: the
  * `OrtSession` lives in a JVM-static cache keyed by model path
  * ([[OnnxVision.session]]), built at most once per executor JVM and
  * NEVER serialized from the driver — the case class that travels with
  * the task closure carries only the path + config strings.
  */
object OnnxVision {
  /** True iff ONNX Runtime is on this JVM's classpath. */
  lazy val available: Boolean =
    try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
    catch { case _: Throwable => false }

  private lazy val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
  private lazy val env: AnyRef =
    envCls.getMethod("getEnvironment").invoke(null)

  // one session per (executor JVM, model path) — the expensive handle a
  // Predictor must never rebuild per task or serialize from the driver
  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private def session(modelPath: String): AnyRef = {
    if (!available)
      throw new IllegalStateException(
        "OnnxVisionModel needs ONNX Runtime on the executor classpath " +
          "(ai.onnxruntime.OrtEnvironment not found). Add the " +
          "onnxruntime jar to spark.jars, or use ImageIoVisionModel.")
    sessions.computeIfAbsent(modelPath, { p =>
      envCls.getMethod("createSession", classOf[String])
        .invoke(env, p)
    })
  }

  /** One batched forward pass: NCHW float input → per-row float vector
    * output (logits or embedding — first output of the graph, shape
    * [n, dim]). Tensor and result are closed before returning.
    */
  def forward(modelPath: String, inputName: String,
              batch: Array[Array[Float]], chw: Array[Long]): Array[Array[Float]] = {
    val sess = session(modelPath)
    val flat = new Array[Float](batch.length * batch(0).length)
    var i = 0
    while (i < batch.length) {
      System.arraycopy(batch(i), 0, flat, i * batch(0).length, batch(i).length)
      i += 1
    }
    val shape = Array(batch.length.toLong) ++ chw
    val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
    val tensor = tensorCls
      .getMethod("createTensor", envCls, classOf[FloatBuffer], classOf[Array[Long]])
      .invoke(null, env, FloatBuffer.wrap(flat), shape)
    try {
      val result = sess.getClass
        .getMethod("run", classOf[java.util.Map[_, _]])
        .invoke(sess, java.util.Collections.singletonMap(inputName, tensor))
      try {
        val value = result.getClass.getMethod("get", classOf[Int])
          .invoke(result, Integer.valueOf(0))
        val out = value.getClass.getMethod("getValue").invoke(value)
          .asInstanceOf[Array[Array[Float]]]
        require(out.length == batch.length,
          s"ONNX graph returned ${out.length} rows for a ${batch.length}-row batch")
        out
      } finally result.asInstanceOf[AutoCloseable].close()
    } finally tensor.asInstanceOf[AutoCloseable].close()
  }
}

/** [[Multimodal.VisionModel]] over an ONNX classification/embedding graph.
  *
  * @param modelPath  .onnx file reachable on every executor
  * @param labels     class names in logit order (classification head);
  *                   empty for a pure embedding graph
  * @param outputDim  width of the graph's output row (logit count or
  *                   embedding dim)
  * @param inputName  graph input tensor name
  * @param inputSize  square side the image is resized to (224 for the
  *                   resnet50-places365 the reference deploys)
  * @param topK       predictions kept per image (ImageLabeler.py:153's
  *                   top-5)
  */
final case class OnnxVisionModel(
    modelPath: String,
    labels: Seq[String],
    outputDim: Int,
    inputName: String = "input",
    inputSize: Int = 224,
    topK: Int = 5,
    mean: Array[Float] = Array(0.485f, 0.456f, 0.406f),
    std: Array[Float] = Array(0.229f, 0.224f, 0.225f))
  extends Multimodal.VisionModel {

  def dim: Int = outputDim

  private def decodeColor(content: Array[Byte]): Option[BufferedImage] =
    (try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
     catch { case _: Exception => None })
      // the reference's B/W skip (ImageLabeler.py:141-146)
      .filter(_.getColorModel.getNumComponents >= 3)

  /** torchvision-equivalent preprocessing (ImageLabeler.py:115-123):
    * bilinear resize to `inputSize`², RGB → float32 CHW, per-channel
    * mean/std normalize. Pure JVM — unit-tested without the runtime.
    */
  def preprocess(content: Array[Byte]): Option[Array[Float]] =
    decodeColor(content).map { img =>
      val s = inputSize
      val scaled = new BufferedImage(s, s, BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, s, s, null)
      g.dispose()
      val out = new Array[Float](3 * s * s)
      var y = 0
      while (y < s) {
        var x = 0
        while (x < s) {
          val rgb = scaled.getRGB(x, y)
          val px = y * s + x
          out(px) = (((rgb >> 16) & 0xff) / 255.0f - mean(0)) / std(0)
          out(s * s + px) = (((rgb >> 8) & 0xff) / 255.0f - mean(1)) / std(1)
          out(2 * s * s + px) = ((rgb & 0xff) / 255.0f - mean(2)) / std(2)
          x += 1
        }
        y += 1
      }
      out
    }

  /** Decode-what-you-can, ONE forward pass for the decodable subset,
    * scatter results back position-stable (None where decode failed).
    */
  private def forwardBatch(contents: Seq[Array[Byte]]): Seq[Option[Array[Float]]] = {
    val pre = contents.map(preprocess)
    val live = pre.zipWithIndex.collect { case (Some(t), i) => (t, i) }
    if (live.isEmpty) return Seq.fill(contents.size)(None)
    val out = OnnxVision.forward(modelPath, inputName, live.map(_._1).toArray,
      Array(3L, inputSize.toLong, inputSize.toLong))
    val byIdx = live.map(_._2).zip(out).toMap
    contents.indices.map(byIdx.get)
  }

  override def labelBatch(contents: Seq[Array[Byte]]): Seq[Option[Seq[(String, Double)]]] =
    forwardBatch(contents).map(_.map { logits =>
      // softmax over the class logits → top-k desc (ImageLabeler.py:151-160)
      val m = logits.max
      val exps = logits.map(l => math.exp((l - m).toDouble))
      val z = exps.sum
      logits.indices
        .map(i => (if (i < labels.size) labels(i) else s"class_$i", exps(i) / z))
        .sortBy(-_._2).take(topK)
    })

  override def embedBatch(contents: Seq[Array[Byte]]): Seq[Option[Array[Float]]] =
    forwardBatch(contents)

  def label(content: Array[Byte]): Option[Seq[(String, Double)]] =
    labelBatch(Seq(content)).head
  def embed(content: Array[Byte]): Option[Array[Float]] =
    embedBatch(Seq(content)).head

  /** Face pixelation needs a DETECTOR graph, not this classifier; until
    * one is configured the redaction arithmetic (the reference's exact
    * block-mean fill, anonymize_face.py:44-70) comes from the imageio
    * backend's centered-box stand-in.
    */
  def anonymize(content: Array[Byte]): Array[Byte] =
    Multimodal.ImageIoVisionModel().anonymize(content)
}
