package graft.operators

import java.io.ByteArrayOutputStream

import graft.operators.NeuralEmbed.NeuralModel

/** ONNX codec for the quantized-MLP artifact — the F8 byte-parity seam
  * (`/root/reference/backend/app.py:28-33`: the reference loads its
  * encoder from a model FILE once per process). [[read]] ingests a real
  * `.onnx` file (the ONNX protobuf wire format, public spec:
  * github.com/onnx/onnx `onnx.proto3`) holding the standard 2-layer MLP
  * export shape
  *
  *   Gemm(x, W1, B1; transB=1) -> Relu -> Gemm(h, W2, B2; transB=1)
  *
  * and lowers it onto [[NeuralEmbed.NeuralModel]] — from there the
  * existing seam applies unchanged (parquet weight table, broadcast
  * once, per-partition encoder). The other common export spelling of
  * the same MLP is accepted too:
  *
  *   MatMul(x, W1) -> Add(., B1) -> Relu -> MatMul -> Add
  *
  * (weights stored [in, out], transposed on read — the TF/keras-style
  * export beside Gemm's PyTorch-style one), as is a 2-input Gemm whose
  * absent C operand means a zero bias. [[write]] / [[writeMatMulAdd]]
  * are the matching exporters, so both spellings round-trip and gates
  * can produce REAL .onnx fixture byte-streams without network access.
  *
  * Scope (and why it is enough): this is NOT an ONNX runtime — it is a
  * weight CARRIER for the one graph shape the engine executes natively.
  * The parser is strict: anything but the exact MLP shape (the two
  * spellings above, float32 initializers with INTEGRAL values in the
  * int8 range) is refused loudly, because a silently misread weight is
  * the worst possible failure mode for a model artifact. Integral
  * weights are what a quantized export carries (Jacob et al. 2017;
  * int8 weights stored as float32 is the ONNX dequantized-export
  * convention) and are what keeps the forward pass bit-reproducible
  * across engines — the whole point of the x-gate discipline.
  *
  * Wire format implemented (protobuf encoding, public): varint (type 0),
  * 64-bit (1), length-delimited (2), 32-bit (5). Field numbers from
  * onnx.proto3: ModelProto.graph=7, GraphProto.node=1/initializer=5,
  * NodeProto.input=1/output=2/op_type=4/attribute=5,
  * AttributeProto.name=1/f=2/i=3/type=20,
  * TensorProto.dims=1/data_type=2/float_data=4/name=8/raw_data=9.
  */
object OnnxMlp {

  // ---------------------------------------------------------------- read

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        require(pos < end, "onnx: truncated varint")
        val b = buf(pos); pos += 1
        v |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        require(shift < 64, "onnx: varint overflow")
      }
      v
    }
    def skip(wire: Int): Unit = {
      wire match {
        case 0 => varint(): Unit
        case 1 => pos += 8
        case 2 => val n = varint().toInt; require(n >= 0, "onnx: negative field length"); pos += n
        case 5 => pos += 4
        case w => throw new IllegalArgumentException(s"onnx: wire type $w unsupported")
      }
      require(pos <= end, "onnx: field overruns buffer (truncated file)")
    }
    def sub(): Reader = {
      val n = varint().toInt
      require(n >= 0 && pos + n <= end, "onnx: truncated length-delimited field")
      val r = new Reader(buf, pos, pos + n); pos += n; r
    }
    def bytes(): Array[Byte] = {
      val n = varint().toInt
      require(n >= 0 && pos + n <= end, "onnx: truncated bytes field")
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a
    }
    def string(): String = new String(bytes(), "UTF-8")
    def float32(): Float = {
      require(pos + 4 <= end, "onnx: truncated float")
      val bits = (buf(pos) & 0xFF) | ((buf(pos + 1) & 0xFF) << 8) |
        ((buf(pos + 2) & 0xFF) << 16) | ((buf(pos + 3) & 0xFF) << 24)
      pos += 4
      java.lang.Float.intBitsToFloat(bits)
    }
  }

  private final case class Tensor(name: String, dims: Seq[Long], data: Array[Float])
  private final case class Node(opType: String, inputs: Seq[String],
                                outputs: Seq[String], attrs: Map[String, Either[Long, Float]])

  private def parseTensor(r: Reader): Tensor = {
    var name = ""; var dtype = -1L
    val dims = Seq.newBuilder[Long]
    var raw: Array[Byte] = null
    val floats = Array.newBuilder[Float]
    var nFloats = 0
    while (r.hasMore) {
      val tag = r.varint(); val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 0) => dims += r.varint()
        case (1, 2) => val s = r.sub(); while (s.hasMore) dims += s.varint() // packed
        case (2, 0) => dtype = r.varint()
        case (4, 2) => val s = r.sub(); while (s.hasMore) { floats += s.float32(); nFloats += 1 }
        case (4, 5) => floats += r.float32(); nFloats += 1
        case (8, 2) => name = r.string()
        case (9, 2) => raw = r.bytes()
        case _ => r.skip(wire)
      }
    }
    require(dtype == 1L, s"onnx: initializer '$name' has data_type $dtype; only FLOAT (1) is supported")
    val data: Array[Float] =
      if (raw != null) {
        require(nFloats == 0, s"onnx: initializer '$name' carries both raw_data and float_data")
        require(raw.length % 4 == 0, s"onnx: initializer '$name' raw_data length ${raw.length} not a multiple of 4")
        val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        Array.fill(raw.length / 4)(bb.getFloat)
      } else floats.result()
    val d = dims.result()
    require(d.product == data.length,
      s"onnx: initializer '$name' dims ${d.mkString("x")} do not match ${data.length} values")
    Tensor(name, d, data)
  }

  private def parseNode(r: Reader): Node = {
    val ins = Seq.newBuilder[String]; val outs = Seq.newBuilder[String]
    var op = ""; var attrs = Map.empty[String, Either[Long, Float]]
    while (r.hasMore) {
      val tag = r.varint(); val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 2) => ins += r.string()
        case (2, 2) => outs += r.string()
        case (4, 2) => op = r.string()
        case (5, 2) =>
          val a = r.sub()
          var an = ""; var av: Either[Long, Float] = Left(0L)
          while (a.hasMore) {
            val t2 = a.varint(); val f2 = (t2 >>> 3).toInt; val w2 = (t2 & 7).toInt
            (f2, w2) match {
              case (1, 2) => an = a.string()
              case (2, 5) => av = Right(a.float32())
              case (3, 0) => av = Left(a.varint())
              case _ => a.skip(w2)
            }
          }
          attrs = attrs.updated(an, av)
        case _ => r.skip(wire)
      }
    }
    Node(op, ins.result(), outs.result(), attrs)
  }

  /** Parse ONNX bytes into the engine's model. Strict: refuses anything
    * but the 2-layer Gemm/Relu/Gemm MLP with integral int8-range
    * float32 weights (see object doc).
    */
  def read(bytes: Array[Byte]): NeuralModel = {
    val top = new Reader(bytes, 0, bytes.length)
    var graph: Reader = null
    while (top.hasMore) {
      val tag = top.varint(); val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      if (field == 7 && wire == 2) graph = top.sub() else top.skip(wire)
    }
    require(graph != null, "onnx: no graph in model")
    val nodes = Seq.newBuilder[Node]
    val inits = Seq.newBuilder[Tensor]
    while (graph.hasMore) {
      val tag = graph.varint(); val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 2) => nodes += parseNode(graph.sub())
        case (5, 2) => inits += parseTensor(graph.sub())
        case _ => graph.skip(wire)
      }
    }
    val ns = nodes.result()
    val byName = inits.result().map(t => t.name -> t).toMap

    def quantized(t: Tensor): Array[Int] = t.data.map { f =>
      require(f == math.rint(f) && math.abs(f) <= 127.0f,
        s"onnx: initializer '${t.name}' value $f is not an integral int8-range weight " +
          "(this carrier runs exact-integer quantized models only)")
      f.toInt
    }
    def initOf(name: String, what: String): Tensor = byName.getOrElse(name,
      throw new IllegalArgumentException(s"onnx: $what input '$name' is not an initializer"))

    /** One dense layer lowered to the engine layout: weights [out][in]
      * row-major, bias length dOut.
      */
    case class Layer(dIn: Int, dOut: Int, w: Array[Int], b: Array[Int])

    // Gemm(x, W[, C]; transB=1): weights already [out, in]; an absent C
    // input (the 2-input export) means a zero bias
    def gemmLayer(n: Node): Layer = {
      require(n.inputs.length == 2 || n.inputs.length == 3,
        s"onnx: Gemm needs 2 or 3 inputs (A, B[, C]), got ${n.inputs.length}")
      n.attrs.foreach {
        case ("alpha", Right(f)) => require(f == 1.0f, s"onnx: Gemm alpha $f unsupported (need 1)")
        case ("beta", Right(f)) => require(f == 1.0f, s"onnx: Gemm beta $f unsupported (need 1)")
        case ("transA", Left(v)) => require(v == 0L, "onnx: Gemm transA=1 unsupported")
        case ("transB", Left(v)) => require(v == 1L, "onnx: Gemm needs transB=1 (weights stored [out, in])")
        case _ => ()
      }
      require(n.attrs.get("transB").contains(Left(1L)),
        "onnx: Gemm needs explicit transB=1 (weights stored [out, in])")
      val wT = initOf(n.inputs(1), "Gemm")
      require(wT.dims.length == 2, s"onnx: Gemm weight '${wT.name}' rank must be 2")
      val dOut = wT.dims(0).toInt; val dIn = wT.dims(1).toInt
      val b =
        if (n.inputs.length == 3) {
          val bT = initOf(n.inputs(2), "Gemm")
          require(bT.dims.length == 1 && bT.dims.head.toInt == dOut,
            s"onnx: Gemm bias '${bT.name}' length does not match layer width $dOut")
          quantized(bT)
        } else new Array[Int](dOut) // absent C: zero bias
      Layer(dIn, dOut, quantized(wT), b)
    }

    // MatMul(x, W) -> Add(., B): the other common export spelling —
    // weights stored [in, out], transposed here to the engine layout
    def matmulAddLayer(mm: Node, add: Node, upstream: String): Layer = {
      require(mm.inputs.length == 2, s"onnx: MatMul needs 2 inputs, got ${mm.inputs.length}")
      require(mm.inputs.headOption.contains(upstream),
        s"onnx: MatMul's data input must be '$upstream'")
      require(!byName.contains(mm.inputs.head),
        "onnx: MatMul's data input must not be an initializer")
      val wT = initOf(mm.inputs(1), "MatMul")
      require(wT.dims.length == 2, s"onnx: MatMul weight '${wT.name}' rank must be 2")
      val dIn = wT.dims(0).toInt; val dOut = wT.dims(1).toInt
      val mmOut = mm.outputs.headOption.getOrElse(
        throw new IllegalArgumentException("onnx: MatMul node has no output"))
      require(add.inputs.length == 2, s"onnx: Add needs 2 inputs, got ${add.inputs.length}")
      require(add.inputs.contains(mmOut), "onnx: Add must consume the MatMul output")
      val bName = add.inputs.filterNot(_ == mmOut) match {
        case Seq(one) => one
        case _ => throw new IllegalArgumentException(
          "onnx: Add needs exactly one bias operand beside the MatMul output")
      }
      val bT = initOf(bName, "Add")
      require(bT.dims.length == 1 && bT.dims.head.toInt == dOut,
        s"onnx: Add bias '${bT.name}' length does not match layer width $dOut")
      val w = quantized(wT)
      val t = new Array[Int](w.length)
      var i = 0
      while (i < dIn) {
        var j = 0
        while (j < dOut) { t(j * dIn + i) = w(i * dOut + j); j += 1 }
        i += 1
      }
      Layer(dIn, dOut, t, quantized(bT))
    }

    val (l1, l2) = ns.map(_.opType) match {
      case Seq("Gemm", "Relu", "Gemm") =>
        // dataflow: Relu consumes Gemm1's output, Gemm2 consumes Relu's
        require(ns(1).inputs.headOption == ns(0).outputs.headOption,
          "onnx: Relu input is not the first Gemm's output")
        require(ns(2).inputs.headOption == ns(1).outputs.headOption,
          "onnx: second Gemm's input is not the Relu output")
        (gemmLayer(ns(0)), gemmLayer(ns(2)))
      case Seq("MatMul", "Add", "Relu", "MatMul", "Add") =>
        require(ns(2).inputs.headOption == ns(1).outputs.headOption,
          "onnx: Relu input is not the first Add's output")
        val graphIn = ns(0).inputs.headOption.getOrElse(
          throw new IllegalArgumentException("onnx: first MatMul has no inputs"))
        val reluOut = ns(2).outputs.headOption.getOrElse(
          throw new IllegalArgumentException("onnx: Relu node has no output"))
        (matmulAddLayer(ns(0), ns(1), graphIn),
          matmulAddLayer(ns(3), ns(4), reluOut))
      case other => throw new IllegalArgumentException(
        "onnx: expected Gemm/Relu/Gemm or MatMul/Add/Relu/MatMul/Add, got " +
          other.mkString("/"))
    }
    require(l2.dIn == l1.dOut, s"onnx: W2 inner dim ${l2.dIn} != W1 outer dim ${l1.dOut}")
    NeuralModel(l1.dIn, l1.dOut, l2.dOut, l1.w, l1.b, l2.w, l2.b)
  }

  def readFile(path: String): NeuralModel =
    read(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  // --------------------------------------------------------------- write

  private final class Writer {
    val out = new ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0L) { out.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def bytesField(field: Int, b: Array[Byte]): Unit = { tag(field, 2); varint(b.length); out.write(b) }
    def stringField(field: Int, s: String): Unit = bytesField(field, s.getBytes("UTF-8"))
    def varintField(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def floatField(field: Int, f: Float): Unit = {
      tag(field, 5)
      val bits = java.lang.Float.floatToIntBits(f)
      out.write(bits & 0xFF); out.write((bits >> 8) & 0xFF)
      out.write((bits >> 16) & 0xFF); out.write((bits >> 24) & 0xFF)
    }
    def result(): Array[Byte] = out.toByteArray
  }

  private def tensorBytes(name: String, dims: Seq[Int], data: Array[Int]): Array[Byte] = {
    val w = new Writer
    dims.foreach(d => w.varintField(1, d.toLong))
    w.varintField(2, 1L) // FLOAT
    w.stringField(8, name)
    val raw = java.nio.ByteBuffer.allocate(4 * data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    data.foreach(v => raw.putFloat(v.toFloat))
    w.bytesField(9, raw.array())
    w.result()
  }

  private def attrFloat(name: String, v: Float): Array[Byte] = {
    val w = new Writer
    w.stringField(1, name); w.floatField(2, v); w.varintField(20, 1L) // type FLOAT
    w.result()
  }
  private def attrInt(name: String, v: Long): Array[Byte] = {
    val w = new Writer
    w.stringField(1, name); w.varintField(3, v); w.varintField(20, 2L) // type INT
    w.result()
  }

  private def nodeBytes(op: String, ins: Seq[String], outs: Seq[String],
                        attrs: Seq[Array[Byte]]): Array[Byte] = {
    val w = new Writer
    ins.foreach(w.stringField(1, _))
    outs.foreach(w.stringField(2, _))
    w.stringField(4, op)
    attrs.foreach(w.bytesField(5, _))
    w.result()
  }

  /** Tensor value-info (name + float tensor type with a symbolic batch
    * dim) — enough for netron/onnxruntime to accept the file as a
    * well-formed model, not load-bearing for [[read]].
    */
  private def valueInfoBytes(name: String, width: Int): Array[Byte] = {
    val dimN = { val w = new Writer; w.stringField(2, "N"); w.result() } // dim_param
    val dimW = { val w = new Writer; w.varintField(1, width.toLong); w.result() } // dim_value
    val shape = { val w = new Writer; w.bytesField(1, dimN); w.bytesField(1, dimW); w.result() }
    val tensorType = { val w = new Writer; w.varintField(1, 1L); w.bytesField(2, shape); w.result() }
    val typ = { val w = new Writer; w.bytesField(1, tensorType); w.result() }
    val w = new Writer
    w.stringField(1, name); w.bytesField(2, typ)
    w.result()
  }

  private def finishModel(g: Writer): Array[Byte] = {
    val opset = { val w = new Writer; w.stringField(1, ""); w.varintField(2, 13L); w.result() }
    val model = new Writer
    model.varintField(1, 8L) // ir_version
    model.stringField(2, "graft")
    model.bytesField(7, g.result())
    model.bytesField(8, opset)
    model.result()
  }

  /** Serialize the model as a valid one-graph ONNX file (opset 13). */
  def write(m: NeuralModel): Array[Byte] = {
    val gemmAttrs = Seq(attrFloat("alpha", 1.0f), attrFloat("beta", 1.0f),
      attrInt("transB", 1L))
    val g = new Writer
    g.bytesField(1, nodeBytes("Gemm", Seq("x", "W1", "B1"), Seq("h0"), gemmAttrs))
    g.bytesField(1, nodeBytes("Relu", Seq("h0"), Seq("h"), Seq.empty))
    g.bytesField(1, nodeBytes("Gemm", Seq("h", "W2", "B2"), Seq("y"), gemmAttrs))
    g.stringField(2, "graft_quantized_mlp")
    g.bytesField(5, tensorBytes("W1", Seq(m.d1, m.d0), m.w1))
    g.bytesField(5, tensorBytes("B1", Seq(m.d1), m.b1))
    g.bytesField(5, tensorBytes("W2", Seq(m.dOut, m.d1), m.w2))
    g.bytesField(5, tensorBytes("B2", Seq(m.dOut), m.b2))
    g.bytesField(11, valueInfoBytes("x", m.d0))
    g.bytesField(12, valueInfoBytes("y", m.dOut))
    finishModel(g)
  }

  /** Serialize the SAME model in the other common export spelling —
    * MatMul(x, W) -> Add -> Relu -> MatMul -> Add with weights stored
    * [in, out] (the TF/keras-style export; Gemm transB=1 is the
    * PyTorch-style one). [[read]] accepts both and lowers them onto the
    * identical NeuralModel, so the two byte streams are
    * forward-pass-equivalent by construction.
    */
  def writeMatMulAdd(m: NeuralModel): Array[Byte] = {
    def transposed(w: Array[Int], dOut: Int, dIn: Int): Array[Int] = {
      val t = new Array[Int](w.length)
      var i = 0
      while (i < dOut) {
        var j = 0
        while (j < dIn) { t(j * dOut + i) = w(i * dIn + j); j += 1 }
        i += 1
      }
      t
    }
    val g = new Writer
    g.bytesField(1, nodeBytes("MatMul", Seq("x", "W1"), Seq("mm0"), Seq.empty))
    g.bytesField(1, nodeBytes("Add", Seq("mm0", "B1"), Seq("h0"), Seq.empty))
    g.bytesField(1, nodeBytes("Relu", Seq("h0"), Seq("h"), Seq.empty))
    g.bytesField(1, nodeBytes("MatMul", Seq("h", "W2"), Seq("mm1"), Seq.empty))
    g.bytesField(1, nodeBytes("Add", Seq("mm1", "B2"), Seq("y"), Seq.empty))
    g.stringField(2, "graft_quantized_mlp_matmul")
    g.bytesField(5, tensorBytes("W1", Seq(m.d0, m.d1), transposed(m.w1, m.d1, m.d0)))
    g.bytesField(5, tensorBytes("B1", Seq(m.d1), m.b1))
    g.bytesField(5, tensorBytes("W2", Seq(m.d1, m.dOut), transposed(m.w2, m.dOut, m.d1)))
    g.bytesField(5, tensorBytes("B2", Seq(m.dOut), m.b2))
    g.bytesField(11, valueInfoBytes("x", m.d0))
    g.bytesField(12, valueInfoBytes("y", m.dOut))
    finishModel(g)
  }

  def writeFile(m: NeuralModel, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, write(m)): Unit
  }
}
