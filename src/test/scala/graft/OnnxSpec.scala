package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{NeuralEmbed, OnnxMlp}

class OnnxSpec extends AnyFunSuite {

  private def model = NeuralEmbed.generate(6, 4, 5)

  test("round-trip: write -> read reproduces every weight and dim") {
    val m = model
    val got = OnnxMlp.read(OnnxMlp.write(m))
    assert((got.d0, got.d1, got.dOut) === ((m.d0, m.d1, m.dOut)))
    assert(got.w1.toSeq === m.w1.toSeq)
    assert(got.b1.toSeq === m.b1.toSeq)
    assert(got.w2.toSeq === m.w2.toSeq)
    assert(got.b2.toSeq === m.b2.toSeq)
  }

  test("round-trip through a file; encoder output identical to the in-memory model") {
    val m = NeuralEmbed.generate(48, 24, 32)
    val path = java.nio.file.Files.createTempDirectory("onnx").resolve("m.onnx").toString
    OnnxMlp.writeFile(m, path)
    val got = OnnxMlp.readFile(path)
    val text = "spark window merge batch query join"
    assert(NeuralEmbed.embedQuery(text, got).toSeq ===
      NeuralEmbed.embedQuery(text, m).toSeq)
  }

  // --- hand-assembled bytes: the parser must accept encodings the
  // writer doesn't emit (packed dims, float_data instead of raw_data),
  // since a third-party exporter may use either

  private def varint(v: Long): Array[Byte] = {
    val b = Array.newBuilder[Byte]; var x = v
    while ((x & ~0x7FL) != 0) { b += ((x & 0x7F) | 0x80).toByte; x >>>= 7 }
    (b += x.toByte).result()
  }
  private def ld(field: Int, body: Array[Byte]): Array[Byte] =
    varint((field << 3) | 2) ++ varint(body.length.toLong) ++ body
  private def vi(field: Int, v: Long): Array[Byte] = varint((field << 3).toLong) ++ varint(v)
  private def f32(field: Int, f: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(f)
    varint(((field << 3) | 5).toLong) ++
      Array(bits.toByte, (bits >> 8).toByte, (bits >> 16).toByte, (bits >> 24).toByte)
  }
  private def str(field: Int, s: String): Array[Byte] = ld(field, s.getBytes("UTF-8"))

  private def tensorAlt(name: String, dims: Seq[Long], data: Seq[Float]): Array[Byte] = {
    // PACKED dims (field 1, wiretype 2) + float_data (field 4, packed)
    val packedDims = dims.toArray.flatMap(varint)
    val packedFloats = data.toArray.flatMap { f =>
      val bits = java.lang.Float.floatToIntBits(f)
      Array(bits.toByte, (bits >> 8).toByte, (bits >> 16).toByte, (bits >> 24).toByte)
    }
    ld(1, packedDims) ++ vi(2, 1L) ++ ld(4, packedFloats) ++ str(8, name)
  }
  private def node(op: String, ins: Seq[String], outs: Seq[String],
                   attrs: Seq[Array[Byte]]): Array[Byte] =
    ins.toArray.flatMap(str(1, _)) ++ outs.toArray.flatMap(str(2, _)) ++
      str(4, op) ++ attrs.toArray.flatMap(ld(5, _))
  private def attrI(name: String, v: Long): Array[Byte] =
    str(1, name) ++ vi(3, v) ++ vi(20, 2L)

  test("parser accepts packed dims + float_data and unknown fields") {
    // 2x3 W1, bias 2; 1x2 W2, bias 1 — tiny but complete
    val g =
      ld(1, node("Gemm", Seq("x", "W1", "B1"), Seq("h0"), Seq(attrI("transB", 1L)))) ++
      ld(1, node("Relu", Seq("h0"), Seq("h"), Seq.empty)) ++
      ld(1, node("Gemm", Seq("h", "W2", "B2"), Seq("y"), Seq(attrI("transB", 1L)))) ++
      str(2, "alt") ++
      ld(5, tensorAlt("W1", Seq(2L, 3L), Seq(1f, -2f, 3f, 0f, 5f, -6f))) ++
      ld(5, tensorAlt("B1", Seq(2L), Seq(7f, -7f))) ++
      ld(5, tensorAlt("W2", Seq(1L, 2L), Seq(2f, -3f))) ++
      ld(5, tensorAlt("B2", Seq(1L), Seq(4f))) ++
      str(10, "doc string the parser must skip")
    val bytes = vi(1, 8L) ++ str(2, "handmade") ++ ld(7, g)
    val m = OnnxMlp.read(bytes)
    assert((m.d0, m.d1, m.dOut) === ((3, 2, 1)))
    assert(m.w1.toSeq === Seq(1, -2, 3, 0, 5, -6))
    assert(m.b1.toSeq === Seq(7, -7))
    assert(m.w2.toSeq === Seq(2, -3))
    assert(m.b2.toSeq === Seq(4))
  }

  test("MatMul+Add spelling round-trips: same model, forward pass identical to the Gemm spelling") {
    val m = NeuralEmbed.generate(48, 24, 32) // non-square: a transposed read cannot hide
    val got = OnnxMlp.read(OnnxMlp.writeMatMulAdd(m))
    assert((got.d0, got.d1, got.dOut) === ((m.d0, m.d1, m.dOut)))
    assert(got.w1.toSeq === m.w1.toSeq)
    assert(got.b1.toSeq === m.b1.toSeq)
    assert(got.w2.toSeq === m.w2.toSeq)
    assert(got.b2.toSeq === m.b2.toSeq)
    val text = "spark window merge batch query join"
    assert(NeuralEmbed.embedQuery(text, got).toSeq ===
      NeuralEmbed.embedQuery(text, OnnxMlp.read(OnnxMlp.write(m))).toSeq)
    // bias may ride either Add operand order (commutative in exports)
    val g =
      ld(1, node("MatMul", Seq("x", "W1"), Seq("mm0"), Seq.empty)) ++
      ld(1, node("Add", Seq("B1", "mm0"), Seq("h0"), Seq.empty)) ++ // bias FIRST
      ld(1, node("Relu", Seq("h0"), Seq("h"), Seq.empty)) ++
      ld(1, node("MatMul", Seq("h", "W2"), Seq("mm1"), Seq.empty)) ++
      ld(1, node("Add", Seq("mm1", "B2"), Seq("y"), Seq.empty)) ++
      ld(5, tensorAlt("W1", Seq(3L, 2L), Seq(1f, 4f, -2f, 5f, 3f, -6f))) ++ // [in=3, out=2]
      ld(5, tensorAlt("B1", Seq(2L), Seq(7f, -7f))) ++
      ld(5, tensorAlt("W2", Seq(2L, 1L), Seq(2f, -3f))) ++
      ld(5, tensorAlt("B2", Seq(1L), Seq(4f)))
    val alt = OnnxMlp.read(vi(1, 8L) ++ ld(7, g))
    assert((alt.d0, alt.d1, alt.dOut) === ((3, 2, 1)))
    assert(alt.w1.toSeq === Seq(1, -2, 3, 4, 5, -6), "transpose to [out][in] wrong")
    assert(alt.w2.toSeq === Seq(2, -3))
  }

  test("absent-bias Gemm (2 inputs) reads as a zero bias") {
    val g =
      ld(1, node("Gemm", Seq("x", "W1"), Seq("h0"), Seq(attrI("transB", 1L)))) ++
      ld(1, node("Relu", Seq("h0"), Seq("h"), Seq.empty)) ++
      ld(1, node("Gemm", Seq("h", "W2", "B2"), Seq("y"), Seq(attrI("transB", 1L)))) ++
      ld(5, tensorAlt("W1", Seq(2L, 3L), Seq(1f, -2f, 3f, 0f, 5f, -6f))) ++
      ld(5, tensorAlt("W2", Seq(1L, 2L), Seq(2f, -3f))) ++
      ld(5, tensorAlt("B2", Seq(1L), Seq(4f)))
    val m = OnnxMlp.read(vi(1, 8L) ++ ld(7, g))
    assert((m.d0, m.d1, m.dOut) === ((3, 2, 1)))
    assert(m.b1.toSeq === Seq(0, 0), "absent C must mean a zero bias")
    assert(m.b2.toSeq === Seq(4))
  }

  test("strictness: wrong op order, missing transB, non-integral weight, dim mismatch all refuse") {
    val m = model
    val good = OnnxMlp.write(m)
    // 1. op order: swap W2/B2 Gemm for a Relu by corrupting op_type is
    // fiddly on raw bytes — instead build graphs via the test helpers
    def graph(ops: Seq[Array[Byte]], tensors: Seq[Array[Byte]]): Array[Byte] =
      vi(1, 8L) ++ ld(7, ops.toArray.flatMap(ld(1, _)) ++ tensors.toArray.flatMap(ld(5, _)))
    val t = Seq(
      tensorAlt("W1", Seq(2L, 3L), Seq(1f, 1f, 1f, 1f, 1f, 1f)),
      tensorAlt("B1", Seq(2L), Seq(0f, 0f)),
      tensorAlt("W2", Seq(1L, 2L), Seq(1f, 1f)),
      tensorAlt("B2", Seq(1L), Seq(0f)))
    val okNodes = Seq(
      node("Gemm", Seq("x", "W1", "B1"), Seq("h0"), Seq(attrI("transB", 1L))),
      node("Relu", Seq("h0"), Seq("h"), Seq.empty),
      node("Gemm", Seq("h", "W2", "B2"), Seq("y"), Seq(attrI("transB", 1L))))
    assert(OnnxMlp.read(graph(okNodes, t)).d0 === 3)
    // wrong order
    intercept[IllegalArgumentException] {
      OnnxMlp.read(graph(okNodes.reverse, t))
    }
    // missing transB
    intercept[IllegalArgumentException] {
      OnnxMlp.read(graph(Seq(
        node("Gemm", Seq("x", "W1", "B1"), Seq("h0"), Seq.empty),
        okNodes(1), okNodes(2)), t))
    }
    // non-integral weight
    intercept[IllegalArgumentException] {
      OnnxMlp.read(graph(okNodes, t.updated(0,
        tensorAlt("W1", Seq(2L, 3L), Seq(1.5f, 1f, 1f, 1f, 1f, 1f)))))
    }
    // dim/data mismatch
    intercept[IllegalArgumentException] {
      OnnxMlp.read(graph(okNodes, t.updated(0,
        tensorAlt("W1", Seq(2L, 4L), Seq(1f, 1f, 1f, 1f, 1f, 1f)))))
    }
    // truncated file (cut into the graph body, not just a trailing field)
    intercept[IllegalArgumentException] {
      OnnxMlp.read(good.dropRight(20))
    }
    // MatMul-spelling strictness: broken dataflow (Add not consuming the
    // MatMul output) and a bias-less Add both refuse
    val mmT = Seq(
      tensorAlt("W1", Seq(3L, 2L), Seq(1f, 1f, 1f, 1f, 1f, 1f)),
      tensorAlt("B1", Seq(2L), Seq(0f, 0f)),
      tensorAlt("W2", Seq(2L, 1L), Seq(1f, 1f)),
      tensorAlt("B2", Seq(1L), Seq(0f)))
    def mmNodes(addIn: Seq[String]): Seq[Array[Byte]] = Seq(
      node("MatMul", Seq("x", "W1"), Seq("mm0"), Seq.empty),
      node("Add", addIn, Seq("h0"), Seq.empty),
      node("Relu", Seq("h0"), Seq("h"), Seq.empty),
      node("MatMul", Seq("h", "W2"), Seq("mm1"), Seq.empty),
      node("Add", Seq("mm1", "B2"), Seq("y"), Seq.empty))
    assert(OnnxMlp.read(graph(mmNodes(Seq("mm0", "B1")), mmT)).d0 === 3)
    intercept[IllegalArgumentException] { // Add skips the MatMul output
      OnnxMlp.read(graph(mmNodes(Seq("x", "B1")), mmT))
    }
    intercept[IllegalArgumentException] { // both Add operands initializers
      OnnxMlp.read(graph(mmNodes(Seq("B1", "B1")), mmT))
    }
    // a 1-input Gemm is a malformed layer, not a zero-bias one
    intercept[IllegalArgumentException] {
      OnnxMlp.read(graph(Seq(
        node("Gemm", Seq("x"), Seq("h0"), Seq(attrI("transB", 1L))),
        okNodes(1), okNodes(2)), t))
    }
  }
}
