package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.{NeuralEmbed, OnnxMlp}

/** Property coverage for the ONNX carrier: EVERY well-formed quantized
  * MLP must survive write -> read bit-exactly (the property a model
  * artifact lives or dies by), at any shape and any int8-range weights
  * — the hand-picked shapes in OnnxSpec cannot cover the dim-swap
  * space the way random rectangles do.
  */
object OnnxProperties extends Properties("graft.onnx") {

  private val dims = Gen.choose(1, 24)
  private val weight = Gen.choose(-127, 127)

  private def model: Gen[NeuralEmbed.NeuralModel] = for {
    d0 <- dims; d1 <- dims; dOut <- dims
    w1 <- Gen.containerOfN[Array, Int](d1 * d0, weight)
    b1 <- Gen.containerOfN[Array, Int](d1, weight)
    w2 <- Gen.containerOfN[Array, Int](dOut * d1, weight)
    b2 <- Gen.containerOfN[Array, Int](dOut, weight)
  } yield NeuralEmbed.NeuralModel(d0, d1, dOut, w1, b1, w2, b2)

  property("write -> read round-trips every weight, bias, and dim") =
    forAll(model) { m =>
      val got = OnnxMlp.read(OnnxMlp.write(m))
      got.d0 == m.d0 && got.d1 == m.d1 && got.dOut == m.dOut &&
        got.w1.sameElements(m.w1) && got.b1.sameElements(m.b1) &&
        got.w2.sameElements(m.w2) && got.b2.sameElements(m.b2)
    }

  property("writeMatMulAdd -> read round-trips at any rectangle (transpose cannot hide)") =
    forAll(model) { m =>
      val got = OnnxMlp.read(OnnxMlp.writeMatMulAdd(m))
      got.d0 == m.d0 && got.d1 == m.d1 && got.dOut == m.dOut &&
        got.w1.sameElements(m.w1) && got.b1.sameElements(m.b1) &&
        got.w2.sameElements(m.w2) && got.b2.sameElements(m.b2)
    }

  property("any byte-level truncation into the graph refuses, never misreads") =
    forAll(model, Gen.choose(1, 40)) { (m, cut) =>
      val bytes = OnnxMlp.write(m)
      // cut somewhere inside the tensor payloads (the last ~40 bytes of
      // the graph hold W2/B2 raw_data plus value infos)
      val truncated = bytes.dropRight(math.min(cut + 10, bytes.length - 4))
      try { OnnxMlp.read(truncated); false } // silent success = misread
      catch { case _: IllegalArgumentException => true }
    }
}
