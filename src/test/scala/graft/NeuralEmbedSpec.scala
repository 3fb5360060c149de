package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Embed, NeuralEmbed}

class NeuralEmbedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val model = NeuralEmbed.generate(32, 16, 24)

  test("weights are quantized to [-7, 7] and deterministic in (seed, index)") {
    val all = model.w1 ++ model.b1 ++ model.w2 ++ model.b2
    assert(all.forall(w => w >= -7 && w <= 7))
    assert(NeuralEmbed.generate(32, 16, 24).w1.toSeq === model.w1.toSeq)
    // seeds separate the layers: same index, different stream
    assert(NeuralEmbed.weight(NeuralEmbed.SeedW1, 0) !=
      NeuralEmbed.weight(NeuralEmbed.SeedW2, 0) ||
      NeuralEmbed.weight(NeuralEmbed.SeedW1, 1) !=
      NeuralEmbed.weight(NeuralEmbed.SeedW2, 1))
  }

  test("weight artifact round-trips through parquet exactly") {
    val path = "/tmp/graft_nn_spec_artifact"
    NeuralEmbed.save(spark, model, path)
    val back = NeuralEmbed.load(spark, path)
    assert(back.d0 === model.d0 && back.d1 === model.d1 && back.dOut === model.dOut)
    assert(back.w1.toSeq === model.w1.toSeq && back.b1.toSeq === model.b1.toSeq)
    assert(back.w2.toSeq === model.w2.toSeq && back.b2.toSeq === model.b2.toSeq)
  }

  test("forward pass: deterministic, text-functional, bias path for empty text") {
    val enc = new NeuralEmbed.Encoder(model)
    val a = enc.encode("alpha beta gamma")
    val b = enc.encode("alpha beta gamma")
    assert(a.toSeq === b.toSeq)
    assert(a.length === model.dOut)
    // integer-exact floats
    assert(a.forall(v => v == math.rint(v)))
    // the empty bag takes the bias-only path: y = W2 ReLU(b1) + b2 —
    // a real MLP property (callers filter empties upstream, as x4 does)
    val empty = enc.encode("  ")
    val expectEmpty = {
      val h = Array.tabulate(model.d1)(i => math.max(model.b1(i), 0).toLong)
      Array.tabulate(model.dOut) { k =>
        (model.b2(k) + (0 until model.d1)
          .map(i => model.w2(k * model.d1 + i) * h(i)).sum).toFloat
      }
    }
    assert(empty.toSeq === expectEmpty.toSeq)
    // a different bag of tokens maps elsewhere
    assert(enc.encode("delta epsilon zeta").toSeq !== a.toSeq)
  }

  test("float32-exact bound raises loudly instead of rounding") {
    val enc = new NeuralEmbed.Encoder(model)
    // one token repeated: a single input bucket accumulates T, pushing
    // some activation past 2^24
    val huge = Array.fill(200000)("tok").mkString(" ")
    val e = intercept[IllegalStateException] { enc.encode(huge) }
    assert(e.getMessage.contains("float32-exact bound"))
  }

  test("batch encode equals driver-side encode; repartition-invariant") {
    import spark.implicits._
    val texts = Seq(
      (1L, "spark window merge"), (2L, "batch query join"),
      (3L, "spark window merge"), (4L, "totally different words"))
    val ds = texts.toDF("id", "text").as[Embed.TextRow]
    val got = NeuralEmbed.embedText(ds, model)
      .collect().map(r => r.id -> r.embedding.toSeq).toMap
    val enc = new NeuralEmbed.Encoder(model)
    texts.foreach { case (id, t) =>
      assert(got(id) === enc.encode(t).toSeq, s"row $id diverged")
    }
    // identical text -> identical embedding (pure function of the bag)
    assert(got(1L) === got(3L))
    val got7 = NeuralEmbed.embedText(
      ds.repartition(7).as[Embed.TextRow], model)
      .collect().map(r => r.id -> r.embedding.toSeq).toMap
    assert(got7 === got)
  }

  test("search sanity: the exact-text document is the nearest neighbor") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark window merge batch query join"),
      (2L, "alpha beta gamma delta"),
      (3L, "one two three four five six")).toDF("id", "text")
      .as[Embed.TextRow]
    val emb = NeuralEmbed.embedText(docs, model).toDF()
    val probe = NeuralEmbed.embedQuery("spark window merge batch query join", model)
    val top = graft.operators.Knn.topK(emb, col("embedding"), probe,
      k = 1, tieBreak = col("id")).select("id").head().getLong(0)
    assert(top === 1L)
  }

  test("load refuses duplicated, missing, and out-of-range weight cells") {
    import spark.implicits._
    val small = NeuralEmbed.generate(4, 3, 2)
    val path = "/tmp/graft_nn_spec_cells"
    NeuralEmbed.save(spark, small, path)
    val rows = spark.read.parquet(path)
      .as[(String, Int, Int, Int)].collect().toSeq

    def write(rs: Seq[(String, Int, Int, Int)]): String = {
      rs.toDF("layer", "i", "j", "w").coalesce(1)
        .write.mode("overwrite").parquet(path + "_mut")
      path + "_mut"
    }
    // duplicate one w1 cell AND drop another: row count still matches,
    // so only cell-level tracking can catch the silent zero weight
    val w1rows = rows.filter(_._1 == "w1")
    val mutated = rows.filterNot(_ == w1rows.last) :+ w1rows.head
    val e1 = intercept[IllegalArgumentException] {
      NeuralEmbed.load(spark, write(mutated))
    }
    assert(e1.getMessage.contains("appears twice"))
    // out-of-range j on w1 (j == d0): must be a contract error, not an
    // aliased cell or a raw ArrayIndexOutOfBoundsException
    val e2 = intercept[IllegalArgumentException] {
      NeuralEmbed.load(spark, write(rows :+ (("w1", 0, small.d0, 1))))
    }
    assert(e2.getMessage.contains("outside"))
    // plainly missing cell
    val e3 = intercept[IllegalArgumentException] {
      NeuralEmbed.load(spark, write(rows.filterNot(_ == w1rows.head)))
    }
    assert(e3.getMessage.contains("of"))
  }

  test("load refuses an artifact without its dims row") {
    import spark.implicits._
    Seq(("w1", 0, 0, 3)).toDF("layer", "i", "j", "w")
      .write.mode("overwrite").parquet("/tmp/graft_nn_spec_bad")
    val e = intercept[IllegalArgumentException] {
      NeuralEmbed.load(spark, "/tmp/graft_nn_spec_bad")
    }
    assert(e.getMessage.contains("dims"))
  }
}
