package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {

  test("mixtureHead: quotas honored, absent strata excluded, short strata capped") {
    val s = SparkTestSession.spark
    import s.implicits._
    val df = ((1 to 20).map(i => (i.toLong, "en")) ++
      (21 to 24).map(i => (i.toLong, "fr")) ++
      (25 to 26).map(i => (i.toLong, "zh"))).toDF("doc_id", "lang")
    val got = graft.operators.Sampling
      .mixtureHead(df, "lang", "doc_id", Map("en" -> 5, "fr" -> 10))
      .collect().map(r => (r.getString(1), r.getLong(0)))
    val byLang = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byLang === Map("en" -> 5, "fr" -> 4)) // fr capped at its size; zh absent
    // deterministic: same call, same rows
    val again = graft.operators.Sampling
      .mixtureHead(df, "lang", "doc_id", Map("en" -> 5, "fr" -> 10))
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(got.sorted.sameElements(again.sorted))
  }
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.sfDir

  private def docs = Tables.documents(spark, sfDir)

  test("temperatureMixture: sqrt-proportional quotas, flattening vs raw counts, budget bound") {
    val s = SparkTestSession.spark
    import s.implicits._
    // n = 100 vs 25: sqrt -> 10e9 vs 5e9 units; budget 3 -> quotas 2 and 1
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 125).map(i => (i.toLong, "small"))).toDF("doc_id", "lang")
    val got = Sampling.temperatureMixture(df, "lang", "doc_id", budget = 3L)
      .collect().map(r => r.getString(1))
    val byLang = got.groupBy(identity).view.mapValues(_.length).toMap
    assert(byLang === Map("big" -> 2, "small" -> 1))
    // alpha=1 is proportional: 4:1 on an exact 80/20 split of budget 5
    val prop = Sampling.temperatureMixture(df, "lang", "doc_id", budget = 5L, alpha = 1.0)
      .collect().map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length).toMap
    assert(prop === Map("big" -> 4, "small" -> 1))
    // flattening: alpha=0.5 gives the small stratum a LARGER share than alpha=1
    val shareHalf = byLang("small").toDouble / got.length
    val shareProp = prop("small").toDouble / prop.values.sum
    assert(shareHalf > shareProp)
    // floor split never exceeds the budget on the corpus
    val total = Sampling.temperatureMixture(docs, "lang", "doc_id", budget = 200L).count()
    assert(total <= 200L && total > 0L)
    // selection is the mixtureHead hash order: prefix-consistent with t16's machinery
    val sel = Sampling.temperatureMixture(df, "lang", "doc_id", budget = 3L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val manual = Sampling.mixtureHead(df, "lang", "doc_id", Map("big" -> 2, "small" -> 1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel === manual)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df, "lang", "doc_id", budget = 0L)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df, "lang", "doc_id", budget = 5L, alpha = 1.5)
    }
    // budget * q would overflow Long (q ~ 1e10 units here): the BigInt
    // quota path must not wrap — a quota past Int.MaxValue fails loudly
    // instead of silently dropping strata
    val huge = intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df, "lang", "doc_id", budget = Long.MaxValue)
    }
    assert(huge.getMessage.contains("exceeds Int.MaxValue"))
  }

  test("hashSample: deterministic, partition-independent, nested across fractions") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(Sampling.hashSample(docs, "doc_id", 0.3))
    val b = ids(Sampling.hashSample(docs.repartition(7), "doc_id", 0.3))
    assert(a === b, "membership must be a pure function of the id, not the partitioning")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.08, s"fraction ${a.size / n}")
    // hash thresholding gives NESTED samples: sample(0.1) subset of
    // sample(0.3) — the property scaling-law subset experiments rely on
    val small = ids(Sampling.hashSample(docs, "doc_id", 0.1))
    assert(small.subsetOf(a))
    assert(ids(Sampling.hashSample(docs, "doc_id", 0.0)).isEmpty)
    assert(ids(Sampling.hashSample(docs, "doc_id", 1.0)).size === n.toInt)
  }

  test("stratifiedHead: exactly k per stratum, deterministic, salt-sensitive") {
    val s1 = Sampling.stratifiedHead(docs, "lang", "doc_id", k = 5)
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ === 5L), s"per-stratum counts: $counts")
    val again = Sampling.stratifiedHead(docs, "lang", "doc_id", k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === first) // replayable
    val other = Sampling.stratifiedHead(docs, "lang", "doc_id", k = 5, salt = "other")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other !== first) // salt rotates the permutation
  }

  test("hashSplit: appending rows never reassigns existing rows' splits") {
    import spark.implicits._
    val w = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val base = (1L to 400L).toDF("id")
    val before = Sampling.hashSplit(base, "id", w)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grown = (1L to 600L).toDF("id").repartition(7)
    val after = Sampling.hashSplit(grown, "id", w)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    before.foreach { case (id, split) => assert(after(id) === split,
      s"row $id moved from $split to ${after(id)} when the dataset grew") }
    // all three splits materialize, proportions are roughly honored
    val counts = after.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("hashSplit normalizes relative weights and rejects non-positive ones") {
    import spark.implicits._
    val df = (1L to 200L).toDF("id")
    val a = Sampling.hashSplit(df, "id", Seq(("x", 8.0), ("y", 2.0)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(df, "id", Seq(("x", 0.8), ("y", 0.2)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq(("x", 1.0), ("y", 0.0)))
    }
  }

  test("importanceWeights: target-like docs outscore raw-only docs; totals consistent") {
    import spark.implicits._
    // target slice (lang=en) speaks {aaa,bbb}; the rest speak {xxx,yyy}.
    // A scored doc made of target vocabulary must outrank one made of
    // background vocabulary under any bucket hashing.
    val docs = (
      (1L to 20L).map(i => (i, "aaa bbb aaa bbb aaa", "en")) ++
      (21L to 40L).map(i => (i, "xxx yyy xxx yyy xxx", "de")) ++
      Seq((41L, "aaa bbb aaa", "de"), (42L, "xxx yyy xxx", "de"))
    ).toDF("doc_id", "text", "lang")
    val out = Sampling.importanceWeights(docs, "doc_id", "text",
      org.apache.spark.sql.functions.col("lang") === "en", buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size === 42)
    assert(out(41L)._1 === 3L && out(42L)._1 === 3L)
    assert(out(41L)._2 > out(42L)._2,
      s"target-vocab doc must outscore background doc: ${out(41L)} vs ${out(42L)}")
    // en docs themselves score like doc 41 (same vocabulary)
    assert(out(1L)._2 > out(21L)._2)
  }

  test("importanceWeights: ratio is never NULL (p_raw floored at one quantum)") {
    import spark.implicits._
    // a bucket whose raw probability quantizes low must still divide:
    // greatest(p_raw_q, 1) keeps the ratio defined for every bucket, so
    // sum(ratio_q)/count never silently skips NULL terms
    val docs = (
      (1L to 30L).map(i => (i, s"w$i common filler tokens here", "en")) ++
      (31L to 60L).map(i => (i, s"rare$i singleton", "de"))
    ).toDF("doc_id", "text", "lang")
    val out = Sampling.importanceWeights(docs, "doc_id", "text",
      org.apache.spark.sql.functions.col("lang") === "en", buckets = 8)
    assert(out.filter(out("mean_ratio_q").isNull).count() === 0)
    assert(out.count() === 60)
  }

  test("systematicSample: exactly k positions, weight-proportional coverage, partition-invariant") {
    import spark.implicits._
    // one huge doc among small ones: it must cover multiple positions
    val docs = ((1L to 40L).map(i => (i, ("w " * 10).trim)) :+
      (41L, ("w " * 400).trim)).toDF("doc_id", "text")
    val out = Sampling.systematicSample(docs, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.map(_._1).sorted === (0L until 8L))          // every position once
    val heavy = out.count(_._2 == 41L)
    // doc 41 holds 400 of 800 tokens -> ~half the positions
    assert(heavy >= 3 && heavy <= 5, s"heavy doc covered $heavy of 8")
    val out7 = Sampling.systematicSample(docs.repartition(7), "doc_id", "text",
      k = 8, numPartitions = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out7 === out)
    // refusal when the corpus has fewer weight units than positions
    val tiny = Seq((1L, "a b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Sampling.systematicSample(tiny, "doc_id", "text", k = 10)
    }
    assert(e.getMessage.contains("sample positions"))
  }

  test("importanceWeights: deterministic under repartitioning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions.col
    val a = Sampling.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en").orderBy("id").collect().toSeq
    val b = Sampling.importanceWeights(docs.repartition(7), "doc_id", "text",
      col("lang") === "en").orderBy("id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
