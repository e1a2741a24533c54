package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Naive Bayes weak-supervision classifier: pinned to an independent
  * scalar replica of the grid arithmetic, plus separation on a corpus
  * where the classes have disjoint marker tokens, OOV smoothing, and
  * the one-class guard.
  */
class QualityClassifierSuite extends SparkSpec {
  import spark.implicits._

  private def grid(x: Double): Long = math.floor(math.log(x) * 10000).toLong

  /** Scalar NB replica (string-keyed, map-based — a different data
    * layout than the operator's hash-keyed aggregation).
    */
  private def ref(docs: Seq[(Long, String, Boolean)], score: Seq[(Long, String)])
      : Map[Long, (Long, Double, Boolean)] = {
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val cp = scala.collection.mutable.Map.empty[String, Long]
    val cn = scala.collection.mutable.Map.empty[String, Long]
    for ((_, t, l) <- docs; w <- toks(t))
      if (l) cp(w) = cp.getOrElse(w, 0L) + 1 else cn(w) = cn.getOrElse(w, 0L) + 1
    val vocab = (cp.keySet ++ cn.keySet)
    val (np, nn, v) = (cp.values.sum, cn.values.sum, vocab.size.toLong)
    val dp = docs.count(_._3).toLong
    val dn = docs.size - dp
    val prior = grid(dp.toDouble / (dp + dn)) - grid(dn.toDouble / (dp + dn))
    def delta(w: String): Long =
      grid((cp.getOrElse(w, 0L) + 1.0) / (np + v)) -
        grid((cn.getOrElse(w, 0L) + 1.0) / (nn + v))
    score.flatMap { case (id, t) =>
      val ws = toks(t)
      if (ws.isEmpty) None
      else {
        val s = ws.map(delta).sum + prior
        Some(id -> ((ws.size.toLong, s / 10000.0, s > 0)))
      }
    }.toMap
  }

  test("matches the scalar replica exactly (self-train, repeats, OOV via cross-score)") {
    val train = Seq(
      (1L, "good clean prose prose text", true),
      (2L, "good text here", true),
      (3L, "spam spam buy buy now", false),
      (4L, "buy now spam", false),
      (5L, "text prose now", true))
    val docs = train.map { case (i, t, l) => (i, t, l) }.toDF("id", "text", "lbl")
    val m = QualityClassifier.train(docs, "text", col("lbl"))
    // cross-score a frame with an OOV token ("unseen") and an empty doc
    val target = Seq((10L, "good prose"), (11L, "buy spam unseen"), (12L, "  "))
    val got = QualityClassifier
      .scoreWith(target.toDF("id", "text"), "id", "text", m)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(got == ref(train, target))
    // self-scoring form agrees with train+scoreWith composition
    val self = QualityClassifier.score(docs, "id", "text", col("lbl"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(self == ref(train, train.map(d => (d._1, d._2))))
    // the markers separate: good/prose docs positive, spam docs negative
    assert(self(1L)._3 && self(2L)._3 && !self(3L)._3 && !self(4L)._3)
    assert(got(10L)._3 && !got(11L)._3)
  }

  test("serving kernel == batch scorer at minCount=1; pruning floors rare tokens") {
    val docs = Seq(
      (1L, "good clean prose prose text", true),
      (2L, "good text here rareword", true),
      (3L, "spam spam buy buy now", false),
      (4L, "buy now spam", false),
      (5L, "text prose now", true)).toDF("id", "text", "lbl")
    val p1 = java.nio.file.Files.createTempDirectory("nbidx1").toString
    QualityClassifier.buildNbIndex(docs, "text", col("lbl"), p1, minCount = 1)
    val m1 = QualityClassifier.loadNbModel(spark, p1)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val batch = rows(QualityClassifier.score(docs, "id", "text", col("lbl")))
    val served = rows(QualityClassifier.scoreWithModel(docs, "id", "text", m1))
    assert(served == batch)
    // minCount=2 drops singletons ("rareword", "clean", "here") to the
    // unseen floor: doc scores move, frequent-token evidence survives
    val p2 = java.nio.file.Files.createTempDirectory("nbidx2").toString
    QualityClassifier.buildNbIndex(docs, "text", col("lbl"), p2, minCount = 2)
    val m2 = QualityClassifier.loadNbModel(spark, p2)
    val pruned = rows(QualityClassifier.scoreWithModel(docs, "id", "text", m2))
    assert(pruned.keySet == batch.keySet)
    assert(pruned(3L)._3 == false && pruned(1L)._3 == true)
    // an all-frequent-token doc is untouched by the cutoff
    assert(pruned(5L) == batch(5L))
    // and one carrying a singleton moved
    assert(pruned(2L)._2 != batch(2L)._2)
    // the streaming gate keeps exactly the batch-positive docs at the
    // 0.0 boundary, with identical served scores
    val gated = graft.streaming.Streaming
      .nbGate(spark, docs, "id", "text", p2, minScore = 0.0)
      .select("id", "n_tokens", "score").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(gated == pruned.filter(_._2._3).map { case (k, v) => k -> ((v._1, v._2)) })
  }

  test("loadNbModel maxEntries guard: loud above the cap, silent below") {
    val docs = Seq(
      (1L, "good clean prose", true), (2L, "buy spam now", false),
      (3L, "prose text good", true), (4L, "spam buy", false))
      .toDF("id", "text", "lbl")
    val p = java.nio.file.Files.createTempDirectory("nbcap").toString
    QualityClassifier.buildNbIndex(docs, "text", col("lbl"), p, minCount = 1)
    val err = intercept[IllegalArgumentException] {
      QualityClassifier.loadNbModel(spark, p, maxEntries = 1L)
    }
    assert(err.getMessage.contains("raise the count cutoff"))
    QualityClassifier.loadNbModel(spark, p) // below the cap: silent
  }

  test("multiclass NB: marker separation, scalar replica, deterministic tie rule") {
    val docs = Seq(
      (1L, "aaa aaa bbb shared", "A"),
      (2L, "aaa shared shared", "A"),
      (3L, "xxx yyy shared", "B"),
      (4L, "xxx xxx yyy", "B"),
      (5L, "mmm nnn ooo", "C"),
      (6L, "mmm shared nnn", "C")).toDF("id", "text", "lbl")
    val got = QualityClassifier.predictMulticlass(docs, "id", "text", "lbl")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // scalar replica (string-keyed)
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val rows = Seq(
      (1L, "aaa aaa bbb shared", "A"), (2L, "aaa shared shared", "A"),
      (3L, "xxx yyy shared", "B"), (4L, "xxx xxx yyy", "B"),
      (5L, "mmm nnn ooo", "C"), (6L, "mmm shared nnn", "C"))
    val classes = rows.map(_._3).distinct.sorted
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((_, t, l) <- rows; w <- toks(t))
      cnt((l, w)) = cnt.getOrElse((l, w), 0L) + 1
    val vocab = rows.flatMap(r => toks(r._2)).distinct
    val nC = classes.map(c => c -> cnt.filter(_._1._1 == c).values.sum).toMap
    val v = vocab.size.toLong
    val dC = classes.map(c => c -> rows.count(_._3 == c).toLong).toMap
    def g(x: Double) = math.floor(math.log(x) * 10000).toLong
    val want = rows.map { case (id, t, _) =>
      val scores = classes.map { c =>
        val s = toks(t).map(w =>
          g((cnt.getOrElse((c, w), 0L) + 1.0) / (nC(c) + v))).sum +
          g(dC(c).toDouble / rows.size)
        (c, s)
      }
      val best = scores.minBy { case (c, s) => (-s, c) }._1
      id -> best
    }.toMap
    assert(got == want)
    // markers dominate: each doc self-classifies
    assert(got == Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B",
      5L -> "C", 6L -> "C"))
    // (the replica's minBy((-score, class)) pins the tie rule)
    // one-class corpus fails the class guard loudly
    val one = Seq((1L, "a b", "X"), (2L, "c", "X")).toDF("id", "text", "lbl")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.predictMulticlass(one, "id", "text", "lbl")
    }
    assert(e.getMessage.contains("classes"))
  }

  test("multiclass serving kernel == batch predict at minCount=1; langGate filters") {
    val docs = Seq(
      (1L, "aaa aaa bbb shared", "A"),
      (2L, "aaa shared shared", "A"),
      (3L, "xxx yyy shared", "B"),
      (4L, "xxx xxx yyy", "B"),
      (5L, "mmm nnn ooo", "C"),
      (6L, "mmm shared nnn", "C"),
      (7L, "   ", "A")).toDF("id", "text", "lbl")
    val p = java.nio.file.Files.createTempDirectory("nbmc").toString
    QualityClassifier.buildNbMulticlassIndex(docs, "text", "lbl", p, minCount = 1)
    val m = QualityClassifier.loadNbMulticlassModel(spark, p)
    val batch = QualityClassifier.predictMulticlass(docs, "id", "text", "lbl")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val served = QualityClassifier.predictWithModel(docs, "id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(served == batch)
    // the blank doc is unclassifiable on both paths
    assert(!served.contains(7L) && !batch.contains(7L))
    // gate keeps exactly the docs predicted as the keep class
    val gated = graft.streaming.Streaming
      .langGate(spark, docs, "id", "text", p, keep = "B")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gated == batch.filter(_._2 == "B").keySet)
    // unknown keep class fails loudly
    val e = intercept[IllegalArgumentException] {
      graft.streaming.Streaming.langGate(spark, docs, "id", "text", p, "nope")
    }
    assert(e.getMessage.contains("not in the model"))
    // pruning (minCount=2) floors singletons in EVERY class — still
    // agrees with a replica built from the pruned counts (markers are
    // frequent, so classification survives)
    val p2 = java.nio.file.Files.createTempDirectory("nbmc2").toString
    QualityClassifier.buildNbMulticlassIndex(docs, "text", "lbl", p2, minCount = 2)
    val m2 = QualityClassifier.loadNbMulticlassModel(spark, p2)
    val pruned = QualityClassifier.predictWithModel(docs, "id", "text", m2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pruned.keySet == batch.keySet)
    assert(pruned(1L) == "A" && pruned(3L) == "B" && pruned(5L) == "C")
  }

  test("recipe priors: skewed weights shift near-ties, scalar replica, validation") {
    val docs = Seq(
      (1L, "aaa aaa bbb shared", "A"),
      (2L, "aaa shared shared", "A"),
      (3L, "xxx yyy shared", "B"),
      (4L, "xxx xxx yyy", "B"),
      (5L, "shared shared", "A"), // near-tie doc: only the shared token
      (6L, "shared", "B")).toDF("id", "text", "lbl")
    val w = Map("A" -> 1.0, "B" -> 19.0)
    val got = QualityClassifier.predictMulticlass(docs, "id", "text", "lbl",
        priorWeights = w)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // scalar replica with the recipe-prior contract:
    // prior = floor4(ln(w_c / Σw)), Σ in sorted-class order
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val rows = Seq(
      (1L, "aaa aaa bbb shared", "A"), (2L, "aaa shared shared", "A"),
      (3L, "xxx yyy shared", "B"), (4L, "xxx xxx yyy", "B"),
      (5L, "shared shared", "A"), (6L, "shared", "B"))
    val classes = rows.map(_._3).distinct.sorted
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((_, t, l) <- rows; tk <- toks(t))
      cnt((l, tk)) = cnt.getOrElse((l, tk), 0L) + 1
    val vocab = rows.flatMap(r => toks(r._2)).distinct
    val nC = classes.map(c => c -> cnt.filter(_._1._1 == c).values.sum).toMap
    val v = vocab.size.toLong
    def g(x: Double) = math.floor(math.log(x) * 10000).toLong
    val z = classes.map(w).sum
    val want = rows.map { case (id, t, _) =>
      val scores = classes.map { c =>
        (c, toks(t).map(tk =>
          g((cnt.getOrElse((c, tk), 0L) + 1.0) / (nC(c) + v))).sum + g(w(c) / z))
      }
      id -> scores.minBy { case (c, s) => (-s, c) }._1
    }.toMap
    assert(got == want)
    // the near-tie docs follow the 19x B prior; marker docs don't flip
    assert(got(5L) == "B" && got(6L) == "B")
    assert(got(1L) == "A" && got(3L) == "B")
    // and WITHOUT the recipe, doc 5 reads A (data priors are balanced,
    // its tokens slightly favor A) — the prior knob demonstrably acts
    val plain = QualityClassifier.predictMulticlass(docs, "id", "text", "lbl")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(plain(5L) == "A")
    // validation: weights must cover the classes exactly and be positive
    for (bad <- Seq(Map("A" -> 1.0), Map("A" -> 1.0, "B" -> 1.0, "C" -> 1.0),
        Map("A" -> 0.0, "B" -> 1.0), Map("A" -> -1.0, "B" -> 1.0))) {
      val e = intercept[IllegalArgumentException] {
        QualityClassifier.predictMulticlass(docs, "id", "text", "lbl",
          priorWeights = bad)
      }
      assert(e.getMessage.contains("prior"), e.getMessage)
    }
    // loadNbMulticlassModel honors the same override
    val p = java.nio.file.Files.createTempDirectory("nbmcpri").toString
    QualityClassifier.buildNbMulticlassIndex(docs, "text", "lbl", p, minCount = 1)
    val served = QualityClassifier.predictWithModel(docs, "id", "text",
        QualityClassifier.loadNbMulticlassModel(spark, p, priorWeights = w))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(served == got)
  }

  test("labels that are not identifiers still work; null labels fail loudly") {
    // dots, backticks, and case-variant duplicates must never reach an
    // aggregation column name (index-based internal columns)
    val docs = Seq(
      (1L, "aaa aaa bbb", "x.y"), (2L, "aaa bbb bbb", "x.y"),
      (3L, "xxx yyy yyy", "`X.Y`"), (4L, "xxx xxx yyy", "`X.Y`"),
      (5L, "aaa xxx", "x.Y")).toDF("id", "text", "lbl")
    val got = QualityClassifier.predictMulticlass(docs, "id", "text", "lbl")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 5 && got.values.toSet.subsetOf(Set("x.y", "`X.Y`", "x.Y")))
    val withNull = Seq((1L, "a", "A"), (2L, "b", null: String), (3L, "c", "B"))
      .toDF("id", "text", "lbl")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.predictMulticlass(withNull, "id", "text", "lbl")
    }
    assert(e.getMessage.contains("null labels"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      QualityClassifier.buildNbMulticlassIndex(withNull, "text", "lbl",
        java.nio.file.Files.createTempDirectory("nbnull").toString)
    }
    assert(e2.getMessage.contains("null labels"), e2.getMessage)
  }

  test("one-class corpus fails loudly") {
    val docs = Seq((1L, "a b", true), (2L, "c", true)).toDF("id", "text", "lbl")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.train(docs, "text", col("lbl"))
    }
    assert(e.getMessage.contains("both classes"))
  }
}
