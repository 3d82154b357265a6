package graft

import org.apache.spark.sql.functions._

/** r13 grandfather burn-down (the r12 verdict's #4): scalar / hand-
  * derivation specs for the five riskiest queries the mechanical
  * scalar-spec gate had frozen on operator-suite evidence alone — q73
  * (token-budget integer division), q74 (CMS bound + exact-top-k tie
  * law), q75 (canonical keep tie order), q77 (boilerplate strict-df
  * law + short-doc branch), q35 (IVF probe-list selection edges). The
  * r10 trap class these close: both engines can share the same wrong
  * primitive semantics, so only an INDEPENDENT scalar re-derivation —
  * not the oracle hash — can catch a drifted kernel. */
class GrandfatherScalarSpec extends GraftSuite {
  import spark.implicits._

  // --- q73: token-budget planning --------------------------------------------

  test("q73 scalar law: target tokens FLOOR-divide (never round) and deficits surface — hand-derived BigInt plan") {
    // sources: a = 7 tokens weight 3, b = 5 tokens weight 1.
    // total = 12, Σw = 4, budget 1/2 ⇒ den = 8.
    //   target_a = 36 div 8 = 4  ← 4.5 floors to 4: a rounding (or double)
    //   target_b = 12 div 8 = 1  ← 1.5 floors to 1    arm would say 5 / 2
    val docs = Seq(
      ("a", "w1 w2 w3 w4"), ("a", "w5 w6 w7"),
      ("b", "v1 v2 v3 v4 v5"))
      .toDF("source", "text")
      .withColumn("n_tokens",
        size(graft.text.TextAnalysis.tokens(col("text"))).cast("long"))
    val weight = when(col("source") === "a", 3L).otherwise(1L)
    val got = graft.pipeline.Packing.tokenBudgetPlan(
        docs, "source", "n_tokens", weight, budgetNum = 1L, budgetDen = 2L)
      .orderBy("source")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("avail_tokens"),
        r.getAs[Long]("target_tokens"), r.getAs[Long]("alloc_tokens"),
        r.getAs[Long]("deficit_tokens"), r.getAs[Double]("keep_rate"))).toSeq
    // independent BigInt re-derivation of the documented formula
    def target(w: Long, total: Long, sw: Long): Long =
      ((BigInt(w) * total * 1) / (BigInt(sw) * 2)).toLong
    assert(got == Seq(
      ("a", 7L, target(3, 12, 4), 4L, 0L, 4.0 / 7.0),
      ("b", 5L, target(1, 12, 4), 1L, 0L, 1.0 / 5.0)))
    assert(got.map(_._3) == Seq(4L, 1L),
      "targets must FLOOR (4.5→4, 1.5→1); a rounding arm would plan 5/2")

    // deficit case: c holds 1 token but weight 4 demands 3 — the
    // over-allocation must surface as deficit, not silently cap
    val docs2 = docs.unionByName(Seq(("c", "z1")).toDF("source", "text")
      .withColumn("n_tokens", lit(1L)))
    val w2 = when(col("source") === "a", 3L)
      .when(col("source") === "c", 4L).otherwise(1L)
    val got2 = graft.pipeline.Packing.tokenBudgetPlan(
        docs2, "source", "n_tokens", w2, 1L, 2L)
      .orderBy("source")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("target_tokens"),
        r.getAs[Long]("alloc_tokens"), r.getAs[Long]("deficit_tokens"))).toSeq
    // total = 13, Σw = 8, den = 16: targets = 39/16=2, 13/16=0, 52/16=3
    assert(got2 == Seq(("a", 2L, 2L, 0L), ("b", 0L, 0L, 0L), ("c", 3L, 1L, 2L)))
  }

  // --- q74: heavy hitters + CMS ----------------------------------------------

  test("q74 scalar law: exact top-k tie order is (count DESC, token ASC), share denominator is ALL occurrences, CMS never underestimates any token") {
    val docs = Seq("x x x y y z", "x y z w w").toDF("text")
    // hand counts: x:4 y:3 w:2 z:2 — w and z TIE at 2; token-asc puts w
    // before z. total = 11 occurrences (every token, not just the top-k).
    val got = graft.text.HeavyHitters.topTokensWithSketchCheck(
        docs, "text", k = 10)
      .orderBy("rank")
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("token"),
        r.getAs[Long]("n"), r.getAs[Double]("share"),
        r.getAs[Boolean]("cms_no_underestimate"),
        r.getAs[Boolean]("cms_within_eps"))).toSeq
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Seq((1, "x", 4L), (2, "y", 3L), (3, "w", 2L), (4, "z", 2L)),
      s"tie law broken: $got")
    assert(got.map(_._4) == Seq(4.0 / 11, 3.0 / 11, 2.0 / 11, 2.0 / 11),
      "share must divide by ALL token occurrences, not the top-k's sum")
    assert(got.forall(t => t._5 && t._6))
    // the CMS structural law re-checked INDEPENDENTLY of the query arm,
    // over every distinct token (the literal-true mirror can never catch
    // a drifted bound — only this can): estimate ≥ exact, always
    val cms = graft.text.HeavyHitters.tokenSketch(docs, "text")
    val exact = Map("x" -> 4L, "y" -> 3L, "w" -> 2L, "z" -> 2L)
    exact.foreach { case (tok, n) =>
      val est = cms.estimateCount(tok)
      assert(est >= n, s"CMS underestimated $tok: $est < $n")
      assert(est <= n + math.max(10.0, 5.0 * 0.0001 * 11).toLong,
        s"CMS overestimate out of band for $tok: $est vs $n")
    }
  }

  // --- q75: canonical-representative selection --------------------------------

  test("q75 scalar law: keep order is (quality DESC, n_chars DESC, doc_id ASC) — each tiebreak pinned on a planted cluster") {
    // one cluster, four docs engineered so every key level decides once:
    //   14: all-stopword text → quality ≈ 0.816 (highest) though SHORT
    //   12: alpha text, 30 chars, quality 0.7
    //   11 and 13: IDENTICAL 20-char alpha text → full tie → id asc
    val texts = Map(
      11L -> "abcdefghi jklmnopqrs",
      12L -> "abcdefghi jklmnopqrs uvwxyzabc",
      13L -> "abcdefghi jklmnopqrs",
      14L -> "the of and in to on at by is it")
    val docs = texts.toSeq.map { case (id, t) => (id, t) }.toDF("doc_id", "text")
    val clusters = texts.keys.toSeq.map(id => (id, 10L)).toDF("doc_id", "cluster_id")
    val got = graft.dedup.Dedup.canonicalKeepFromClusters(
        docs, clusters, "doc_id", "text")
      .orderBy("pick_rank")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pick_rank"),
        r.getAs[Boolean]("keep"), r.getAs[Double]("quality"))).toSeq

    // INDEPENDENT scalar quality: 0.4·alphaRatio + 0.3·min(stopRatio·4, 1)
    // + 0.3·min(avgWordLen/8, 1), with avgWordLen = chars/tokens (spaces
    // included in chars — the documented q17 arithmetic, re-implemented
    // here without reusing the Column kernel)
    val stop = graft.text.TextAnalysis.Stopwords("en")
    def quality(t: String): Double = {
      val lower = t.toLowerCase
      val alpha = lower.count(c => (c >= 'a' && c <= 'z') || c == ' ').toDouble / lower.length
      val toks = lower.trim.split("\\s+").toSeq
      val stopR = toks.count(stop.contains).toDouble / toks.size
      val awl = lower.length.toDouble / toks.size
      0.4 * alpha + 0.3 * math.min(stopR * 4.0, 1.0) + 0.3 * math.min(awl / 8.0, 1.0)
    }
    got.foreach { case (id, _, _, q) =>
      assert(math.abs(q - quality(texts(id))) < 1e-12,
        s"doc $id quality ${q} != scalar ${quality(texts(id))}") }
    val expectOrder = texts.toSeq
      .sortBy { case (id, t) => (-quality(t), -t.length.toLong, id) }
      .map(_._1)
    assert(got.map(_._1) == expectOrder)
    // every tiebreak level fires: 14 by quality, 12 over 11 by length,
    // 11 over 13 by id — pin the literal order so a reordered sort key
    // cannot hide inside a coincidentally-agreeing scalar sort
    assert(got.map(_._1) == Seq(14L, 12L, 11L, 13L), s"got $got")
    assert(got.map(_._3) == Seq(true, false, false, false), "exactly rank 1 keeps")
  }

  // --- q77: boilerplate share --------------------------------------------------

  test("q77 scalar law: common means df STRICTLY > commonDf, and sub-k docs shingle as ONE whole-doc shingle") {
    val docs = Seq(
      (1L, "p q r"),         // 1 shingle "p q r" (df 3 → common)
      (2L, "p q r"),
      (3L, "x p q r y"),     // 3 shingles: "x p q", "p q r", "q r y"
      (4L, "u v w"),         // "u v w" df = 2 — NOT > 2 → not common
      (5L, "u v w"),
      (6L, "hi"))            // < k tokens → whole doc is its one shingle
      .toDF("doc_id", "text")
    val got = graft.text.Relevance.boilerplateShare(
        docs, "doc_id", "text", k = 3, commonDf = 2L)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_common"), r.getAs[Double]("boilerplate_share"))).toSeq
    // independent scalar re-derivation over shingle STRINGS
    def shingles(t: String): Set[String] = {
      val ts = t.trim.toLowerCase.split("\\s+").toSeq
      if (ts.length < 3) Set(ts.mkString(" "))
      else (0 to ts.length - 3).map(i => ts.slice(i, i + 3).mkString(" ")).toSet
    }
    val all = Seq(1L -> "p q r", 2L -> "p q r", 3L -> "x p q r y",
      4L -> "u v w", 5L -> "u v w", 6L -> "hi")
    val df = all.flatMap { case (_, t) => shingles(t) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = all.map { case (id, t) =>
      val sh = shingles(t)
      val common = sh.count(s => df(s) > 2L).toLong
      (id, sh.size.toLong, common, common.toDouble / sh.size) }
    assert(got == expect)
    // the strict-inequality pin: df=2 ("u v w") is NOT common; df=3 is
    assert(got.find(_._1 == 4L).get._3 == 0L, "df == commonDf must NOT count")
    assert(got.find(_._1 == 1L).get._3 == 1L, "df > commonDf must count")
    assert(got.find(_._1 == 6L).get._2 == 1L, "sub-k doc must carry ONE whole-doc shingle")
  }

  // --- q35: IVF probe-list edges ------------------------------------------------

  test("q35 scalar law: probe selection is top-nProbe centroids by (cos DESC, centroid_id ASC); empty lists and nProbe > k are safe; assignment tie keeps the first argmax") {
    import graft.sim.Ivf
    val cents = Array(
      0 -> Array(1.0f, 0.0f),
      1 -> Array(0.0f, 1.0f),
      2 -> Array(0.95f, 0.05f))
    val corpus = Seq(
      (100L, Seq(1.0f, 0.0f)),    // → list 0
      (101L, Seq(0.0f, 1.0f)),    // → list 1
      (103L, Seq(0.9f, 0.3f)))    // cos c2 ≈ .964 > cos c0 ≈ .949 → list 2
      .toDF("vec_id", "embedding")
    val assigned = Ivf.assign(corpus, "vec_id", "embedding", cents)
    val asg = assigned.select("corpus_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asg == Map(100L -> 0, 101L -> 1, 103L -> 2), s"assignment drifted: $asg")
    val idx = Ivf.IvfIndex(cents, assigned)
    val query = Seq((200L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    def ids(nProbe: Int): Seq[Long] =
      Ivf.search(idx, query, topK = 5, nProbe = nProbe)
        .orderBy("rank").collect().map(_.getAs[Long]("corpus_id")).toSeq
    // query [1,0]: centroid cosines 1.0 (c0), .9986 (c2), 0 (c1) — so
    // nProbe=1 sees only list 0; nProbe=2 sees lists {0,2} and vector
    // 101 MUST be absent (the probe-pruning law the mirror restates);
    // nProbe=5 > k degrades to brute force over all lists
    assert(ids(1) == Seq(100L))
    assert(ids(2) == Seq(100L, 103L), "list 1 must be pruned at nProbe=2")
    assert(ids(5) == Seq(100L, 103L, 101L))

    // duplicate-centroid tie: [1,0] scores 1.0 against BOTH c0 and c2dup
    // — assignment keeps the FIRST argmax (strict >), and a probe of the
    // duplicate's EMPTY list is harmless
    val cDup = Array(0 -> Array(1.0f, 0.0f), 1 -> Array(0.0f, 1.0f),
      2 -> Array(1.0f, 0.0f))
    val asgDup = Ivf.assign(corpus.filter($"vec_id" === 100L),
        "vec_id", "embedding", cDup)
      .select("corpus_id", "centroid_id").head()
    assert(asgDup.getInt(1) == 0, "tie must keep the lowest centroid id")
    // under the dup quantizer EVERY [1,0]-leaning vector first-argmaxes
    // into list 0 (103 ties c0/c2 at .9487 → c0), so list 2 is EMPTY;
    // nProbe=2 probes {0, 2} and the empty probed list must neither
    // widen nor break the result — exactly lists 0's two vectors
    val idxDup = Ivf.IvfIndex(cDup,
      Ivf.assign(corpus, "vec_id", "embedding", cDup))
    val asgAll = Ivf.assign(corpus, "vec_id", "embedding", cDup)
      .select("corpus_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asgAll == Map(100L -> 0, 101L -> 1, 103L -> 0),
      s"dup-quantizer assignment drifted: $asgAll")
    assert(Ivf.search(idxDup, query, topK = 5, nProbe = 2)
      .orderBy("rank").collect().map(_.getAs[Long]("corpus_id")).toSeq
      == Seq(100L, 103L),
      "nProbe=2 over {list 0, empty list 2} must return exactly list 0's vectors")

    // hand tie-break on PROBE selection itself: two identical centroids,
    // one vector planted in each list by hand — the probe must pick
    // centroid 0 (id asc on the cosine tie), so only ITS vector returns
    val handLists = Seq((300L, Seq(1.0f, 0.0f), 0), (301L, Seq(1.0f, 0.0f), 1))
      .toDF("corpus_id", "cv", "centroid_id")
      .withColumn("cnorm", lit(1.0))
    val idxHand = Ivf.IvfIndex(
      Array(0 -> Array(1.0f, 0.0f), 1 -> Array(1.0f, 0.0f)), handLists)
    assert(Ivf.search(idxHand, query, topK = 5, nProbe = 1)
      .collect().map(_.getAs[Long]("corpus_id")).toSeq == Seq(300L),
      "probe tie must break by centroid_id ASC")
  }
}
