package graft

import org.apache.spark.sql.functions._

/** r13 grandfather burn-down (the r12 verdict's #4): scalar / hand-
  * derivation specs for the riskiest queries the mechanical
  * scalar-spec gate had frozen on operator-suite evidence alone.
  * Batch 1 — q73 (token-budget integer division), q74 (CMS bound +
  * exact-top-k tie law), q75 (canonical keep tie order), q77
  * (boilerplate strict-df law + short-doc branch), q35 (IVF
  * probe-list selection edges). Batch 2 — the hash-signature/distance
  * kernels: q119 (unrestricted-DL-not-OSA variant pin + independent
  * DP), q21 (signed-min minhash slots, 4-slot band boundaries,
  * ≥-threshold), q22 (simhash tie-sets-bit law, 16-bit pigeonhole
  * bands, exact hamming verify), q23 (rotl5-xor order-sensitive fold
  * vs unsigned-mod bag hash), q57 (Gopher repetition ratios incl. the
  * n<2 branch and the >1 coverage ratio). The r10 trap class these
  * close: both engines can share the same wrong primitive semantics,
  * so only an INDEPENDENT scalar re-derivation — not the oracle hash —
  * can catch a drifted kernel. */
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

  // --- round-13 batch 2: the hash-signature / distance kernels --------------
  //
  // q119, q21, q22, q23, q57 — five more out of the frozen set. These are
  // the queries whose primitives (FNV chains, band boundaries, signed-min
  // conventions, tie signs, variant pins) both engines could share WRONG,
  // which the oracle hash can never catch; each gets an independent scalar
  // model in plain Scala from the documented definitions.

  /** Scalar FNV-1a-64 over UTF-8 bytes — re-derived from the FNV spec,
    * independent of TextHashKernels. */
  private def fnv(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.getBytes("UTF-8").foreach { b => h = (h ^ (b & 0xffL)) * 1099511628211L }
    h
  }

  private def toksOf(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  /** Scalar shingle list (Dedup.shinglesOf contract: k-windows joined by
    * one space; fewer than k tokens ⇒ ONE shingle of all tokens). */
  private def shinglesOf(ts: Seq[String], k: Int): Seq[String] = {
    val nSh = math.max(ts.length - k, 0) + 1
    (0 until nSh).map(i => ts.slice(i, math.min(i + k, ts.length)).mkString(" "))
  }

  private def writeDocsTable(dir: java.nio.file.Path,
      rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, txt) => (id, txt, "en", "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("q119 scalar law: UNRESTRICTED Damerau (Lowrance–Wagner), not OSA — CA→ABC is 2, and the full query re-derives from an independent DP") {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    // independent scalar model: textbook da/db formulation written from
    // the Lowrance–Wagner recurrence over CODE POINTS
    def dl(sa: String, sb: String): Int = {
      val a = sa.codePoints().toArray; val b = sb.codePoints().toArray
      val n = a.length; val m = b.length
      if (n == 0) return m
      if (m == 0) return n
      val inf = n + m
      val d = Array.fill(n + 2, m + 2)(0)
      d(0)(0) = inf
      for (i <- 0 to n) { d(i + 1)(0) = inf; d(i + 1)(1) = i }
      for (j <- 0 to m) { d(0)(j + 1) = inf; d(1)(j + 1) = j }
      val da = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
      for (i <- 1 to n) {
        var db = 0
        for (j <- 1 to m) {
          val k = da(b(j - 1)); val l = db
          val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
          d(i + 1)(j + 1) = Seq(d(i)(j) + cost, d(i + 1)(j) + 1,
            d(i)(j + 1) + 1, d(k)(l) + (i - k - 1) + 1 + (j - l - 1)).min
        }
        da(a(i - 1)) = i
      }
      d(n + 1)(m + 1)
    }
    // the variant-discriminating pins (hand-verified, not model-derived):
    //   OSA("CA","ABC") = 3; unrestricted DL = 2 (transpose CA→AC, insert B)
    //   OSA cannot edit INSIDE a transposed pair; DL charges the gap
    assert(dl("CA", "ABC") == 2)
    assert(dl("ABC", "CA") == 2)
    assert(dl("ab", "ba") == 1 && dl("abc", "acb") == 1)
    assert(dl("a cat", "an act") == 2)   // insert 'n', transpose "ca"→"ac"
    assert(dl("abcdef", "abcdef") == 0 && dl("", "xyz") == 3)
    // engine expression ≡ the independent model on the pins + a fuzz band
    val probe = Seq(("CA", "ABC"), ("ABC", "CA"), ("ab", "ba"), ("abc", "acb"),
      ("a cat", "an act"), ("", "xyz"), ("kitten", "sitting"),
      ("transpose", "tranpsose"), ("xx", "xxyy"))
    val got = probe.toDF("a", "b")
      .select(column(graft.functions.DamerauLevenshtein(
        expression(col("a")), expression(col("b")))).as("dl"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == probe.map { case (a, b) => dl(a, b) })
    // and the QUERY output re-derives: its dl column is the model's value
    // over consecutive part names, sim = 1 - dl/max(len)
    val dir = tempDir("q119-hand")
    Seq((1L, "maroon antique olive"), (2L, "maroon antiqeu olive"),
        (3L, "olive maroon antique"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val q = graft.ops.ScaleOps9.q119Damerau(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("p_partkey"), r.getAs[Int]("dl"),
        r.getAs[Double]("sim"))).toSeq
    val names = Map(1L -> "maroon antique olive", 2L -> "maroon antiqeu olive",
      3L -> "olive maroon antique")
    val expect = Seq(1L, 2L).map { id =>
      val (na, nb) = (names(id), names(id + 1))
      val d = dl(na, nb)
      (id, d, 1.0 - d.toDouble / math.max(na.length, nb.length).toDouble)
    }
    assert(q == expect)
    // adjacent-transposition typo ("antiqeu") is distance 1: the dl arm
    // must beat plain levenshtein (2) on exactly this class
    assert(q.head._2 == 1)
  }

  test("q21 scalar law: minhash signature = SIGNED min of (fnv(shingle) xor seed)*prime per slot; banding at 4-slot boundaries; est_jaccard = matches/32 with >= threshold") {
    val dir = tempDir("q21-hand")
    val base = (1 to 12).map(i => s"tok$i").mkString(" ")
    val rows = Seq(
      (1L, base),                                    // identical pair 1-2
      (2L, base),
      (3L, (1 to 11).map(i => s"tok$i").mkString(" ") + " zzz"), // near-dup of 1
      (4L, (1 to 12).map(i => s"other$i").mkString(" ")))        // unrelated
    writeDocsTable(dir, rows)
    // scalar model from the documented definition
    val golden = -7046029254386353131L
    def sig(text: String): Seq[Long] = {
      val shs = shinglesOf(toksOf(text), 3).map(fnv)
      (0 until 32).map { s =>
        val seed = (s + 1) * golden
        shs.map(h => (h ^ seed) * 1099511628211L).min  // SIGNED Long min
      }
    }
    val sigs = rows.map { case (id, t) => id -> sig(t) }.toMap
    val expect = (for {
      a <- rows.map(_._1); b <- rows.map(_._1) if a < b
      sa = sigs(a); sb = sigs(b)
      // candidates iff ANY 4-slot band agrees entirely
      if (0 until 8).exists(bd => sa.slice(bd * 4, bd * 4 + 4) == sb.slice(bd * 4, bd * 4 + 4))
      est = (0 until 32).count(i => sa(i) == sb(i)).toDouble / 32.0
      if est >= 0.5
    } yield (a, b, est)).sortBy(p => (p._1, p._2))
    val got = graft.ops.ScaleOps.q21MinhashLsh(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard"))).toSeq
    assert(got == expect)
    // the identical pair MUST estimate exactly 1.0, and it must be present
    assert(got.contains((1L, 2L, 1.0)))
    // doc 4 shares no shingle with anything: a signature that ever pairs
    // it would mean the per-slot seeds collapsed
    assert(got.forall(p => p._1 != 4L && p._2 != 4L))
  }

  test("q22 scalar law: simhash bit = sign of the per-bit vote with TIES SET (counter >= 0 -> 1); 16-bit band pigeonhole; exact hamming verify <= 3") {
    val dir = tempDir("q22-hand")
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      (1L, base),
      (2L, base),                                     // hamming 0
      (3L, (1 to 39).map(i => s"w$i").mkString(" ") + " flip"), // near
      (4L, (1 to 40).map(i => s"v$i").mkString(" ")))           // far
    writeDocsTable(dir, rows)
    def simhashScalar(text: String): Long = {
      val counters = new Array[Int](64)
      toksOf(text).foreach { t =>
        val h = fnv(t)
        (0 until 64).foreach { b =>
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1 }
      }
      (0 until 64).foldLeft(0L) { (acc, b) =>
        if (counters(b) >= 0) acc | (1L << b) else acc } // TIE -> bit SET
    }
    val hs = rows.map { case (id, t) => id -> simhashScalar(t) }.toMap
    val expect = (for {
      a <- rows.map(_._1); b <- rows.map(_._1) if a < b
      // candidate iff some 16-bit band agrees (maxDist 3 -> 4 bands)
      if (0 until 4).exists(bd =>
        ((hs(a) >>> (bd * 16)) & 0xffffL) == ((hs(b) >>> (bd * 16)) & 0xffffL))
      ham = java.lang.Long.bitCount(hs(a) ^ hs(b))
      if ham <= 3
    } yield (a, b, ham)).sortBy(p => (p._1, p._2))
    val got = graft.ops.ScaleOps.q22Simhash(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSeq
    assert(got == expect)
    assert(got.contains((1L, 2L, 0)), "identical docs must pair at hamming 0")
    // the empty-ish tie law pinned directly: a zero-token vote vector is
    // all ties, and ties set the bit — the all-ones fingerprint
    assert(simhashScalar("") == -1L)
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val engineEmpty = Seq(Seq.empty[String]).toDF("tk")
      .select(column(graft.functions.SimHash64(expression(col("tk")))))
      .collect().head.getLong(0)
    assert(engineEmpty == -1L)
  }

  test("q23 scalar law: fingerprint = rotl5-xor LEFT fold (order-sensitive, seed 0); bag_hash = sum of fnv mod 2^31-1 UNSIGNED (order-free) — permuted docs split exactly one of the two") {
    val dir = tempDir("q23-hand")
    val rows = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"),  // permutation of 1
      (3L, "alpha beta gamma delta"))  // identical to 1
    writeDocsTable(dir, rows)
    def fp(text: String): Long =
      toksOf(text).foldLeft(0L)((acc, t) =>
        ((acc << 5) | (acc >>> 59)) ^ fnv(t))
    def bag(text: String): Long =
      toksOf(text).map(t =>
        java.lang.Long.remainderUnsigned(fnv(t), 2147483647L)).sum
    val got = graft.ops.ScaleOps.q23Fingerprint(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("fingerprint"),
        r.getAs[Long]("bag_hash"))).toSeq
    assert(got == rows.map { case (id, t) => (id, fp(t), bag(t)) })
    val byId = got.map(r => r._1 -> r).toMap
    // the pair of laws that makes the two hashes a dedup instrument:
    assert(byId(1L)._2 != byId(2L)._2,
      "fingerprint must be ORDER-SENSITIVE: a permuted doc gets a new one")
    assert(byId(1L)._3 == byId(2L)._3,
      "bag_hash must be ORDER-FREE: a permuted doc keeps it")
    assert(byId(1L)._2 == byId(3L)._2 && byId(1L)._3 == byId(3L)._3)
    // unsigned-mod pin: a token whose fnv is NEGATIVE as a signed long
    // must fold as UNSIGNED remainder — a floorMod (or abs) arm computes
    // a different value (2⁶⁴ ≡ 4 mod 2³¹−1, so the two arms differ by
    // exactly 4 for every negative hash), and the engine's one-token bag
    // hash discriminates. Short same-prefix tokens all hash into one
    // positive band, so the probe pool uses longer varied tokens;
    // "neg10x" is a known-negative member (hand-checked: fnv =
    // −3976726914049493464, unsigned mod 150461965, floor mod 150461961).
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val neg = (1 to 2000).map(i => s"neg${i}x").find { t =>
      fnv(t) < 0 && java.lang.Long.remainderUnsigned(fnv(t), 2147483647L) !=
        java.lang.Math.floorMod(fnv(t), 2147483647L)
    }.get
    assert(fnv("neg10x") == -3976726914049493464L,
      "scalar fnv model drifted from the hand-checked constant")
    val engineBag = Seq(Seq(neg)).toDF("tk")
      .select(column(graft.functions.BagHash64(expression(col("tk")))))
      .collect().head.getLong(0)
    assert(engineBag == java.lang.Long.remainderUnsigned(fnv(neg), 2147483647L))
    assert(engineBag != java.lang.Math.floorMod(fnv(neg), 2147483647L))
  }

  test("q57 scalar law: dup_token_frac = 1 - distinct/n; top_bigram_frac = 2*max adjacent-bigram multiplicity/n with the n<2 -> 0.0 branch") {
    val dir = tempDir("q57-hand")
    val rows = Seq(
      (1L, "a b a b a b c"),  // n=7, distinct=3, top bigram "a b" x3
      (2L, "x y z"),          // no repetition: dup 0, top bigram 1
      (3L, "solo"),           // n=1: the n<2 branch -> 0.0 (NOT NaN/null)
      (4L, "t t t t"))        // n=4, distinct=1, "t t" x3
    writeDocsTable(dir, rows)
    def stats(text: String): (Int, Double, Double) = {
      val ts = toksOf(text)
      val n = ts.length
      val dup = 1.0 - ts.distinct.length.toDouble / n.toDouble
      val top = if (n < 2) 0.0 else {
        val best = ts.sliding(2).toSeq.groupBy(identity).values.map(_.size).max
        2.0 * best.toDouble / n.toDouble
      }
      (n, dup, top)
    }
    val got = graft.ops.ScaleOps.q57Repetition(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
        r.getAs[Double]("dup_token_frac"), r.getAs[Double]("top_bigram_frac"))).toSeq
    assert(got == rows.map { case (id, t) =>
      val (n, d, tb) = stats(t); (id, n, d, tb) })
    val byId = got.map(r => r._1 -> r).toMap
    // hand values (not model-derived): "a b" appears 3x in 7 tokens
    assert(byId(1L) == ((1L, 7, 1.0 - 3.0 / 7.0, 6.0 / 7.0)))
    assert(byId(3L) == ((3L, 1, 0.0, 0.0)))
    assert(byId(4L) == ((4L, 4, 0.75, 1.5)),
      "top_bigram_frac is a COVERAGE ratio (2*count/n) and may exceed 1 on a run of one token — the documented Gopher-style semantics")
  }
}
