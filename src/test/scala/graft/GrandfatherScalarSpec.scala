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
    // the count-table-built sketch (the r18 q74 fast path) must land
    // BIT-IDENTICAL estimates to the occurrence-stream sketch: CMS
    // counting is commutative addition, add(token, n) == n adds
    val counts = docs.sparkSession.createDataFrame(exact.toSeq)
      .toDF("token", "n")
    val cms2 = graft.text.HeavyHitters.tokenSketchFromCounts(counts)
    (exact.keys ++ Seq("absent")).foreach { tok =>
      assert(cms2.estimateCount(tok) == cms.estimateCount(tok),
        s"count-built CMS diverged on $tok")
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

  // --- round-13 batch 3: media-decode + float-kernel queries ----------------
  //
  // q79, q80, q81, q20, q34. The decode family is the STRONGEST case of
  // the r10 trap class: the DuckDB mirrors re-derive outputs from the
  // fixture FORMULA (never touching bytes), so a header-layout bug shared
  // by the in-repo encoder AND decoder is invisible to the oracle. The
  // independent instruments here: literal hand-rolled bytes written from
  // the PUBLISHED file layouts (not via Wav.encode/Mp4.encode), an
  // independent little-endian/big-endian test parser, and — for WAV —
  // the JDK's own javax.sound reference parser.

  /** Hand-rolled WAV builder: literal byte layout from the RIFF/WAVE
    * spec, independent of graft.multimodal.Wav.encode. */
  private def handWav(ch: Int, sr: Int, bits: Int, samples: Seq[Int],
      preDataChunks: Seq[Byte] = Nil): Array[Byte] = {
    def u16(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def u32(v: Long) = Seq(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def cc(s: String) = s.getBytes("US-ASCII").toSeq
    val bps = bits / 8
    val data =
      if (bits == 8) samples.map(v => (v + 128).toByte)
      else samples.flatMap(v => u16(v & 0xffff))
    val pad = if (data.size % 2 == 1) Seq(0.toByte) else Nil
    val fmt = cc("fmt ") ++ u32(16) ++ u16(1) ++ u16(ch) ++ u32(sr.toLong) ++
      u32(sr.toLong * ch * bps) ++ u16(ch * bps) ++ u16(bits)
    val payload = cc("WAVE") ++ fmt ++ preDataChunks ++
      cc("data") ++ u32(data.size.toLong) ++ data ++ pad
    (cc("RIFF") ++ u32(payload.size.toLong) ++ payload).toArray
  }

  /** Independent WAV parser (java.nio ByteBuffer LE reads — a different
    * implementation idiom than Wav.decode's manual masking). */
  private def parseWav(b: Array[Byte]): (Int, Int, Int, Seq[Int]) = {
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE")
    var i = 12
    var (ch, sr, bits) = (0, 0, 0)
    var samples: Seq[Int] = null
    while (i + 8 <= b.length && samples == null) {
      val id = new String(b, i, 4, "US-ASCII"); val sz = bb.getInt(i + 4)
      if (id == "fmt ") {
        ch = bb.getShort(i + 10).toInt; sr = bb.getInt(i + 12)
        bits = bb.getShort(i + 22).toInt
      }
      if (id == "data")
        samples = if (bits == 8) (0 until sz).map(j => (b(i + 8 + j) & 0xff) - 128)
                  else (0 until sz / 2).map(j => bb.getShort(i + 8 + 2 * j).toInt)
      i += 8 + sz + (sz & 1)
    }
    (ch, sr, bits, samples)
  }

  test("q79 scalar law: hand-rolled RIFF bytes decode exactly (chunk skip, pad byte, refusal grammar); javax.sound independently confirms the fixture headers; full query re-derives via an independent LE parser") {
    import graft.multimodal.Wav
    // 16-bit stereo with a LIST chunk (odd size -> pad byte) BEFORE data:
    // unknown-chunk skip and word alignment both on the path
    val list = "LIST".getBytes("US-ASCII").toSeq ++
      Seq[Byte](3, 0, 0, 0) ++ "abc".getBytes("US-ASCII").toSeq ++ Seq(0.toByte)
    val w1 = handWav(2, 8000, 16, Seq(1000, -2000, 3000, -4000), list)
    val a1 = Wav.decode(w1)
    assert(a1 != null && a1.channels == 2 && a1.sampleRate == 8000 &&
      a1.bitsPerSample == 16 && a1.samples.toSeq == Seq(1000, -2000, 3000, -4000))
    assert(a1.nFrames == 2L && a1.durationMs == 0L) // floor(2*1000/8000)
    // 8-bit mono, odd data size (pad byte after data): disk bytes are
    // UNSIGNED and center at -128..127 — 0x00 -> -128, 0x80 -> 0, 0xFF -> 127
    val w2 = handWav(1, 11025, 8, Seq(-128, 0, 127))
    val a2 = Wav.decode(w2)
    assert(a2 != null && a2.samples.toSeq == Seq(-128, 0, 127) &&
      a2.bitsPerSample == 8 && w2.length % 2 == 0)
    // refusal grammar, each from a hand-mutated valid file
    def mut(b: Array[Byte])(f: Array[Byte] => Unit): Array[Byte] = {
      val c = b.clone(); f(c); c }
    assert(Wav.decode(mut(w2)(_(3) = 'X'.toByte)) == null)       // RIFX magic
    assert(Wav.decode(mut(w2)(_(20) = 2.toByte)) == null)        // non-PCM codec id
    assert(Wav.decode(mut(w2)(_(32) = 2.toByte)) == null)        // blockAlign contradiction
    assert(Wav.decode(w2.take(40)) == null)                      // truncated
    // data BEFORE fmt must refuse (the stream can't be interpreted yet)
    val dataFirst = {
      def cc(s: String) = s.getBytes("US-ASCII").toSeq
      val d = cc("data") ++ Seq[Byte](2, 0, 0, 0) ++ Seq[Byte](1, 2)
      val f = cc("fmt ") ++ Seq[Byte](16, 0, 0, 0) ++
        Seq[Byte](1, 0, 1, 0) ++ Seq[Byte](0x40, 0x1f, 0, 0) ++
        Seq[Byte](0x40, 0x1f, 0, 0) ++ Seq[Byte](1, 0, 8, 0)
      val payload = cc("WAVE") ++ d ++ f
      (cc("RIFF") ++ Seq[Byte]((payload.size & 0xff).toByte, 0, 0, 0) ++ payload).toArray
    }
    assert(Wav.decode(dataFirst) == null)
    // the JDK's own WAV parser agrees with the fixture's headers — an
    // encoder bug shared with our decoder cannot hide from this one
    (0L to 9L).foreach { id =>
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(Wav.fixtureBytes(id)))
      val f = aff.getFormat
      assert(f.getChannels == (1 + id % 2).toInt, s"id $id channels")
      assert(f.getSampleRate == (8000 + (id % 4) * 2000).toFloat, s"id $id rate")
      assert(f.getSampleSizeInBits == (if (id % 3 == 0) 8 else 16), s"id $id bits")
      assert(aff.getFrameLength == (4 + id % 5).toInt, s"id $id frames")
    }
    // full query output re-derived through the INDEPENDENT parser
    val dir = tempDir("q79-hand")
    writeDocsTable(dir, (0L to 9L).map(id => (id, s"doc $id")))
    val got = graft.ops.ScaleOps4.q79WavDecode(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("n_bytes"),
        r.getAs[Int]("channels"), r.getAs[Int]("sample_rate"),
        r.getAs[Int]("bits_per_sample"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("duration_ms"), r.getAs[Int]("peak_abs"),
        r.getAs[Double]("mean_abs"))).toSeq
    val expect = (0L to 9L).map { id =>
      val bytes = Wav.fixtureBytes(id)
      val (ch, sr, bits, ss) = parseWav(bytes)
      (id, bytes.length.toLong, ch, sr, bits, (ss.length / ch).toLong,
        ss.length / ch * 1000L / sr, ss.map(math.abs).max,
        ss.map(v => math.abs(v).toLong).sum.toDouble / ss.length.toDouble)
    }
    assert(got == expect)
  }

  test("q80 scalar law: zero crossings compare sample j to its PER-CHANNEL neighbor j-ch with the >= 0 sign (0 is non-negative); silence threshold is the integer 2^(bits-1)/100; rms = sqrt(sum_sq/n)") {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    def analyze(bytes: Array[Byte]): (Long, Long, Long, Double, Double) = {
      val r = Seq(Tuple1(bytes)).toDF("content")
        .select(column(graft.multimodal.WavAnalyze(
          expression(col("content")))).as("st"))
        .select(col("st.n_samples"), col("st.zero_crossings"),
          col("st.n_silent"), col("st.silence_ratio"), col("st.rms"))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    }
    // hand pins on hand-rolled bytes (16-bit thr = 32768/100 = 327):
    // mono [5,-5,5]: crossings at j=1 and j=2; all |v| < 327 silent
    assert(analyze(handWav(1, 8000, 16, Seq(5, -5, 5))) ==
      ((3L, 2L, 3L, 1.0, 5.0)))
    // the 0-is-non-negative sign law: [0,-1] is ONE crossing, [-1,0] too
    assert(analyze(handWav(1, 8000, 16, Seq(0, -1)))._2 == 1L)
    assert(analyze(handWav(1, 8000, 16, Seq(-1, 0)))._2 == 1L)
    // stereo neighbors are j-2, not j-1: [L=0 R=-1][L=0 R=-1] never crosses
    assert(analyze(handWav(2, 8000, 16, Seq(0, -1, 0, -1)))._2 == 0L)
    // 8-bit thr = 128/100 = 1: ONLY exact zero counts as silent
    val (_, _, sil8, _, _) = analyze(handWav(1, 8000, 8, Seq(0, 1, -1, 100)))
    assert(sil8 == 1L)
    // full query vs the independent parser + scalar laws
    val dir = tempDir("q80-hand")
    writeDocsTable(dir, (0L to 9L).map(id => (id, s"doc $id")))
    val got = graft.ops.ScaleOps4.q80AudioStats(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("n_samples"),
        r.getAs[Long]("zero_crossings"), r.getAs[Long]("n_silent"),
        r.getAs[Double]("silence_ratio"), r.getAs[Double]("rms"))).toSeq
    val expect = (0L to 9L).map { id =>
      val (ch, _, bits, ss) = parseWav(graft.multimodal.Wav.fixtureBytes(id))
      val thr = (1 << (bits - 1)) / 100
      val zc = ss.indices.count(j => j >= ch && (ss(j) >= 0) != (ss(j - ch) >= 0))
      val sil = ss.count(v => math.abs(v) < thr)
      val sumSq = ss.map(v => v.toLong * v).sum
      (id, ss.length.toLong, zc.toLong, sil.toLong,
        sil.toDouble / ss.length.toDouble,
        math.sqrt(sumSq.toDouble / ss.length.toDouble))
    }
    assert(got == expect)
  }

  test("q81 scalar law: hand-rolled ISO-BMFF bytes (v0 AND v1 mvhd) probe to the planted fields; no-ftyp/zero-timescale refuse; full query re-derives via an independent BE parser") {
    import graft.multimodal.Mp4
    def be32(v: Long) = Seq((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def cc(s: String) = s.getBytes("US-ASCII").toSeq
    def box(typ: String, payload: Seq[Byte]): Seq[Byte] =
      be32(8L + payload.size) ++ cc(typ) ++ payload
    // v0 mvhd: ver/flags + ctime + mtime + timescale + duration + rate +
    // volume + 2 reserved + 8 reserved + 36 matrix + 24 predefined + next id
    val mvhdV0 = box("mvhd", Seq[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(5500) ++ be32(0x00010000L) ++
      Seq[Byte](1, 0, 0, 0) ++ Seq.fill[Byte](8)(0) ++
      Seq.fill[Byte](36)(0) ++ Seq.fill[Byte](24)(0) ++ be32(1))
    val handV0 = (box("ftyp", cc("isom") ++ be32(0)) ++ box("moov", mvhdV0) ++
      box("mdat", Seq[Byte](1, 2, 3))).toArray
    val m0 = Mp4.decode(handV0)
    assert(m0 == Mp4.Meta("isom", 1000, 5500L, 3))
    assert(m0.durationMs == 5500L)
    // v1 mvhd carries 64-bit times: a duration beyond 2^32 pins the be64 read
    val mvhdV1 = box("mvhd", Seq[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(90000) ++ be64(5000000000L) ++ be32(0x00010000L) ++
      Seq[Byte](1, 0, 0, 0) ++ Seq.fill[Byte](8)(0) ++
      Seq.fill[Byte](36)(0) ++ Seq.fill[Byte](24)(0) ++ be32(1))
    val handV1 = (box("ftyp", cc("mp42") ++ be32(0)) ++ box("moov", mvhdV1)).toArray
    val m1 = Mp4.decode(handV1)
    assert(m1 == Mp4.Meta("mp42", 90000, 5000000000L, 2))
    assert(m1.durationMs == 5000000000L * 1000L / 90000L)
    // refusals: no ftyp; zero timescale
    assert(Mp4.decode((box("moov", mvhdV0) ++ box("mdat", Seq[Byte](1))).toArray) == null)
    val mvhdZeroTs = box("mvhd", Seq[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(5500) ++ be32(0x00010000L) ++ Seq[Byte](1, 0, 0, 0) ++
      Seq.fill[Byte](8)(0) ++ Seq.fill[Byte](36)(0) ++ Seq.fill[Byte](24)(0) ++ be32(1))
    assert(Mp4.decode(
      (box("ftyp", cc("isom") ++ be32(0)) ++ box("moov", mvhdZeroTs)).toArray) == null)
    // full query output re-derived via an independent BE walk of the fixture
    val dir = tempDir("q81-hand")
    writeDocsTable(dir, (0L to 9L).map(id => (id, s"doc $id")))
    val got = graft.ops.ScaleOps4.q81Mp4Probe(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("n_bytes"),
        r.getAs[String]("major_brand"), r.getAs[Int]("timescale"),
        r.getAs[Long]("duration"), r.getAs[Long]("duration_ms"),
        r.getAs[Int]("n_top_boxes"))).toSeq
    val expect = (0L to 9L).map { id =>
      val b = Mp4.fixtureBytes(id)
      val bb = java.nio.ByteBuffer.wrap(b) // BIG-endian by default: the BMFF order
      var (i, nTop) = (0, 0)
      var brand: String = null; var ts = 0; var dur = 0L
      while (i < b.length) {
        val sz = bb.getInt(i); val typ = new String(b, i + 4, 4, "US-ASCII")
        nTop += 1
        if (typ == "ftyp") brand = new String(b, i + 8, 4, "US-ASCII")
        if (typ == "moov") {
          // child walk: find mvhd, read v0 fields at fixed offsets
          var j = i + 8
          while (j < i + sz) {
            val csz = bb.getInt(j)
            if (new String(b, j + 4, 4, "US-ASCII") == "mvhd") {
              assert(b(j + 8) == 0, "fixture writes v0 movie headers")
              ts = bb.getInt(j + 8 + 12); dur = bb.getInt(j + 8 + 16).toLong
            }
            j += csz
          }
        }
        i += sz
      }
      (id, b.length.toLong, brand, ts, dur, dur * 1000L / ts, nTop)
    }
    assert(got == expect)
  }

  test("q20 scalar law: cos = in-order float->double dot / (sqrt-norm product); selection is top-5 by (cos DESC, corpus_id ASC) excluding self; duplicate vectors tie-break by id") {
    // independent scalar model from the documented accumulation order
    def dotD(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def model(vecs: Seq[(Long, Seq[Float])], k: Int)
        : Seq[(Long, Int, Long, Double)] =
      vecs.filter(_._1 < 20).sortBy(_._1).flatMap { case (qid, qv) =>
        val qn = math.sqrt(dotD(qv, qv))
        vecs.filter(_._1 != qid)
          .map { case (cid, cv) =>
            (cid, dotD(cv, qv) / (math.sqrt(dotD(cv, cv)) * qn)) }
          .sortBy { case (cid, cos) => (-cos, cid) }
          .take(k).zipWithIndex
          .map { case ((cid, cos), r) => (qid, r + 1, cid, cos) }
      }
    // planted corpus with EXACT duplicate vectors: ids 3 and 4 are the
    // same vector, so their cos ties bit-for-bit and id order decides
    val dir = tempDir("q20-hand")
    val base = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.5f, 0.5f, 0.1f)),
      (4L, Seq(0.5f, 0.5f, 0.1f)),
      (5L, Seq(-1.0f, 0.0f, 0.0f)))
    base.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.ops.ScaleOps.q20AnnBruteForce(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("corpus_id"), r.getAs[Double]("cos"))).toSeq
    assert(got == model(base, 5))
    // the tie rows, pinned by hand: for query 3 the duplicate vector 4
    // maximizes cos (≈1.0 — NOT asserted exactly 1.0: sqrt(acc)² can be
    // an ulp off acc, and the model must reproduce the engine's exact
    // expression, not an idealized one) and must take rank 1; for every
    // query the 3-before-4 order holds wherever their cos ties
    val q3 = got.filter(_._1 == 3L)
    assert(q3.head._2 == 1 && q3.head._3 == 4L)
    assert(math.abs(q3.head._4 - 1.0) < 1e-9)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val r3 = rows.find(_._3 == 3L).map(_._2)
      val r4 = rows.find(_._3 == 4L).map(_._2)
      if (r3.isDefined && r4.isDefined)
        assert(r3.get < r4.get, "equal-cos tie must order by corpus_id")
    }
    // differential at sf0.001: engine == model over the real 500 vectors
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val gotReal = graft.ops.ScaleOps.q20AnnBruteForce(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("corpus_id"), r.getAs[Double]("cos"))).toSeq
    assert(gotReal == model(real, 5))
  }

  test("q34 scalar law: percentile is linear interpolation at position p*(n-1) over the sorted group; exact-hit positions interpolate to the value itself; engine == independent model at sf0.001") {
    // the shared definition both engines implement — in the exact FLOAT
    // FORM they use: the TWO-SIDED weighted sum lower·(hi−pos) +
    // higher·(pos−lo), NOT the algebraically-equal one-sided
    // lower + frac·(higher−lower), which differs by an ulp on real data
    // (measured on sf0.001 'O'/p90: 451016.341 vs …34099999996 — this
    // test exists to pin exactly such form-level drift)
    def pct(vs: Seq[Double], p: Double): Double = {
      val s = vs.sorted
      val pos = p * (s.length - 1)
      val lo = pos.floor.toInt
      if (lo + 1 >= s.length) s(s.length - 1)
      else s(lo) * (lo + 1 - pos) + s(lo + 1) * (pos - lo)
    }
    // hand pins on binary-exact values (no float-form ambiguity):
    assert(pct(Seq(1.0, 2.0, 3.0, 4.0), 0.5) == 2.5)     // n=4: midpoint
    assert(pct(Seq(1.0, 2.0, 3.0, 4.0, 5.0), 0.5) == 3.0) // n=5: exact hit
    assert(pct(Seq(10.0), 0.9) == 10.0)                   // n=1: the value
    assert(pct(Seq(0.0, 8.0), 0.75) == 6.0)               // pos 0.75 exact frac
    val dir = tempDir("q34-hand")
    val rows = Seq(
      ("F", 1.0), ("F", 2.0), ("F", 3.0), ("F", 4.0),
      ("O", 10.0),
      ("P", 0.0), ("P", 8.0), ("P", 16.0), ("P", 24.0), ("P", 32.0))
    rows.toDF("o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    def run(d: String): Seq[(String, Double, Double, Long)] =
      graft.ops.Relational2.q34Percentile(spark, d)
        .collect().map(r => (r.getAs[String]("o_orderstatus"),
          r.getAs[Double]("p50"), r.getAs[Double]("p90"),
          r.getAs[Long]("n"))).toSeq
    def modelOf(rs: Seq[(String, Double)]): Seq[(String, Double, Double, Long)] =
      rs.groupBy(_._1).toSeq.sortBy(_._1).map { case (st, g) =>
        val vs = g.map(_._2)
        (st, pct(vs, 0.5), pct(vs, 0.9), vs.size.toLong)
      }
    assert(run(dir.toString) == modelOf(rows))
    // differential over the real corpus
    val real = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(run("/root/testdata/sf0.001") == modelOf(real))
  }

  // --- round-13 batch 4: heuristics, sketches, boundaries, as-of ------------
  //
  // q18, q17, q37, q72, q30. The heuristic kernels (langId, qualityScore)
  // are engine POLICY mirrored verbatim into the oracle SQL — the purest
  // case of both-engines-share-the-definition, so each gets an independent
  // scalar restatement (stopword lists restated literally: a silent list
  // edit then fails HERE, not nowhere).

  /** The contract stopword lists, restated independently. */
  private val stopEn = Set("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")
  private val stopEs = Set("el", "la", "de", "que", "y", "en", "los", "del", "se", "las")
  private val stopDe = Set("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein")
  private val stopFr = Set("le", "la", "les", "et", "des", "est", "un", "une", "du", "que")

  private def langOf(text: String): String = {
    val ts = text.trim.toLowerCase.split("\\s+").toSeq // split semantics: [""] for blank
    def hits(s: Set[String]) = ts.count(s.contains)
    val (en, es, de, fr) = (hits(stopEn), hits(stopEs), hits(stopDe), hits(stopFr))
    if (en == 0 && es == 0 && de == 0 && fr == 0) "und"
    else if (en >= es && en >= de && en >= fr) "en"
    else if (es >= de && es >= fr) "es"
    else if (de >= fr) "de"
    else "fr"
  }

  test("q18 scalar law: argmax of stopword hits with the FIXED tie order en > es > de > fr; duplicates count; zero hits -> und; full rollup re-derives at sf0.001") {
    // tie pins, hand-derived: 'la' is in BOTH es and fr lists
    assert(langOf("the el") == "en")        // en ties es -> en
    assert(langOf("el le") == "es")         // es ties fr -> es
    assert(langOf("der le") == "de")        // de ties fr -> de
    assert(langOf("le") == "fr")            // fr alone
    assert(langOf("la") == "es")            // la hits es AND fr -> tie -> es
    assert(langOf("xyz abc") == "und")
    assert(langOf("the the el") == "en")    // duplicates count: en 2 > es 1
    assert(langOf("") == "und")
    val dir = tempDir("q18-hand")
    val rows = Seq((1L, "the el"), (2L, "el le"), (3L, "der le"), (4L, "le"),
      (5L, "la"), (6L, "xyz"), (7L, "the the el"), (8L, "que"))
    writeDocsTable(dir, rows)
    def run(d: String) = graft.ops.ScaleOps.q18LangId(spark, d)
      .collect().map(r => (r.getAs[String]("lang_pred"), r.getAs[Long]("n"),
        r.getAs[Long]("min_doc"), r.getAs[Long]("max_doc"))).toSeq
    def model(rs: Seq[(Long, String)]) = rs
      .map { case (id, t) => (langOf(t), id) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (l, g) => (l, g.size.toLong, g.map(_._2).min, g.map(_._2).max) }
    assert(run(dir.toString) == model(rows))
    // 'que' is es AND fr -> es by the tie order (hand pin on the rollup)
    assert(langOf("que") == "es")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(run("/root/testdata/sf0.001") == model(real))
  }

  test("q17 scalar law: alpha ratio keeps spaces and divides by RAW length; stop ratio divides by the size of split-tokens ([''] counts 1 for blank text); quality = 0.4a + 0.3 min(4s,1) + 0.3 min(w/8,1) in that float order") {
    def q17Of(text: String): (Double, Double, Double, Double) = {
      val alpha = text.toLowerCase.count(c => (c >= 'a' && c <= 'z') || c == ' ')
        .toDouble / text.length.toDouble
      val ts = text.trim.toLowerCase.split("\\s+").toSeq // [""] when blank
      val nTok = ts.length
      val stop = ts.count(stopEn.contains).toDouble / nTok.toDouble
      val awl = text.length.toDouble / nTok.toDouble
      val q = 0.4 * alpha + 0.3 * math.min(stop * 4.0, 1.0) +
        0.3 * math.min(awl / 8.0, 1.0)
      (alpha, stop, awl, q)
    }
    val dir = tempDir("q17-hand")
    val rows = Seq(
      (1L, "The quick, BROWN fox!! 123"),  // case + punct + digits in alpha
      (2L, "the of to in"),                // all stopwords: stop ratio 1 (capped)
      (3L, "   "),                         // blank: alpha 1.0 (spaces kept), 1 token
      (4L, "supercalifragilistic"),        // long word: awl/8 capped at 1
      (5L, "a b"))
    writeDocsTable(dir, rows)
    def run(d: String) = graft.ops.ScaleOps.q17Quality(spark, d)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("alpha_ratio"),
        r.getAs[Double]("stop_ratio"), r.getAs[Double]("avg_word_len"),
        r.getAs[Double]("quality"))).toSeq
    assert(run(dir.toString) == rows.map { case (id, t) =>
      val (a, s, w, q) = q17Of(t); (id, a, s, w, q) })
    // hand pins (not model-derived): blank text keeps spaces -> alpha 1.0,
    // split yields [""] -> ONE token, so awl = 3 chars / 1 token
    val blank = run(dir.toString).find(_._1 == 3L).get
    assert(blank._2 == 1.0 && blank._4 == 3.0)
    // all-stopword doc: raw ratio 1.0, capped term contributes exactly 0.3
    val stops = run(dir.toString).find(_._1 == 2L).get
    assert(stops._3 == 1.0)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(run("/root/testdata/sf0.001") ==
      real.sortBy(_._1).map { case (id, t) => val (a, s, w, q) = q17Of(t); (id, a, s, w, q) })
  }

  test("q37 scalar law: the exact arms re-derive (countDistinct + two-sided percentile), and the within-eps booleans are REAL predicates — recomputed from the sketch values, not constants") {
    // scalar exact arms over the real corpus
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag"), col("l_orderkey").cast("long"),
        col("l_partkey").cast("long"), col("l_extendedprice").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    def pct(vs: Seq[Double], p: Double): Double = {
      val s = vs.sorted; val pos = p * (s.length - 1); val lo = pos.floor.toInt
      if (lo + 1 >= s.length) s(s.length - 1)
      else s(lo) * (lo + 1 - pos) + s(lo + 1) * (pos - lo)
    }
    val byFlag = li.groupBy(_._1).toSeq.sortBy(_._1)
    val got = graft.ops.ScaleOps.q37ApproxSketches(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[String]("l_returnflag"),
        r.getAs[Long]("exact_orders"), r.getAs[Long]("exact_parts"),
        r.getAs[Double]("exact_median_price"), r.getAs[Boolean]("orders_within_eps"),
        r.getAs[Boolean]("parts_within_eps"), r.getAs[Boolean]("median_in_band"))).toSeq
    assert(got.map(g => (g._1, g._2, g._3, g._4)) == byFlag.map { case (f, g) =>
      (f, g.map(_._2).distinct.size.toLong, g.map(_._3).distinct.size.toLong,
        pct(g.map(_._4), 0.5)) })
    // the booleans must equal the RECOMPUTED predicates over the actual
    // sketch values (a vacuously-true boolean would pass the oracle and
    // fail here)
    // recompute over the SAME physical input shape as q37 (fanOut) so the
    // merge-order-sensitive GK quantile summary sees the same partitions
    val sk = graft.ops.Relational.fanOut(
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("ao"),
        approx_count_distinct(col("l_partkey"), rsd = 0.01).as("ap"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("am"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    got.foreach { case (f, eo, ep, _, bo, bp, bm) =>
      val (ao, ap, am) = sk(f)
      val vs = byFlag.find(_._1 == f).get._2.map(_._4)
      assert(bo == (math.abs(ao - eo) <= eo * 0.05), s"$f orders boolean drifted")
      assert(bp == (math.abs(ap - ep) <= ep * 0.05), s"$f parts boolean drifted")
      assert(bm == (am >= pct(vs, 0.49) && am <= pct(vs, 0.51)), s"$f band boolean drifted")
    }
    // and on this corpus the sketches genuinely are within bounds
    assert(got.forall(g => g._5 && g._6 && g._7))
  }

  test("q72 scalar law: boundaries are the i/10 two-sided percentiles; bin = 1 + #boundaries STRICTLY exceeded (boundary-equal values stay low); empty bins are absent; share = n/total") {
    def pct(vs: Seq[Double], p: Double): Double = {
      val s = vs.sorted; val pos = p * (s.length - 1); val lo = pos.floor.toInt
      if (lo + 1 >= s.length) s(s.length - 1)
      else s(lo) * (lo + 1 - pos) + s(lo + 1) * (pos - lo)
    }
    def model(vals: Seq[Long]): Seq[(Long, Long, Long, Long, Double)] = {
      val ds = vals.map(_.toDouble)
      val bounds = (1 until 10).map(i => pct(ds, i / 10.0))
      val binned = vals.groupBy(v => 1L + bounds.count(b => v.toDouble > b))
      binned.toSeq.sortBy(_._1).map { case (bin, g) =>
        (bin, g.size.toLong, g.min, g.max, g.size.toDouble / vals.size.toDouble) }
    }
    def run(d: String) = graft.ops.ScaleOps4.q72EquiDepth(spark, d)
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("min_v"), r.getAs[Long]("max_v"),
        r.getAs[Double]("share"))).toSeq
    // planted: massive duplication ON the boundary — equal-to-boundary
    // values must stay in the LOWER bin (v > b strict), leaving bins empty
    val dir = tempDir("q72-hand")
    val vals = Seq.fill(50)(100L) ++ Seq.fill(30)(200L) ++ (1L to 20L).map(i => 200L + i)
    vals.zipWithIndex.map { case (v, i) => (i.toLong, s"doc $i", "en", "src0", v) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = run(dir.toString)
    assert(got == model(vals))
    // the 100-run: every i/10 percentile through p50 EQUALS 100.0, so all
    // fifty 100s sit in bin 1 (strictness pinned: > not >=)
    assert(got.head._1 == 1L && got.head._2 == 50L)
    assert(got.map(_._1) == got.map(_._1).distinct, "bins must not repeat")
    assert(got.map(_._2).sum == vals.size.toLong)
    // real corpus differential
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("n_chars").cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(run("/root/testdata/sf0.001") == model(real))
  }

  test("q30 scalar law: last signup AT-OR-BEFORE the event (inclusive on ts ties — signup sorts first), later event_id wins between same-ts signups, null before any signup") {
    def model(evts: Seq[(Long, java.sql.Timestamp, Long, String)])
        : Seq[(Long, Long, java.sql.Timestamp, String, Option[java.sql.Timestamp])] =
      evts.groupBy(_._3).toSeq.flatMap { case (_, g) =>
        val ordered = g.sortBy(e =>
          (e._2.getTime, if (e._4 == "signup") 0 else 1, e._1))
        var last: Option[java.sql.Timestamp] = None
        ordered.flatMap { case (eid, ts, uid, typ) =>
          if (typ == "signup") { last = Some(ts); None }
          else Some((uid, eid, ts, typ, last))
        }
      }.sortBy(e => (e._1, e._2))
    def run(d: String) = graft.ops.Relational2.q30AsofJoin(spark, d)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[String]("event_type"),
        Option(r.getAs[java.sql.Timestamp]("last_signup_ts")))).toSeq
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    // (event_id, ts, user_id, event_type)
    val evts = Seq(
      (1L, ts(10), 1L, "click"),    // BEFORE any signup -> null
      (2L, ts(20), 1L, "signup"),
      (3L, ts(20), 1L, "click"),    // same ts as signup -> INCLUSIVE, sees ts(20)
      (4L, ts(30), 1L, "view"),
      (5L, ts(40), 1L, "signup"),   // two signups same ts: later event_id wins
      (6L, ts(40), 1L, "signup"),
      (7L, ts(50), 1L, "click"),    // last() in window order -> signup 6's ts(40)
      (8L, ts(5), 2L, "view"))      // user with no signup at all
    val dir = tempDir("q30-hand")
    evts.map { case (eid, t, uid, typ) => (eid, t, uid, typ, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run(dir.toString)
    assert(got == model(evts))
    val byEid = got.map(e => e._2 -> e._5).toMap
    assert(byEid(1L).isEmpty, "event before any signup must carry null")
    assert(byEid(3L).contains(ts(20)), "same-ts signup must be visible (inclusive)")
    assert(byEid(8L).isEmpty)
    assert(byEid(7L).contains(ts(40)))
    // real corpus differential
    val real = graft.ops.Relational.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getAs[java.sql.Timestamp]("ts"),
        r.getLong(2), r.getString(3))).toSeq
    assert(run("/root/testdata/sf0.001") == model(real))
  }

  // --- round-13 batch 5: image decode, clustering split, top-k, CDC, gaps ---
  //
  // q26, q63, q49, q54, q27.

  test("q26 scalar law: hand-rolled P6 bytes (comments + 2-byte samples + refusals) decode exactly; the full query re-derives via an independent parser + block-average model") {
    import graft.multimodal.Ppm
    // hand bytes with a COMMENT in the header (the in-repo encoder never
    // writes one, so only independent bytes exercise the skip) and the
    // one-whitespace-after-maxval law
    val hand = ("P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60))
    val img = Ppm.decode(hand)
    assert(img != null && img.width == 2 && img.height == 1 && img.maxval == 255)
    assert(img.samples.toSeq == Seq(10, 20, 30, 40, 50, 60))
    // 2-byte samples when maxval >= 256: big-endian pairs
    val hand16 = ("P6\n1 1\n65535\n".getBytes("US-ASCII") ++
      Array[Byte](0x01, 0x02, 0x03, 0x04, 0x05, 0x06))
    val img16 = Ppm.decode(hand16)
    assert(img16 != null && img16.samples.toSeq ==
      Seq(0x0102, 0x0304, 0x0506))
    // refusals: bad magic, zero dim, maxval 65536, truncated raster
    assert(Ppm.decode("P5\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)) == null)
    assert(Ppm.decode("P6\n0 1\n255\n".getBytes("US-ASCII")) == null)
    assert(Ppm.decode("P6\n1 1\n65536\n".getBytes("US-ASCII") ++ new Array[Byte](6)) == null)
    assert(Ppm.decode("P6\n2 2\n255\n".getBytes("US-ASCII") ++ new Array[Byte](11)) == null)
    // full query re-derivation through an INDEPENDENT parser + the
    // documented block-average law
    def parsePpm(b: Array[Byte]): (Int, Int, Seq[Int]) = {
      val s = new String(b, "ISO-8859-1")
      val m = "^P6\\s+(\\d+)\\s+(\\d+)\\s+(\\d+)\\s".r
        .findFirstMatchIn(s).get
      val (w, h) = (m.group(1).toInt, m.group(2).toInt)
      val off = m.end
      (w, h, (0 until w * h * 3).map(j => b(off + j) & 0xff))
    }
    def f0Of(w: Int, h: Int, ss: Seq[Int]): Float = {
      // cell (0,0) of the 8x8 grid: x0 = 0, x1 = max(1, w/8); same for y
      val x1 = math.max(1, w / 8); val y1 = math.max(1, h / 8)
      var sum = 0L; var np = 0L
      for (y <- 0 until y1; x <- 0 until x1) {
        val p = (y * w + x) * 3
        sum += ss(p) + ss(p + 1) + ss(p + 2); np += 1
      }
      ((sum.toDouble / (np * 3).toDouble) / 255.0).toFloat
    }
    val dir = tempDir("q26-hand")
    writeDocsTable(dir, (0L to 9L).map(id => (id, s"doc $id")))
    val got = graft.ops.ScaleOps.q26Multimodal(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("n_bytes"),
        r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Float]("f0"), r.getAs[Int]("n_feat"))).toSeq
    val expect = (0L to 9L).map { id =>
      val b = Ppm.fixtureBytes(id)
      val (w, h, ss) = parsePpm(b)
      (id, b.length.toLong, w, h, f0Of(w, h, ss), 64)
    }
    assert(got == expect)
  }

  /** Independent scalar restatement of the q51 portable split hash. */
  private def splitBucketOf(id: Long): Long = {
    val a = 2654435761L
    val id32 = java.lang.Math.floorMod(id, 4294967296L)
    val hi = id32 >> 16; val lo = id32 % 65536L
    java.lang.Math.floorMod((hi * a % 65536L) * 65536L + lo * a, 4294967296L)
  }

  private def splitOf(id: Long): String = {
    val b = splitBucketOf(id)
    if (b < 3435973836L) "train" else if (b < 3865470565L) "val" else "test"
  }

  test("q63 scalar law: clusters are connected components (min id) of the jaccard >= 0.5 shingle graph; the split keys on CLUSTER id so components never straddle; rollup re-derives at sf0.001") {
    def shingleSet(t: String): Set[String] = {
      val ts = t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      if (ts.length < 3) Set(ts.mkString(" "))
      else (0 to ts.length - 3).map(i => ts.slice(i, i + 3).mkString(" ")).toSet
    }
    def model(rows: Seq[(Long, String)]): Seq[(String, Long, Long)] = {
      val sh = rows.map { case (id, t) => id -> shingleSet(t) }.toMap
      // union-find, min-id component label
      val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
      def find(x: Long): Long = {
        var r = x; while (parent(r) != r) r = parent(r)
        r
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
          parent(hi) = lo }
      }
      for {
        a <- rows.map(_._1); b <- rows.map(_._1) if a < b
        inter = sh(a).intersect(sh(b)).size
        uni = sh(a).size + sh(b).size - inter
        if uni > 0 && inter.toDouble / uni.toDouble >= 0.5
      } union(a, b)
      rows.map(r => (r._1, find(r._1)))
        .groupBy { case (_, c) => splitOf(c) }.toSeq.sortBy(_._1)
        .map { case (s, g) =>
          (s, g.size.toLong, g.map(_._2).distinct.size.toLong) }
    }
    def run(d: String) = graft.ops.ScaleOps2.q63LeakageSafeSplit(spark, d)
      .collect().map(r => (r.getAs[String]("split"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_clusters"))).toSeq
    // planted: a 3-doc near-dup CHAIN (1~2, 2~3, but 1 !~ 3) must land in
    // ONE cluster (transitivity) and therefore one split
    val dir = tempDir("q63-hand")
    val rows = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e zz"),       // jacc(1,2) = 3/5 >= 0.5
      (3L, "b c d e zz qq"),      // jacc(2,3) = 2/5 ... build a real chain below
      (4L, "u v w x y z"),        // singleton
      (5L, "completely different words here now"))
    // verify the chain shape ON the scalar model before trusting the pin
    val sh = rows.map { case (id, t) => id -> shingleSet(t) }.toMap
    def jac(a: Long, b: Long): Double = {
      val i = sh(a).intersect(sh(b)).size
      i.toDouble / (sh(a).size + sh(b).size - i).toDouble }
    assume(jac(1L, 2L) >= 0.5 && jac(1L, 3L) < 0.5,
      "fixture must form a chain, not a clique")
    writeDocsTable(dir, rows)
    val got = run(dir.toString)
    assert(got == model(rows))
    if (jac(2L, 3L) >= 0.5) {
      // chain closed: docs 1,2,3 share min-id cluster 1 -> one split entry
      // carries all three (whole-cluster-moves, via transitivity)
      val s123 = splitOf(1L)
      assert(got.find(_._1 == s123).get._2 >= 3L)
    }
    // real corpus differential (sf0.001: every shingle df << the 1000 cap,
    // so the scalar uncapped model is exact)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val dfMax = real.flatMap { case (_, t) => shingleSet(t) }
      .groupBy(identity).values.map(_.size).max
    assert(dfMax < 1000, s"cap would bind (df $dfMax) — the scalar model assumes it can't")
    assert(run("/root/testdata/sf0.001") == model(real))
  }

  test("q49 scalar law: per-group top-3 by (price DESC, p_partkey ASC) with rank = position; equal-price ties order by id; differential at sf0.001") {
    def model(rows: Seq[(String, Double, Long)]): Seq[(String, Long, Double, Long)] =
      rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (tp, g) =>
        g.sortBy { case (_, p, id) => (-p, id) }.take(3).zipWithIndex
          .map { case ((_, p, id), r) => (tp, (r + 1).toLong, p, id) }
      }
    def run(d: String) = graft.ops.Relational3.q49GroupedTopK(spark, d)
      .collect().map(r => (r.getAs[String]("p_type"), r.getAs[Long]("rank"),
        r.getAs[Double]("price"), r.getAs[Long]("p_partkey"))).toSeq
    // planted ties: three parts at the SAME price — ranks must follow ids
    val dir = tempDir("q49-hand")
    val rows = Seq(
      ("tA", 100.0, 11L), ("tA", 100.0, 10L), ("tA", 100.0, 12L), ("tA", 50.0, 9L),
      ("tB", 7.0, 2L), ("tB", 9.0, 1L))
    rows.map { case (tp, p, id) => (id, tp, p) }
      .toDF("p_partkey", "p_type", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = run(dir.toString)
    assert(got == model(rows))
    assert(got.filter(_._1 == "tA").map(_._4) == Seq(10L, 11L, 12L),
      "equal-price top-3 must rank by ascending id")
    assert(got.filter(_._1 == "tB").map(_._4) == Seq(1L, 2L),
      "a 2-row group yields 2 ranks, not a padded 3")
    // real corpus differential
    val real = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_type"), col("p_retailprice").cast("double"),
        col("p_partkey").cast("long"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(run("/root/testdata/sf0.001") == model(real))
  }

  test("q54 scalar law: change classes follow the pure modular mutation law — %11 deleted beats %5 changed; inserts keep the ORIGINAL price; counts re-derive at sf0.001") {
    def model(keys: Seq[Long]): Seq[(String, Long)] = {
      val deleted = keys.count(_ % 11 == 0).toLong
      val inserted = keys.count(_ % 13 == 0).toLong
      val changed = keys.count(k => k % 11 != 0 && k % 5 == 0).toLong
      val unchanged = keys.count(k => k % 11 != 0 && k % 5 != 0).toLong
      Seq(("changed", changed), ("deleted", deleted),
        ("inserted", inserted), ("unchanged", unchanged))
        .filter(_._2 > 0)
    }
    def run(d: String) = graft.ops.Relational3.q54SnapshotDiff(spark, d)
      .collect().map(r => (r.getAs[String]("change"), r.getAs[Long]("n"))).toSeq
    // planted keys pin every class INCLUDING the %55 overlap (divisible by
    // both 5 and 11 -> the row is gone from the new snapshot, so deletion
    // wins over mutation) and a %65 overlap (5 and 13: changed AND its
    // shifted copy inserted)
    val dir = tempDir("q54-hand")
    val keys = Seq(1L, 5L, 11L, 13L, 55L, 65L, 7L)
    keys.map(k => (k, k % 100, "O", k * 10.0,
        java.sql.Date.valueOf("2024-01-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = run(dir.toString)
    assert(got == model(keys))
    // 55 counted deleted (not changed); 65 counted changed AND inserted
    assert(got.toMap.apply("deleted") == 2L)   // 11, 55
    assert(got.toMap.apply("changed") == 2L)   // 5, 65
    assert(got.toMap.apply("inserted") == 2L)  // 13's copy, 65's copy
    assert(got.toMap.apply("unchanged") == 3L) // 1, 7, and 13 itself (the
    // %13 row stays untouched — only its SHIFTED COPY is the insert)
    val real = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(run("/root/testdata/sf0.001") == model(real))
  }

  test("q27 scalar law: a session breaks only when the gap STRICTLY exceeds 30 min (boundary-equal stays); session_seq counts breaks from 1; rollup re-derives over the real events") {
    def model(evts: Seq[(Long, java.sql.Timestamp)])
        : Seq[(Long, Long, java.sql.Timestamp, java.sql.Timestamp, Long)] =
      evts.groupBy(_._1).toSeq.flatMap { case (uid, g) =>
        val ts = g.map(_._2).sortBy(_.getTime)
        var seq = 0L
        var prev: Option[Long] = None
        val tagged = ts.map { t =>
          if (prev.isEmpty || t.getTime - prev.get > 1800000L) seq += 1
          prev = Some(t.getTime)
          (seq, t)
        }
        tagged.groupBy(_._1).toSeq.map { case (s, tsg) =>
          (uid, s, tsg.map(_._2).minBy(_.getTime), tsg.map(_._2).maxBy(_.getTime),
            tsg.size.toLong) }
      }.sortBy(e => (e._1, e._2))
    def run(d: String) = graft.ops.ScaleOps.q27Sessionize(spark, d)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"),
        r.getAs[Long]("n_events"))).toSeq
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    // boundary pins: +1800000 EXACTLY stays in session 1; +1800001 breaks
    val evts = Seq(
      (1L, ts(0)), (1L, ts(1800000L)),                    // same session
      (2L, ts(0)), (2L, ts(1800001L)),                    // breaks
      (3L, ts(0)), (3L, ts(0)),                           // duplicate ts: one session, 2 events
      (4L, ts(0)), (4L, ts(1000)), (4L, ts(2000000L)), (4L, ts(2001000L)))
    val dir = tempDir("q27-hand")
    evts.zipWithIndex.map { case ((uid, t), i) =>
        (i.toLong + 1, t, uid, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run(dir.toString)
    assert(got == model(evts))
    assert(got.filter(_._1 == 1L).map(_._2) == Seq(1L), "boundary-equal gap must NOT break")
    assert(got.filter(_._1 == 2L).map(_._2) == Seq(1L, 2L), "boundary+1 must break")
    assert(got.find(e => e._1 == 3L).get._5 == 2L)
    // real corpus differential
    val real = graft.ops.Relational.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id").cast("long"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getAs[java.sql.Timestamp]("ts"))).toSeq
    assert(run("/root/testdata/sf0.001") == model(real))
  }

  // --- round-13 batch 6: dedup keys, counts, profiles, skew plumbing --------
  //
  // q15, q16, q25, q28, q29, q76.

  private def pctTwoSided(vs: Seq[Double], p: Double): Double = {
    val s = vs.sorted; val pos = p * (s.length - 1); val lo = pos.floor.toInt
    if (lo + 1 >= s.length) s(s.length - 1)
    else s(lo) * (lo + 1 - pos) + s(lo + 1) * (pos - lo)
  }

  test("q15 scalar law: the dedup key is md5 of the RAW text bytes (not trimmed/lowered), keeper is MIN doc_id; re-derives at sf0.001") {
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def model(rows: Seq[(Long, String)]): Seq[(String, Long, Long)] =
      rows.groupBy(r => md5hex(r._2)).toSeq
        .map { case (h, g) => (h, g.map(_._1).min, g.size.toLong) }
        .sortBy(_._2)
    def run(d: String) = graft.ops.ScaleOps.q15DedupExact(spark, d)
      .collect().map(r => (r.getAs[String]("content_md5"),
        r.getAs[Long]("keeper_id"), r.getAs[Long]("n_copies"))).toSeq
    val dir = tempDir("q15-hand")
    // raw-bytes pin: trailing space and case CHANGE the key (exact dedup
    // is byte-exact, not normalized — normalization is q92's job)
    val rows = Seq((5L, "Hello World"), (2L, "Hello World"),
      (3L, "Hello World "), (4L, "hello world"))
    writeDocsTable(dir, rows)
    val got = run(dir.toString)
    assert(got == model(rows))
    assert(got.map(_._2) == Seq(2L, 3L, 4L), "three distinct keys, min-id keepers")
    assert(got.find(_._2 == 2L).get._3 == 2L)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(run("/root/testdata/sf0.001") == model(real))
  }

  test("q16 scalar law: n_tokens counts the raw split ([''] -> 1 for blank); n_bpe_units = sum of max(1, ceil(len/6)) per token (empty token floors at 1); re-derives at sf0.001") {
    def model(rows: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
      rows.sortBy(_._1).map { case (id, t) =>
        val ts = t.trim.toLowerCase.split("\\s+").toSeq // [""] when blank
        val bpe = ts.map(tk => math.max(1L, math.ceil(tk.length / 6.0).toLong)).sum
        (id, ts.length.toLong, bpe)
      }
    def run(d: String) = graft.ops.ScaleOps.q16TokenCount(spark, d)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_bpe_units"))).toSeq
    val dir = tempDir("q16-hand")
    val rows = Seq(
      (1L, "one two three"),            // 3 tokens, all < 6 chars -> 3 units
      (2L, "abcdef"),                   // exactly 6 -> ceil(6/6) = 1
      (3L, "abcdefg"),                  // 7 -> 2 units
      (4L, "   "),                      // blank: 1 empty token, floors at 1
      (5L, "twelvecharss exactly12chr"))// 12 -> 2 each
    writeDocsTable(dir, rows)
    val got = run(dir.toString)
    assert(got == model(rows))
    assert(got.find(_._1 == 2L).get._3 == 1L, "6 chars is ONE unit (ceil boundary)")
    assert(got.find(_._1 == 3L).get._3 == 2L, "7 chars is TWO units")
    assert(got.find(_._1 == 4L).get == ((4L, 1L, 1L)), "blank floors at 1/1")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(run("/root/testdata/sf0.001") == model(real))
  }

  test("q25 scalar law: every pair at cos >= 0.999 over corpus ∪ shifted copy surfaces (the LSH path owes FULL recall here); cos arithmetic is the q20 in-order form; re-derives at sf0.001") {
    def dotD(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val all = emb ++ emb.map { case (id, v) => (id + 1000000L, v) }
    val byId = all.toMap
    val expect = (for {
      a <- all.map(_._1); b <- all.map(_._1) if a < b
      cos = dotD(byId(a), byId(b)) /
        (math.sqrt(dotD(byId(a), byId(a))) * math.sqrt(dotD(byId(b), byId(b))))
      if cos >= 0.999
    } yield (a, b, cos)).sortBy(p => (p._1, p._2))
    val got = graft.ops.ScaleOps.q25EmbeddingDup(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("cos"))).toSeq
    assert(got == expect)
    // every vector's planted twin is found — the recall floor the shifted
    // union exists to assert (identical arrays -> the exact same cos
    // expression on both sides of the comparison)
    val pairsSet = got.map(p => (p._1, p._2)).toSet
    emb.foreach { case (id, _) =>
      assert(pairsSet.contains((id, id + 1000000L)),
        s"vector $id must pair with its exact twin") }
  }

  test("q28/q29 scalar law: the salted two-phase agg and salted join are value-IDENTICAL to the plain forms — exact decimal sums, no row lost or duplicated by the salt") {
    val evts = graft.ops.Relational.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("value").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    def dec(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val byType = evts.groupBy(_._1).toSeq.sortBy(_._1)
    val expect28 = byType.map { case (tpe, g) =>
      (tpe, g.map(e => dec(e._2)).sum.toDouble, g.size.toLong) }
    val got28 = graft.ops.Scale.q28SaltedAgg(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Double]("sum_value"), r.getAs[Long]("n"))).toSeq
    assert(got28 == expect28)
    val got29 = graft.ops.Scale.q29SaltedJoin(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("type_total"), r.getAs[Double]("sum_value"))).toSeq
    assert(got29 == byType.map { case (tpe, g) =>
      (tpe, g.size.toLong, g.map(e => dec(e._2)).sum.toDouble) })
    // the dimension fan-out trap: type_total joined onto every event and
    // re-grouped must equal the plain per-type count, never a multiple
    assert(got29.map(r => (r._1, r._2)) == got28.map(r => (r._1, r._3)))
  }

  test("q76 scalar law: per-source percentiles are the two-sided form over chars(double) and the q17 quality; min/max cast to long; re-derives at sf0.001") {
    val stop = stopEn
    def quality(t: String): Double = {
      val lower = t.toLowerCase
      val alpha = lower.count(c => (c >= 'a' && c <= 'z') || c == ' ').toDouble / lower.length
      val ts = lower.trim.split("\\s+").toSeq
      val stopR = ts.count(stop.contains).toDouble / ts.size
      val awl = lower.length.toDouble / ts.size
      0.4 * alpha + 0.3 * math.min(stopR * 4.0, 1.0) + 0.3 * math.min(awl / 8.0, 1.0)
    }
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val expect = real.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, g) =>
      val chars = g.map(_._2.length.toDouble)
      val qs = g.map(r => quality(r._2))
      (src, g.size.toLong,
        pctTwoSided(chars, 0.25), pctTwoSided(chars, 0.5),
        pctTwoSided(chars, 0.9), pctTwoSided(chars, 0.99),
        pctTwoSided(qs, 0.5), pctTwoSided(qs, 0.9),
        chars.min.toLong, chars.max.toLong)
    }
    val got = graft.ops.ScaleOps4.q76SourceProfile(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("p25_chars"), r.getAs[Double]("p50_chars"),
        r.getAs[Double]("p90_chars"), r.getAs[Double]("p99_chars"),
        r.getAs[Double]("p50_quality"), r.getAs[Double]("p90_quality"),
        r.getAs[Long]("min_chars"), r.getAs[Long]("max_chars"))).toSeq
    assert(got == expect)
    assert(got.map(_._2).sum == real.size.toLong)
  }

  // --- round-13 batch 7: the relational core — the set goes to EMPTY --------
  //
  // q01–q13, q31, q32, q33. Plain-SQL shapes, but the float/decimal
  // DISCIPLINE is engine policy shared verbatim with the mirrors (exact
  // decimal sums, scale-4/6 casts, double division last), so each gets an
  // independent BigDecimal/Double restatement over the collected sf0.001
  // tables plus targeted tie/null/boundary pins.

  private def d4(v: Double): BigDecimal =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
  private def dsumOf(vs: Seq[Double]): Double = vs.map(d4).sum.toDouble
  private def davgOf(vs: Seq[Double]): Double = vs.map(d4).sum.toDouble / vs.size

  private lazy val liRows: Seq[(Long, Long, Long, Double, Double, Double, Double, String, String, java.sql.Timestamp)] =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        // NTZ -> LTZ under the UTC session: a monotonic bijection, so the
        // scalar model's Timestamp ordering/boundaries match the engine's
        col("l_shipdate").cast("timestamp").as("l_shipdate"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getString(7), r.getString(8), r.getAs[java.sql.Timestamp](9))).toSeq

  private lazy val ordRows: Seq[(Long, Long, String, Double, java.sql.Timestamp, String)] =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_orderpriority"))
      .collect().map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("o_custkey"),
        r.getAs[String]("o_orderstatus"), r.getAs[Double]("o_totalprice"),
        r.getAs[java.sql.Timestamp]("o_orderdate"),
        r.getAs[String]("o_orderpriority"))).toSeq

  private lazy val custRows: Seq[(Long, String, Long, Double, String)] =
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .collect().map(r => (r.getAs[Long]("c_custkey"), r.getAs[String]("c_name"),
        r.getAs[Number]("c_nationkey").longValue(), r.getAs[Double]("c_acctbal"),
        r.getAs[String]("c_mktsegment"))).toSeq

  test("q01/q02 scalar law: exact decimal products (12,4)x(6,4), scale-4/6 sum casts, double division LAST for averages; the shipdate/discount/quantity boundaries are inclusive as written") {
    val cut = java.sql.Timestamp.valueOf("1998-09-02 00:00:00")
    val kept = liRows.filter(r => !r._10.after(cut))
    val expect1 = kept.groupBy(r => (r._8, r._9)).toSeq.sortBy(_._1).map { case ((f, st), g) =>
      val disc = g.map { r =>
        d4(r._5) * (BigDecimal(1) - d4(r._6)) }
      val charge = g.zip(disc).map { case (r, dp) => dp * (BigDecimal(1) + d4(r._7)) }
      (f, st, dsumOf(g.map(_._4)), dsumOf(g.map(_._5)),
        disc.sum.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        charge.sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        davgOf(g.map(_._4)), davgOf(g.map(_._5)), davgOf(g.map(_._6)),
        g.size.toLong)
    }
    val got1 = graft.ops.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8), r.getLong(9))).toSeq
    assert(got1 == expect1)
    // q02: the double-space range filter + exact decimal revenue
    val k2 = liRows.filter(r =>
      !r._10.before(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
      r._10.before(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
      r._6 >= 0.05 && r._6 <= 0.07 && r._4 < 24)
    val expect2 = (k2.map(r => d4(r._5) * d4(r._6)).sum
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, k2.size.toLong)
    val got2 = graft.ops.Relational.q02FilterScan(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).head
    assert(got2 == expect2 && got2._2 > 0)
  }

  test("q03/q04 scalar law: the 5-way and 2-way join rollups re-derive from hand-joined maps — no row lost or duplicated by the join chain") {
    val nat = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .collect().map(r => r.getAs[Number]("n_nationkey").longValue() ->
        (r.getAs[String]("n_name"), r.getAs[Number]("n_regionkey").longValue())).toMap
    val reg = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .collect().map(r => r.getAs[Number]("r_regionkey").longValue() ->
        r.getAs[String]("r_name")).toMap
    val custNation = custRows.map(c => c._1 -> c._3).toMap
    val ordCust = ordRows.map(o => o._1 -> o._2).toMap
    val expect3 = liRows.flatMap { r =>
      ordCust.get(r._1).flatMap(ck => custNation.get(ck)).map { nk =>
        val (nn, rk) = nat(nk)
        ((reg(rk), nn), d4(r._5) * (BigDecimal(1) - d4(r._6)))
      }
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case ((rn, nn), g) =>
      (rn, nn, g.map(_._2).sum.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        g.size.toLong) }
    val got3 = graft.ops.Relational.q03JoinRevenue(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(got3 == expect3 && got3.nonEmpty)
    val brand = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .collect().map(r => r.getAs[Long]("p_partkey") -> r.getAs[String]("p_brand")).toMap
    val expect4 = liRows.flatMap(r => brand.get(r._2).map(b => (b, r)))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (b, g) =>
        (b, dsumOf(g.map(_._2._5)), dsumOf(g.map(_._2._4)), g.size.toLong) }
    val got4 = graft.ops.Relational.q04BroadcastDim(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(got4 == expect4 && got4.nonEmpty)
  }

  test("q05/q06/q07 scalar law: anti keeps EXACTLY the customers with zero orders, semi keeps suppliers with ANY heavy lineitem exactly once, distinct pairs re-derive") {
    val orderCusts = ordRows.map(_._2).toSet
    val expect5 = custRows.filterNot(c => orderCusts(c._1))
      .sortBy(_._1).map(c => (c._1, c._2))
    val got5 = graft.ops.Relational.q05AntiJoin(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got5 == expect5)
    val heavySupp = liRows.filter(_._4 > 45).map(_._3).toSet
    val supp = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .collect().map(r => (r.getAs[Long]("s_suppkey"), r.getAs[String]("s_name"),
        r.getAs[Double]("s_acctbal"))).toSeq
    val expect6 = supp.filter(s => heavySupp(s._1)).sortBy(_._1)
    val got6 = graft.ops.Relational.q06SemiJoin(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got6 == expect6)
    // semi = set membership, never multiplicity: a supplier with MANY
    // heavy lineitems appears once
    assert(got6.map(_._1).distinct == got6.map(_._1))
    val expect7 = ordRows.map(o => (o._3, o._6)).distinct.sorted
    val got7 = graft.ops.Relational.q07Distinct(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got7 == expect7)
  }

  test("q08/q09 scalar law: top-10 by (exact-decimal total DESC, custkey ASC); last-wins picks the (ts DESC, event_id DESC) head per user") {
    val names = custRows.map(c => c._1 -> c._2).toMap
    // INNER join: an order whose custkey is absent from customer drops
    val expect8 = ordRows.groupBy(_._2).toSeq
      .flatMap { case (ck, g) =>
        names.get(ck).map(nm => (ck, nm, dsumOf(g.map(_._4)), g.size.toLong)) }
      .sortBy { case (ck, _, tot, _) => (-tot, ck) }.take(10)
    val got8 = graft.ops.Relational.q08TopK(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(got8 == expect8 && got8.size == 10)
    val evts = graft.ops.Relational.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id").cast("long"), col("ts"), col("user_id").cast("long"),
        col("event_type"), col("value").cast("double"))
      .collect().map(r => (r.getLong(0), r.getAs[java.sql.Timestamp]("ts"),
        r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
    val expect9 = evts.groupBy(_._3).toSeq.sortBy(_._1).map { case (uid, g) =>
      val top = g.maxBy(e => (e._2.getTime, e._1))
      (uid, top._1, top._4, top._5) }
    val got9 = graft.ops.Relational.q09LastWins(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSeq
    assert(got9 == expect9)
  }

  test("q10 scalar law: full-outer MERGE classifies updated/inserted/kept; acctbal rounds through DECIMAL(18,4) HALF_UP; the +25 id shift creates BOTH matched and unmatched rows") {
    val source = ordRows.groupBy(_._2).map { case (ck, g) =>
      (ck + 25L) -> (s"upserted#${ck + 25L}", BigDecimal(g.size)) }
    val target = custRows.map(c => c._1 -> (c._2, d4(c._4))).toMap
    val ids = (source.keySet ++ target.keySet).toSeq.sorted
    val expect = ids.map { id =>
      (source.get(id), target.get(id)) match {
        case (Some((sn, sb)), Some(_)) => (id, sn, sb.toDouble, "updated")
        case (Some((sn, sb)), None)    => (id, sn, sb.toDouble, "inserted")
        case (None, Some((tn, tb)))    => (id, tn, tb.toDouble, "kept")
        case _ => sys.error("unreachable")
      }
    }
    val got = graft.ops.Relational.q10UpsertMerge(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3))).toSeq
    assert(got == expect)
    val classes = got.groupBy(_._4).view.mapValues(_.size).toMap
    assert(classes.keySet == Set("updated", "inserted", "kept"),
      "the +25 shift must produce all three merge actions on this corpus")
  }

  test("q11/q12/q33 scalar law: disjoint union buckets; rollup emits (f,l),(f,·),(·,·) levels and cube adds (·,l); nulls-first ordering re-derives") {
    val hi = ordRows.filter(_._4 > 300000).map(_._1)
    val lo = ordRows.filter(_._4 < 50000).map(_._1)
    val expect11 = Seq(("high", hi), ("low", lo)).filter(_._2.nonEmpty)
      .map { case (b, ks) => (b, ks.size.toLong, ks.min, ks.max) }.sortBy(_._1)
    val got11 = graft.ops.Relational.q11Union(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got11 == expect11)
    // rollup/cube: grouping levels as Option[String]
    def key(o: Option[String]) = (o.isDefined, o.getOrElse(""))
    val base = liRows.map(r => (r._8, r._9, r._4))
    def agg(g: Seq[(String, String, Double)]) = (g.size.toLong, dsumOf(g.map(_._3)))
    val full = base.groupBy(r => (Option(r._1), Option(r._2)))
    val byFlag = base.groupBy(r => (Option(r._1), None: Option[String]))
    val byStat = base.groupBy(r => (None: Option[String], Option(r._2)))
    val grand = Map((None: Option[String], None: Option[String]) -> base)
    def rows(m: Map[(Option[String], Option[String]), Seq[(String, String, Double)]]) =
      m.toSeq.map { case ((f, l), g) => val (n, sq) = agg(g); (f, l, n, sq) }
    val expect12 = (rows(full) ++ rows(byFlag) ++ rows(grand))
      .sortBy { case (f, l, _, _) => (key(f), key(l)) }
    val got12 = graft.ops.Relational.q12Rollup(spark, "/root/testdata/sf0.001")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getDouble(3))).toSeq
    assert(got12 == expect12)
    assert(got12.head._1.isEmpty && got12.head._2.isEmpty, "grand total sorts first (nulls first)")
    val expect33 = (rows(full) ++ rows(byFlag) ++ rows(byStat) ++ rows(grand))
      .sortBy { case (f, l, _, _) => (key(f), key(l)) }
      .map { case (f, l, n, sq) => (f, l, n, sq) }
    val got33 = graft.ops.Relational2.q33Cube(spark, "/root/testdata/sf0.001")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getDouble(3))).toSeq
    assert(got33 == expect33)
    assert(got33.size == got12.size + byStat.size, "cube adds exactly the (·,l) level")
  }

  test("q13 scalar law: running total accumulates exact DECIMAL(18,4) in (o_orderdate, o_orderkey) order per customer, cast double ONCE at the end of each prefix") {
    val expect = ordRows.groupBy(_._2).toSeq.flatMap { case (ck, g) =>
      val ordered = g.sortBy(o => (o._5.getTime, o._1))
      var acc = BigDecimal(0)
      ordered.zipWithIndex.map { case (o, i) =>
        acc += d4(o._4)
        (ck, o._1, i + 1, acc.toDouble)
      }
    }.sortBy(e => (e._1, e._3))
    val got = graft.ops.Relational.q13WindowRunning(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"),
        r.getAs[Int]("order_rank"), r.getAs[Double]("running_total"))).toSeq
    assert(got == expect)
    // the last rank's running total equals the customer's exact total —
    // the prefix-sum/total consistency law
    val totals = ordRows.groupBy(_._2).view.mapValues(g => dsumOf(g.map(_._4))).toMap
    got.groupBy(_._1).foreach { case (ck, rs) =>
      assert(rs.maxBy(_._3)._4 == totals(ck)) }
  }

  test("q31/q32 scalar law: EXISTS counts each order once regardless of heavy-lineitem multiplicity; the pivot's conditional sums partition the order count exactly") {
    val heavyOrders = liRows.filter(_._4 > 49).map(_._1).toSet
    val expect31 = ordRows.filter(o => heavyOrders(o._1))
      .groupBy(_._6).toSeq.sortBy(_._1).map { case (p, g) => (p, g.size.toLong) }
    val got31 = graft.ops.Relational2.q31ExistsAgg(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got31 == expect31)
    val seg = custRows.map(c => c._1 -> c._5).toMap
    val joined = ordRows.flatMap(o => seg.get(o._2).map(s => (s, o._3, o._4)))
    val expect32 = joined.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, g) =>
      (s, g.count(_._2 == "O").toLong, g.count(_._2 == "F").toLong,
        g.count(_._2 == "P").toLong,
        g.filter(_._2 == "O").map(r => d4(r._3)).sum.toDouble) }
    val got32 = graft.ops.Relational2.q32Pivot(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got32 == expect32)
    got32.foreach { case (s, o, f, p, _) =>
      assert(o + f + p == joined.count(_._1 == s).toLong,
        "status counts must partition the segment's orders") }
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
