package graft

import org.apache.spark.sql.functions._

/** Ground-truth laws for the round-12 batch-23 operators: shard balance
  * (q169), the token-frequency spectrum (q170), and the pairwise
  * source-overlap matrix (q171). */
class ScaleOps23Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeDocs(dir: java.nio.file.Path,
                        rows: Seq[(Long, String, String)]): Unit =
    rows.map { case (id, txt, src) => (id, txt, "en", src, 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  /** Scalar restatement of [[graft.ops.Relational3.splitBucket]]. */
  private def splitBucketScalar(id: Long): Long = {
    val a = 2654435761L
    val id32 = java.lang.Math.floorMod(id, 4294967296L)
    val hi = id32 >> 16
    val lo = id32 % 65536L
    java.lang.Math.floorMod((hi * a % 65536L) * 65536L + lo * a, 4294967296L)
  }

  private def tokensOf(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  // --- q169 shard balance -----------------------------------------------------

  test("q169: real corpus — shards, counts, shares and skew re-derive from the scalar portable hash; totals conserve") {
    val got = graft.ops.ScaleOps23.q169ShardBalance(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val docs = graft.ops.Relational.t(spark, sf, "documents")
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => (r.getLong(0), tokensOf(r.getString(1)).size.toLong))
    val nShards = graft.ops.ScaleOps23.Q169Shards
    val total = docs.map(_._2).sum
    val expected = docs.groupBy(d => splitBucketScalar(d._1) % nShards)
      .toSeq.map { case (shard, ds) =>
        val nt = ds.map(_._2).sum
        (shard, ds.size.toLong, nt, nt * 1000000L / total,
          nt * nShards * 1000000L / total - 1000000L)
      }.sortBy(_._1)
    assert(got == expected, s"\n got=$got\n exp=$expected")
    // conservation: every document lands in exactly one shard
    assert(got.map(_._2).sum == docs.length)
    assert(got.map(_._3).sum == total)
    // balance is a STATISTICAL property (≈8 docs/shard at sf0.001 —
    // ±35% sampling noise is expected; the ppm readout is the point of
    // the query, not an exact law). Only the hard bound holds exactly:
    // no shard can carry less than nothing or more than everything.
    got.foreach { case (sh, _, _, _, skew) =>
      assert(skew > -1000000L && skew < (graft.ops.ScaleOps23.Q169Shards - 1) * 1000000L,
        s"shard $sh skew $skew ppm out of the hard range")
    }
  }

  test("splitBucketScalar ≡ the column splitBucket on 500 seeded-random non-negative ids — the shared contract every hash mirror (q51/q62/q169/q172) rides") {
    val rnd = new scala.util.Random(7)
    val ids = (1 to 500).map { _ =>
      (rnd.nextLong() & Long.MaxValue) >> rnd.nextInt(62)
    }.distinct
    val got = ids.toDF("id")
      .select(col("id"), graft.ops.Relational3.splitBucket(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(got(id) == splitBucketScalar(id),
        s"splitBucket($id): col ${got(id)}, scalar ${splitBucketScalar(id)}")
    }
  }

  // --- q170 token-frequency spectrum -------------------------------------------

  test("q170: hand corpus — exact-integer frequency buckets and the share arithmetic") {
    val dir = tempDir("q170-hand")
    // freqs: 'a'×9 (bucket 3), 'b'×2 and 'c'×3 (bucket 1), 'd'×1 (bucket 0)
    writeDocs(dir, Seq(
      (1L, "a a a a a a a a a", "s0"),
      (2L, "b b c c c d", "s0")))
    val got = graft.ops.ScaleOps23.q170FreqSpectrum(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // V=4 types, T=15 occurrences
    assert(got == Seq(
      (0L, 1L, 1L, 250000L, 1000000L * 1L / 15L),
      (1L, 2L, 5L, 500000L, 1000000L * 5L / 15L),
      (3L, 1L, 9L, 250000L, 1000000L * 9L / 15L)))
  }

  test("q170: real corpus — spectrum re-derives from a scalar unigram table; vocabulary and mass conserve") {
    val got = graft.ops.ScaleOps23.q170FreqSpectrum(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val docs = graft.ops.Relational.t(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val uni = docs.flatMap(tokensOf).groupBy(identity)
      .map { case (_, xs) => xs.size.toLong }.toSeq
    val v = uni.size.toLong
    val t = uni.sum
    def bucketOf(c: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(c)
    val expected = uni.groupBy(bucketOf).toSeq.map { case (b, cs) =>
      (b, cs.size.toLong, cs.sum, cs.size.toLong * 1000000L / v,
        cs.sum * 1000000L / t)
    }.sortBy(_._1)
    assert(got == expected, s"\n got=$got\n exp=$expected")
    assert(got.map(_._2).sum == v && got.map(_._3).sum == t)
  }

  // --- q171 source-overlap matrix ----------------------------------------------

  /** Scalar 8-token sliding shingle STRING set (the r10 rule: re-derive
    * from strings, not from the production hash kernel). */
  private def shingleSet(texts: Seq[String]): Set[String] =
    texts.flatMap { txt =>
      val ts = txt.trim.toLowerCase.split("\\s+")
      if (ts.length < 8) Seq.empty
      else ts.sliding(8).map(_.mkString(" ")).toSeq
    }.toSet

  test("q171: hand corpus — a planted shared 8-gram run shows up in exactly one source pair with the overlap law") {
    val dir = tempDir("q171-hand")
    val shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9"        // 2 shingles
    writeDocs(dir, Seq(
      (1L, shared + " aaa", "sA"),                    // 3 shingles in sA
      (2L, shared, "sB"),                             // 2 shingles in sB
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8", "sC")))         // 1 foreign shingle
    val got = graft.ops.ScaleOps23.q171SourceOverlap(spark, dir.toString)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // sA∩sB = the 2 planted shingles; min(|A|,|B|) = 2 → overlap 100%
    assert(got == Seq((1, "sA", "sB", 2L, 3L, 2L, 1000000L)))
  }

  // --- q172 epoch-shuffle audit ------------------------------------------------

  /** Scalar double-hash epoch key (hash(hash(id) XOR epoch·salt)). */
  private def epochKey(id: Long, epoch: Int): Long =
    splitBucketScalar(splitBucketScalar(id) ^
      (epoch * graft.ops.ScaleOps23.Q172EpochSalt))

  private def scalarBatches(ids: Seq[Long], epoch: Int): Map[Long, Long] = {
    val b = graft.ops.ScaleOps23.Q172BatchSize
    ids.sortBy(id => (epochKey(id, epoch), id)).zipWithIndex
      .map { case (id, i) => id -> (i / b) }.toMap
  }

  private def coBatchPairs(batchOf: Map[Long, Long]): Set[(Long, Long)] =
    batchOf.groupBy(_._2).values.flatMap { m =>
      val ids = m.keys.toSeq.sorted
      ids.combinations(2).map { case Seq(a, bb) => (a, bb) }
    }.toSet

  test("q169: an all-whitespace corpus still lists its shards (docs counted, zero tokens) with shares pinned to 0 — never a divide-by-zero") {
    val dir = tempDir("q169-empty")
    writeDocs(dir, Seq((1L, "  ", "s"), (2L, " \t ", "s")))
    val got = graft.ops.ScaleOps23.q169ShardBalance(spark, dir.toString)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.map(_._1).sum == 2L)            // both docs sharded
    assert(got.forall(r => r._2 == 0L && r._3 == 0L && r._4 == 0L))
  }

  test("q172: a single-document corpus has no pairs in either epoch — repeat_fp pins to 0, never a divide-by-zero") {
    val dir = tempDir("q172-single")
    writeDocs(dir, Seq((7L, "only doc", "s")))
    val got = graft.ops.ScaleOps23.q172EpochShuffle(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((1L, 1L, 0L, 0L, 0L)))
  }

  test("q172: degenerate corpus — with at most one batch, reshuffling cannot help: every pair repeats") {
    val dir = tempDir("q172-hand")
    writeDocs(dir, Seq((1L, "x", "s"), (2L, "y", "s"), (3L, "z", "s")))
    val got = graft.ops.ScaleOps23.q172EpochShuffle(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((3L, 1L, 3L, 3L, 1000000L)))
  }

  test("q172: real corpus — all five columns re-derive from the scalar double-hash permutations; the shipped shuffle sits near the independence baseline where the rejected salts do not") {
    val got = graft.ops.ScaleOps23.q172EpochShuffle(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).head
    val ids = graft.ops.Relational.t(spark, sf, "documents")
      .select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSeq
    val b = graft.ops.ScaleOps23.Q172BatchSize
    val p0 = coBatchPairs(scalarBatches(ids, 0))
    val p1 = coBatchPairs(scalarBatches(ids, 1))
    val rep = (p0 intersect p1).size.toLong
    val expected = (ids.size.toLong, (ids.size + b - 1) / b,
      p0.size.toLong, rep, rep * 1000000L / p0.size)
    assert(got == expected, s"\n got=$got\n exp=$expected")
    // the audit DISCRIMINATES (the reason the key is hash∘xor∘hash):
    // an additive salt on the raw id — the rejected first draft — keeps
    // epochs near-rotations of each other and scores far above the
    // shipped form on the same corpus
    val salt = graft.ops.ScaleOps23.Q172EpochSalt
    def additiveBatches(epoch: Int): Map[Long, Long] =
      ids.sortBy(id => (splitBucketScalar(id + epoch * salt), id)).zipWithIndex
        .map { case (id, i) => id -> (i / b) }.toMap
    val addRep = (coBatchPairs(additiveBatches(0))
      intersect coBatchPairs(additiveBatches(1))).size.toLong
    assert(addRep > 3 * rep,
      s"additive-salt repeat $addRep should far exceed the shipped $rep")
    // and the shipped form is a genuine reshuffle: strictly fewer than
    // half the pairs repeat (the degenerate single-batch law is 100%)
    assert(rep * 2 < p0.size)
  }

  // --- q173 data-constrained epoch planning ------------------------------------

  test("q173: hand corpus — isqrt targets, the halving geometric series, and the utility law all hand-compute") {
    val dir = tempDir("q173-hand")
    // sA: 10 tokens, sB: 40. B = 2·50 = 100; √ weights 3 and 6, S = 9.
    // targetA = 100·3/9 = 33 → e=3, part=3:
    //   effA_fp = 10e6·(16−2)/8 + 3e6/8 = 17,500,000 + 375,000
    //   → effective 17, epochs 4, utility 17,875,000/33 = 541,666
    // targetB = 100·6/9 = 66 → e=1, part=26:
    //   effB_fp = 40e6·(4−2)/2 + 26e6/2 = 40e6 + 13e6
    //   → effective 53, epochs 2, utility 53,000,000/66 = 803,030
    def words(k: Int) = (1 to k).map(i => s"w$i").mkString(" ")
    writeDocs(dir, Seq(
      (1L, words(10), "sA"), (2L, words(40), "sB")))
    val got = graft.ops.ScaleOps23.q173EpochBudget(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("sA", 10L, 33L, 4L, 17L, 17875000L / 33L),
      ("sB", 40L, 66L, 2L, 53L, 53000000L / 66L)))
  }

  test("q173: real corpus — the plan re-derives from scalar BigInt arithmetic; within-data sources keep utility exactly 1e6") {
    val got = graft.ops.ScaleOps23.q173EpochBudget(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got.nonEmpty)
    val perSrc = graft.ops.Relational.t(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), tokensOf(r.getString(1)).size.toLong))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      .filter(_._2 >= 1).toSeq
    def isqrt(n: Long): Long = {
      var x = math.sqrt(n.toDouble).toLong
      while (x * x > n) x -= 1
      while ((x + 1) * (x + 1) <= n) x += 1
      x
    }
    val btot = BigInt(graft.ops.ScaleOps23.Q173BudgetMult) * perSrc.map(_._2).sum
    val stot = perSrc.map(p => isqrt(p._2)).sum
    val expected = perSrc.map { case (src, n) =>
      val target = (btot * isqrt(n) / stot).toLong
      val e = target / n
      val part = target % n
      val p2 = 1L << e.toInt
      val eff = (BigInt(n) * 1000000 * (2 * p2 - 2) / p2).toLong +
        (BigInt(part) * 1000000 / p2).toLong
      val utility = if (target == 0) 1000000L else eff / target
      (src, n, target, e + (if (part > 0) 1L else 0L), eff / 1000000L, utility)
    }.sortBy(_._1)
    assert(got == expected, s"\n got=$got\n exp=$expected")
    // law: a source whose target fits inside its own data loses nothing
    got.filter(_._4 <= 1).foreach { case (src, _, _, _, _, u) =>
      assert(u == 1000000L, s"$src within-data utility $u")
    }
    // law: utility strictly decreases past one epoch (halving is real)
    got.filter(_._4 >= 2).foreach { case (src, _, _, _, _, u) =>
      assert(u < 1000000L, s"$src repeated-data utility $u")
    }
  }

  test("q171: real corpus — the top-20 matrix re-derives from scalar shingle STRING sets per source") {
    val got = graft.ops.ScaleOps23.q171SourceOverlap(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got.nonEmpty)
    val bySrc = graft.ops.Relational.t(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, xs) => s -> shingleSet(xs.map(_._2).toSeq) }
    val pairs = bySrc.keys.toSeq.sorted.combinations(2).toSeq
      .map { case Seq(a, b) =>
        val sh = (bySrc(a) intersect bySrc(b)).size.toLong
        (a, b, sh, bySrc(a).size.toLong, bySrc(b).size.toLong)
      }
      .filter(_._3 > 0)
      .sortBy(p => (-p._3, p._1, p._2))
      .take(graft.ops.ScaleOps23.Q171TopK)
      .zipWithIndex.map { case ((a, b, sh, na, nb), i) =>
        (i + 1, a, b, sh, na, nb, sh * 1000000L / math.min(na, nb))
      }
    assert(got == pairs, s"\n got=$got\n exp=$pairs")
  }
}
