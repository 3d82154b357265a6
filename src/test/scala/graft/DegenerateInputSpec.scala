package graft

import org.apache.spark.sql.DataFrame
import scala.concurrent.{Await, Future, TimeoutException}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** The systematic drill for the PLANNER-BLOW-UP hazard class (r16
  * verdict #3): q192's empty-corner spec found a latent ~2²⁰-node
  * `CollapseProject` inlining hang in the log₂ scoring chain — an
  * iterative kernel whose rounds multiply-reference their predecessor,
  * sitting on a runtime-EMPTY relation that AQE's empty-relation
  * propagation collapses to a LocalRelation the physical project-
  * collapse then inlines into. One spec found it by accident; this
  * suite drills the WHOLE class deliberately: every iterative/chained
  * kernel (connected components, PageRank, k-means, BFS both routes,
  * CUSUM's window chain, the BPE train rounds and its compiled
  * merge-replace chain, the WHT band explode, and the log₂ disposition
  * — whose r16 hang this suite exists to generalize, fixed at the root
  * in r17 by collapsing the chain into the single
  * [[graft.functions.NegLog2Fp]] expression) runs on
  *
  *   - an ALL-EMPTY corpus (every table present with its real schema,
  *     zero rows — the AQE empty-propagation shape), and
  *   - a SINGLE-ROW corpus (the smallest non-empty fixed point —
  *     degenerate frontiers, single-member clusters, one-token vocab),
  *
  * each under a hard wall-clock bound that separates "planned and ran"
  * from "planning never returns" (the measured blow-up was >30 min;
  * the bound is 180 s on inputs that plan in milliseconds). A kernel
  * that trips here gets a kernel-level fix (the r16 interim was a
  * q190-style early-exit guard; the r17 durable form is removing the
  * multiply-referenced alias tower itself, as
  * [[graft.functions.NegLog2Fp]] did), not a spec-side workaround. */
class DegenerateInputSpec extends GraftSuite {

  private val src = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Copy every table's real schema with `n` rows into a fresh dir —
    * parquet with zero rows is exactly the runtime-empty relation AQE
    * propagates. Events go through the dtype-branching reader so the
    * fixture carries the schema the engine actually serves. */
  private def degenDir(label: String, n: Int): String = {
    val dir = tempDir(s"degen-$label")
    tables.foreach { t =>
      val df =
        if (t == "events") graft.ops.Relational.events(spark, src)
        else spark.read.parquet(s"$src/$t.parquet")
      df.limit(n).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir.toString
  }

  private lazy val emptyDir = degenDir("empty", 0)
  private lazy val oneDir = degenDir("one", 1)

  /** Hard bound: fail loudly (instead of hanging the suite) when a
    * kernel's planning or execution never returns on a degenerate
    * input. The spawned thread is leaked on timeout — acceptable for a
    * failing test that has just found a planner hang. */
  private def within[T](label: String)(f: => T): T =
    try Await.result(Future(f), 180.seconds)
    catch {
      case _: TimeoutException =>
        fail(s"$label did not return within 180s on a degenerate input — " +
          "the q192 planner-blow-up class; fix at the kernel (collapse " +
          "the multiply-referenced alias tower into one expression, as " +
          "NegLog2Fp did, or early-exit before building it)")
    }

  /** Each kernel's DEFINED empty-input behavior — the drill pins it so
    * a future change to a degenerate corner is a deliberate one. */
  private sealed trait EmptyShape
  private case object ReturnsEmpty extends EmptyShape
  /** BFS seeds from MIN(pk): on an empty graph BOTH engines emit the one
    * degenerate (hop 0, NULL seed counted once) row — the oracle
    * mirror's scalar subquery does exactly the same. */
  private case class ReturnsRows(rows: Seq[Seq[Any]]) extends EmptyShape
  /** Loud refusal is a legitimate degenerate-input answer (q151: the
    * unrolled 8-round SQL mirror REQUIRES a corpus supporting every
    * merge; an exhausted corpus refuses rather than mirror-drifting) —
    * what the drill rules out is the HANG, never the loud error. */
  private case class RefusesLoudly(substr: String) extends EmptyShape

  private val kernels: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame, EmptyShape)] = Seq(
    ("q60_dedup_clusters (connected-components loop)",
      graft.ops.ScaleOps2.q60DedupClusters _, ReturnsEmpty),
    ("q96_pagerank (Pregel loop)",
      graft.ops.ScaleOps7.q96Pagerank _, ReturnsEmpty),
    ("q113_kmeans (re-estimation rounds)",
      graft.ops.ScaleOps9.q113Kmeans _, ReturnsEmpty),
    ("q127_bfs (frontier loop, measured route)",
      graft.ops.ScaleOps10.q127BfsHops _, ReturnsRows(Seq(Seq(0, 1L)))),
    ("q127_bfs (shuffle route)",
      (s: org.apache.spark.sql.SparkSession, d: String) =>
        graft.ops.ScaleOps10.q127BfsHopsShuffle(s, d),
      ReturnsRows(Seq(Seq(0, 1L)))),
    ("q129_cusum (cumulative window chain)",
      graft.ops.ScaleOps11.q129Cusum _, ReturnsEmpty),
    ("q150_bpe_train (driver merge rounds)",
      graft.ops.ScaleOps17.q150BpeTrain _, ReturnsEmpty),
    ("q151_bpe_encode (compiled merge-replace chain)",
      graft.ops.ScaleOps17.q151BpeEncode _, RefusesLoudly("exhausted")),
    ("q160_wht_bands (banded transform)",
      graft.ops.ScaleOps19.q160WhtBands _, ReturnsEmpty),
    ("q191_log_plx_mix (the single-expression log2 chain end-to-end)",
      graft.ops.ScaleOps31.q191LogPlxTertileMix _, ReturnsEmpty))

  test("every iterative/chained kernel terminates on an ALL-EMPTY corpus (runtime-empty relations under AQE empty-propagation) and returns its defined empty-input result") {
    kernels.foreach { case (label, fn, shape) =>
      shape match {
        case ReturnsEmpty =>
          val rows = within(label) { fn(spark, emptyDir).collect() }
          assert(rows.isEmpty,
            s"$label produced ${rows.length} rows from an all-empty corpus")
        case ReturnsRows(exp) =>
          val rows = within(label) { fn(spark, emptyDir).collect() }
          assert(rows.map(_.toSeq).toSeq == exp,
            s"$label empty-input shape drifted: ${rows.map(_.toSeq).toSeq}")
        case RefusesLoudly(substr) =>
          val e = intercept[IllegalArgumentException] {
            within(label) { fn(spark, emptyDir).collect() }
          }
          assert(e.getMessage.contains(substr),
            s"$label refused with an unexpected message: ${e.getMessage}")
      }
    }
  }

  test("every iterative/chained kernel terminates on a SINGLE-ROW corpus — degenerate frontiers, single-member clusters, one-token vocabularies all reach a fixed point (or refuse loudly where that is the pinned corner)") {
    kernels.foreach { case (label, fn, shape) =>
      try within(label) { fn(spark, oneDir).collect(); () }
      catch {
        case e: IllegalArgumentException =>
          shape match {
            case RefusesLoudly(substr) =>
              assert(e.getMessage.contains(substr),
                s"$label refused with an unexpected message: ${e.getMessage}")
            case _ => throw e
          }
      }
    }
  }
}
