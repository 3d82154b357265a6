package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import graft.functions.GroupedTopK

class GroupedTopKSpec extends GraftSuite {
  import spark.implicits._

  private def topkCol(key: String, id: String, k: Int) =
    column(GroupedTopK(expression(col(key)), expression(col(id)), k)
      .toAggregateExpression())

  test("matches the window row_number formulation on the part table") {
    val p = graft.ops.Relational.t(spark, "/root/testdata/sf0.001", "part")
    val viaAgg = p.groupBy($"p_type")
      .agg(topkCol("p_retailprice", "p_partkey", 3).as("topk"))
      .select($"p_type", posexplode($"topk"))
      .select($"p_type", ($"pos" + 1).as("rank"),
        $"col.key".as("price"), $"col.id".as("id"))
    val w = Window.partitionBy($"p_type")
      .orderBy($"p_retailprice".desc, $"p_partkey")
    val viaWindow = p
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
      .select($"p_type", $"rank".cast("int").as("rank"),
        $"p_retailprice".as("price"), $"p_partkey".as("id"))
    assert(viaAgg.orderBy("p_type", "rank").collect().toSeq ==
      viaWindow.orderBy("p_type", "rank").collect().toSeq)
  }

  test("ties break by id ascending; fewer rows than k is fine") {
    val df = Seq(
      ("a", 5.0, 10L), ("a", 5.0, 7L), ("a", 5.0, 20L), ("a", 1.0, 1L),
      ("b", 2.0, 2L)).toDF("g", "key", "id")
      .repartition(4) // force multi-partition partials + merge path
    val out = df.groupBy($"g").agg(topkCol("key", "id", 2).as("topk"))
      .select($"g", posexplode($"topk"))
      .select($"g", $"col.key", $"col.id")
      .orderBy($"g", $"pos").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(out == Seq(("a", 5.0, 7L), ("a", 5.0, 10L), ("b", 2.0, 2L)))
  }

  test("SQL registration: grouped_top_k usable from spark.sql") {
    graft.functions.GraftExtensions.registerAll(spark)
    Seq(("a", 3.0, 1L), ("a", 9.0, 2L), ("a", 5.0, 3L), ("b", 1.0, 4L))
      .toDF("g", "key", "id").createOrReplaceTempView("gtk_in")
    val rows = spark.sql(
      """SELECT g, t.id FROM (
        |  SELECT g, grouped_top_k(key, id, 2) AS topk FROM gtk_in GROUP BY g
        |) LATERAL VIEW explode(topk) AS t ORDER BY g, t.key DESC""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("a", 2L), ("a", 3L), ("b", 4L)))
  }

  test("law: buffer top-k == sort-take for random inputs, splits, and k") {
    // the TopKBuffer + merge path must equal a global sort-take for any
    // data distribution (ties included) and any partition split
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(30)
      val k = 1 + rnd.nextInt(6)
      // small key range forces heavy ties
      val rows = Seq.fill(n)((rnd.nextInt(5).toDouble, rnd.nextLong() % 100))
      val want = rows.sortWith { case ((ka, ia), (kb, ib)) =>
        ka > kb || (ka == kb && ia < ib) }.take(k)
      val split = if (n == 0) 1 else 1 + rnd.nextInt(4)
      val bufs = rows.grouped(math.max(1, (n + split - 1) / split)).map { part =>
        val b = new graft.functions.TopKBuffer(k)
        part.foreach { case (key, id) => b.offer(key, id) }
        b
      }.toSeq
      val merged = bufs.headOption.getOrElse(new graft.functions.TopKBuffer(k))
      bufs.drop(1).foreach { o =>
        (0 until o.size).foreach(i => merged.offer(o.keys(i), o.ids(i)))
      }
      val got = merged.sortedIndices.map(i => (merged.keys(i), merged.ids(i))).toSeq
      assert(got == want, s"n=$n k=$k split=$split rows=$rows")
    }
  }

  test("NaN keys rank greatest (matching Spark DESC ordering) and never wedge the buffer") {
    // zero-norm vectors produce cos = 0/0 = NaN; the window formulation
    // this aggregate replaces ordered NaN first under DESC — so must we.
    // Regression: the old comparator made NaN incomparable, so a full
    // buffer whose worst slot held NaN rejected every later offer.
    val df = Seq(
      ("a", Double.NaN, 1L), ("a", 5.0, 2L), ("a", 7.0, 3L), ("a", 9.0, 4L),
      ("a", 8.0, 5L)).toDF("g", "key", "id").repartition(3)
    val out = df.groupBy($"g").agg(topkCol("key", "id", 2).as("topk"))
      .select(posexplode($"topk")).select($"col.id").as[Long].collect().toSeq
    assert(out == Seq(1L, 4L)) // NaN first, then 9.0
    // buffer-level: NaN lands in worst slot of a full buffer, then better keys arrive
    val b = new graft.functions.TopKBuffer(2)
    b.offer(Double.NaN, 1L); b.offer(1.0, 2L)
    b.offer(5.0, 3L); b.offer(9.0, 4L)
    val kept = b.sortedIndices.map(i => (b.keys(i), b.ids(i))).toSeq
    assert(kept.map(_._2) == Seq(1L, 4L), kept) // NaN greatest, 9.0 replaces 1.0/5.0
  }

  test("SQL coercion: INT key and INT id are cast, not ClassCastException") {
    graft.functions.GraftExtensions.registerAll(spark)
    Seq(("a", 3, 1), ("a", 9, 2), ("b", 1, 4))
      .toDF("g", "key", "id").createOrReplaceTempView("gtk_int_in")
    val rows = spark.sql(
      """SELECT g, t.id FROM (
        |  SELECT g, grouped_top_k(key, id, 1) AS topk FROM gtk_int_in GROUP BY g
        |) LATERAL VIEW explode(topk) AS t ORDER BY g""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("a", 2L), ("b", 4L)))
    // foldable-but-non-literal k is accepted
    val viaExpr = spark.sql(
      "SELECT size(grouped_top_k(key, id, 1 + 1)) FROM gtk_int_in GROUP BY g")
      .as[Int].collect().toSeq.sorted
    assert(viaExpr == Seq(1, 2))
    // wrong arity fails with a clear message, not IndexOutOfBounds
    val err = intercept[Exception] {
      spark.sql("SELECT grouped_top_k(key, id) FROM gtk_int_in GROUP BY g").collect()
    }
    assert(err.getMessage.contains("3 arguments"), err.getMessage)
  }

  test("plans as partial+final ObjectHashAggregate (map-side k-pruning)") {
    val p = graft.ops.Relational.t(spark, "/root/testdata/sf0.001", "part")
    val plan = p.groupBy($"p_type")
      .agg(topkCol("p_retailprice", "p_partkey", 3).as("topk"))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan)
    assert(plan.contains("partial_grouped_top_k"), plan)
  }
}
