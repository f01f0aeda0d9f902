package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.kmeans.KMeansOps

/** Property tests (SURVEY.md §5), driven by seeded ScalaCheck
  * generators: shuffle/partitioning invariance of the Lloyd round (the
  * distributed aggregation must not depend on row order or partition
  * layout — the property the reference gets from MapReduce determinism)
  * and scale-inverse of the mean. */
class PropertySpec extends SparkSessionSpec {
  import spark.implicits._

  private val pointGen = Gen.listOfN(2, Gen.chooseNum(-50.0, 50.0))
  private val setGen = Gen.chooseNum(5, 40).flatMap(n => Gen.listOfN(n, pointGen))

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private def roundOn(pts: Seq[List[Double]], parts: Int) = {
    val cents = Array(Array(-10.0, -10.0), Array(0.0, 0.0), Array(10.0, 10.0))
    KMeansOps.lloydRound(
      pts.map(_.toSeq).toDF("v").repartition(parts), "v", cents)
      .select("cluster", "centroid", "n")
      .as[(Int, Seq[Double], Long)].collect()
      .map { case (c, v, n) => (c, v.map(x => math.rint(x * 1e9) / 1e9), n) }
      .sortBy(_._1).toSeq
  }

  test("lloydRound is invariant to row order and partition count") {
    samples(setGen, 8).foreach { pts =>
      val a = roundOn(pts, 1)
      val b = roundOn(new scala.util.Random(1).shuffle(pts), 7)
      assert(a == b, s"order/partition dependence on $pts")
    }
  }

  test("summarize counts merge across splits like the CF merge ctor") {
    samples(setGen, 8).foreach { pts =>
      val cents = Array(Array(0.0, 0.0), Array(5.0, 5.0))
      val (l, r) = pts.splitAt(pts.size / 2)
      def sizes(xs: Seq[List[Double]]): Map[Int, Long] =
        if (xs.isEmpty) Map.empty
        else KMeansOps.assign(xs.map(_.toSeq).toDF("v"), "v", cents)
          .groupBy("cluster").count()
          .as[(Int, Long)].collect().toMap
      val whole = sizes(pts)
      val merged = (sizes(l).toSeq ++ sizes(r).toSeq)
        .groupMapReduce(_._1)(_._2)(_ + _)
      assert(whole == merged)
    }
  }

  test("topKPerKey equals a driver-side reference over random k and data") {
    val caseGen = for {
      n <- Gen.chooseNum(1, 400)
      k <- Gen.chooseNum(1, 15)
      rows <- Gen.listOfN(n, for {
        key <- Gen.chooseNum(0L, 12L)
        score <- Gen.chooseNum(-100.0, 100.0)
      } yield (key, score))
      parts <- Gen.chooseNum(1, 6)
    } yield (rows.zipWithIndex.map { case ((key, sc), i) =>
      (key, i.toLong, math.rint(sc * 4) / 4) }, k, parts)
    samples(caseGen, 6).foreach { case (rows, k, parts) =>
      val df = rows.toDF("key", "id", "score").repartition(parts)
      val got = graft.plans.TopKPerKey.topKPerKey(df,
          Seq("key"), Seq("score" -> false, "id" -> true), k)
        .as[(Long, Long, Double)].collect().toSet
      val want = rows.groupBy(_._1).values.flatMap(g =>
        g.sortBy { case (_, id, sc) => (-sc, id) }.take(k)).toSet
      assert(got == want, s"k=$k parts=$parts")
    }
  }

  test("components equals a driver-side union-find on random graphs") {
    val edgeGen = for {
      n <- Gen.chooseNum(2, 30)
      m <- Gen.chooseNum(1, 40)
      es <- Gen.listOfN(m,
        Gen.zip(Gen.chooseNum(0L, n.toLong - 1), Gen.chooseNum(0L, n.toLong - 1)))
    } yield es.filter(e => e._1 != e._2)
    samples(edgeGen, 6).filter(_.nonEmpty).foreach { edges =>
      val got = operators.Dedup.components(edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      // reference: sequential union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val roots = nodes.groupBy(find).map { case (_, ns) => ns.min -> ns }
      val expected = roots.flatMap { case (minId, ns) =>
        ns.map(_ -> minId) }.toMap
      assert(got == expected, s"mismatch on edges $edges")
    }
  }

  test("vecScale(vecScale(v, n), 1/n) is identity (Point.scale inverse)") {
    val cases = samples(Gen.zip(pointGen, Gen.chooseNum(1, 1000)), 20)
    cases.foreach { case (p, n) =>
      val out = Seq(p.toSeq).toDF("v")
        .select(graft.functions.VectorFunctions.vecScale(
          graft.functions.VectorFunctions.vecScale(col("v"), lit(n.toDouble)),
          lit(1.0 / n)).as("v"))
        .as[Seq[Double]].head()
      out.zip(p).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }
}
