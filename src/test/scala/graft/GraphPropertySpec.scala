package graft

import org.apache.spark.sql.functions._
import graft.graph.Graph

/** Randomized brute-force parity for the graph family (the LifecycleSpec
  * discipline): every operator checked against an independent driver-side
  * reference implementation on seeded random digraphs — hand-picked
  * fixtures prove the formulas, these prove there is no shape the
  * distributed plans get wrong.
  */
class GraphPropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Seeded random digraph: ~p·n² directed edges over n vertices with
    * random multiplicities (self-loops included deliberately — the
    * operators must normalize them away or count them per contract).
    */
  private def randomEdges(seed: Long, n: Int, p: Double): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (for {
      a <- 0 until n; b <- 0 until n
      if rnd.nextDouble() < p
    } yield (a.toLong, b.toLong, 1L + rnd.nextInt(3).toLong)).toSeq
  }

  private def df(edges: Seq[(Long, Long, Long)]) =
    edges.toDF("src", "dst", "n_trans")

  // driver-side reference: BFS shortest distances along edge direction
  private def bfsHarmonic(edges: Seq[(Long, Long, Long)], maxDist: Int): Map[Long, Double] = {
    val e = edges.filter(t => t._1 != t._2).map(t => (t._1, t._2)).distinct
    val verts = edges.flatMap(t => Seq(t._1, t._2)).distinct
    val adj = e.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    val L = (1 to maxDist).foldLeft(1L)((a, b) => a / BigInt(a).gcd(BigInt(b)).toLong * b)
    // BFS from every vertex; contributions land on the REACHED vertex
    val sums = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    verts.foreach { u =>
      val dist = scala.collection.mutable.Map(u -> 0)
      var frontier = List(u)
      var d = 0
      while (frontier.nonEmpty && d < maxDist) {
        d += 1
        frontier = frontier.flatMap(x => adj.getOrElse(x, Nil))
          .filterNot(dist.contains).distinct
        frontier.foreach(x => dist(x) = d)
        frontier.foreach { x => if (x != u) sums(x) += L / d }
      }
    }
    verts.map(v => v -> sums(v).toDouble / L).toMap
  }

  private def bruteTriangles(edges: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    val und = edges.filter(t => t._1 != t._2)
      .map(t => (math.min(t._1, t._2), math.max(t._1, t._2))).toSet
    val verts = und.flatMap(t => Seq(t._1, t._2)).toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- verts.indices; j <- (i + 1) until verts.size; k <- (j + 1) until verts.size
      a = verts(i); b = verts(j); c = verts(k)
      if und((a, b)) && und((b, c)) && und((a, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  private def bruteComponents(edges: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    val verts = edges.flatMap(t => Seq(t._1, t._2)).distinct
    val parent = scala.collection.mutable.Map(verts.map(v => v -> v): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    verts.map(v => v -> find(v)).toMap
  }

  private def brutePageRank(edges: Seq[(Long, Long, Long)], iters: Int,
                            damping: Double): Map[Long, Double] = {
    val verts = edges.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val n = verts.size.toDouble
    val outTot = edges.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum.toDouble }
    val in = edges.groupBy(_._2)
    var r = verts.map(v => v -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dangling = verts.filterNot(outTot.contains).map(r).sum
      r = verts.map { v =>
        val contrib = in.getOrElse(v, Nil)
          .map { case (s, _, w) => r(s) * (w.toDouble / outTot(s)) }.sum
        v -> ((1.0 - damping) / n + damping * (contrib + dangling / n))
      }.toMap
    }
    r
  }

  private def brutePpr(edges: Seq[(Long, Long, Long)], seeds: Set[Long],
                       iters: Int, damping: Double): Map[Long, Double] = {
    val verts = edges.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val nS = seeds.size.toDouble
    val outTot = edges.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum.toDouble }
    val in = edges.groupBy(_._2)
    var r = verts.map(v => v -> (if (seeds(v)) 1.0 / nS else 0.0)).toMap
    for (_ <- 0 until iters) {
      val dangling = verts.filterNot(outTot.contains).map(r).sum
      r = verts.map { v =>
        val contrib = in.getOrElse(v, Nil)
          .map { case (s, _, w) => r(s) * (w.toDouble / outTot(s)) }.sum
        v -> (damping * contrib +
          (if (seeds(v)) (1.0 - damping + damping * dangling) / nS else 0.0))
      }.toMap
    }
    r
  }

  private val cases = Seq((1L, 24, 0.08), (2L, 40, 0.04), (3L, 16, 0.20))

  test("harmonicCentrality matches driver BFS on random digraphs") {
    cases.foreach { case (seed, n, p) =>
      val es = randomEdges(seed, n, p)
      val got = Graph.harmonicCentrality(df(es))
        .as[(Long, Double)].collect().toMap
      val want = bfsHarmonic(es, 6)
      assert(got === want, s"seed=$seed")
    }
  }

  test("harmonicCentralityHyperBall equals the exact form on random digraphs " +
       "(coupon regime)") {
    cases.foreach { case (seed, n, p) =>
      val es = randomEdges(seed, n, p)
      val exact = Graph.harmonicCentrality(df(es))
        .select(col("page"),
          (round(col("harmonic") * 1000000) / 1000000.0 + lit(0.0)).as("h"))
        .as[(Long, Double)].collect().toMap
      val hb = Graph.harmonicCentralityHyperBall(df(es))
        .as[(Long, Double)].collect().toMap
      assert(hb === exact, s"seed=$seed")
    }
  }

  test("triangleCensus matches the brute triple loop on random digraphs") {
    cases.foreach { case (seed, n, p) =>
      val es = randomEdges(seed, n, p)
      val got = Graph.triangleCensus(df(es)).as[(Long, Long)].collect().toMap
      assert(got === bruteTriangles(es), s"seed=$seed")
    }
  }

  test("components matches driver union-find on random digraphs") {
    cases.foreach { case (seed, n, p) =>
      val es = randomEdges(seed, n, p)
      val got = Graph.components(df(es)).as[(Long, Long)].collect().toMap
      assert(got === bruteComponents(es), s"seed=$seed")
    }
  }

  test("personalizedPageRank matches driver power iteration on random digraphs") {
    cases.foreach { case (seed, n, p) =>
      val es = randomEdges(seed, n, p)
      val verts = es.flatMap(t => Seq(t._1, t._2)).distinct
      val seeds = verts.sorted.take(math.max(1, verts.size / 5)).toSet
      val got = Graph.personalizedPageRank(df(es), seeds.toSeq.sorted, iters = 3)
        .as[(Long, Double)].collect().toMap
      val want = brutePpr(es, seeds, 3, 0.85)
      assert(got.keySet === want.keySet, s"seed=$seed")
      got.foreach { case (v, pr) =>
        assert(math.abs(pr - want(v)) < 1e-6, s"seed=$seed v=$v $pr vs ${want(v)}")
      }
    }
  }

  test("pageRank matches driver power iteration on random digraphs") {
    cases.foreach { case (seed, n, p) =>
      val es = randomEdges(seed, n, p)
      val got = Graph.pageRank(df(es), iters = 3).as[(Long, Double)].collect().toMap
      val want = brutePageRank(es, 3, 0.85)
      assert(got.keySet === want.keySet, s"seed=$seed")
      got.foreach { case (v, pr) =>
        // published ranks are 6-dp rounded; the driver reference sums in
        // a different order, so allow rounding + 1-ulp accumulation slack
        assert(math.abs(pr - want(v)) < 1e-6, s"seed=$seed v=$v $pr vs ${want(v)}")
      }
    }
  }
}
