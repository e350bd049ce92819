package graft

import org.apache.spark.sql.functions._
import graft.graph.Graph

/** [[graft.graph.Graph]] — transition edges, PageRank (hand-checked tiny
  * graph + invariants), degree census, degree-ordered triangle census.
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(rows: (Long, Long, Long)*) =
    rows.toDF("src", "dst", "n_trans")

  test("transitionEdges emits per-user consecutive pairs with multiplicity") {
    val ev = Seq(
      // user 1 visits 10 -> 20 -> 10 -> 20 (two 10->20 edges, one 20->10)
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 10L), (1L, 4L, 20L),
      // user 2 visits 30 alone (no edge)
      (2L, 5L, 30L)
    ).toDF("user_id", "ts_ord", "page")
      .withColumn("ts", timestamp_seconds(col("ts_ord") * 60))
      .withColumn("event_id", col("ts_ord"))
    val out = Graph.transitionEdges(ev, "user_id", "page", "ts", "event_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((10L, 20L, 2L), (20L, 10L, 1L)))
  }

  test("transitionEdgesIncrement: boundary transitions link through the " +
       "last-view state; late rows drop; seed-only users emit nothing") {
    def ev(rows: (Long, Long, Long)*) = rows.toDF("user_id", "ts_ord", "page")
      .withColumn("ts", timestamp_seconds(col("ts_ord") * 60))
      .withColumn("event_id", col("ts_ord"))
    val early = ev((1L, 1L, 10L), (1L, 2L, 20L), (2L, 3L, 30L))
    val standing = Graph.transitionEdges(early, "user_id", "page", "ts", "event_id")
    val views = Graph.lastViews(early, "user_id", "page", "ts", "event_id")
    // user 1 continues 20 -> 40 (the BOUNDARY edge a naive per-batch
    // derivation loses); user 3 is new; one late row for user 1 must drop
    val batch = ev((1L, 5L, 40L), (3L, 6L, 50L), (3L, 7L, 60L), (1L, 1L, 99L))
    val out = Graph.transitionEdgesIncrement(standing, views, batch,
      "user_id", "page", "ts", "event_id")
      .as[(Long, Long, Long)].collect().toSet
    // user 2 (seed only, no batch rows) emits nothing new
    assert(out === Set((10L, 20L, 1L), (20L, 40L, 1L), (50L, 60L, 1L)))
  }

  test("transitionEdgesIncrement: random multi-way time-splits fold to EXACTLY " +
       "the one-shot edge table (the g9 contract)") {
    val rnd = new scala.util.Random(41)
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(8).toLong, i.toLong, rnd.nextInt(10).toLong)
    }
    def ev(rs: Seq[(Long, Long, Long)]) = rs.toDF("user_id", "ts_ord", "page")
      .withColumn("ts", timestamp_seconds(col("ts_ord") * 60))
      .withColumn("event_id", col("ts_ord"))
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    val oneShot = edgeSet(
      Graph.transitionEdges(ev(rows), "user_id", "page", "ts", "event_id"))
    val cuts = Seq.fill(3)(rnd.nextInt(399) + 1).distinct.sorted
    val bounds = (0 +: cuts) :+ 400
    val batches = bounds.sliding(2).map { case Seq(lo, hi) =>
      ev(rows.slice(lo, hi))
    }.toSeq
    var edgesAcc = Graph.transitionEdges(batches.head, "user_id", "page", "ts", "event_id")
    var viewsAcc = Graph.lastViews(batches.head, "user_id", "page", "ts", "event_id")
    batches.tail.foreach { b =>
      edgesAcc = Graph.transitionEdgesIncrement(edgesAcc, viewsAcc, b,
        "user_id", "page", "ts", "event_id")
      viewsAcc = Graph.lastViewsApply(viewsAcc, b, "user_id", "page", "ts", "event_id")
    }
    assert(edgeSet(edgesAcc) === oneShot)
  }

  test("pageRank matches the hand-computed two-node cycle") {
    // a <-> b with equal weights: the uniform rank 0.5/0.5 is the fixed
    // point, and every iteration must reproduce it exactly
    val pr = Graph.pageRank(edges((0L, 1L, 1L), (1L, 0L, 1L)), iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(pr(0L) === 0.5 && pr(1L) === 0.5)
  }

  test("pageRank conserves total mass and redistributes dangling rank") {
    // star into a sink: 1,2,3 -> 0 and 0 has no out-edges (dangling)
    val pr = Graph.pageRank(edges((1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 2L)),
      iters = 3).as[(Long, Double)].collect().toMap
    assert(pr.size === 4)
    // mass conservation: dangling redistribution keeps the total at 1
    // (published ranks are rounded to 6 dp, so allow n·5e-7 of slack)
    assert(math.abs(pr.values.sum - 1.0) < 2.5e-6)
    // the sink concentrates rank; the sources tie by symmetry of the
    // update rule (identical in-mass: none)
    assert(pr(0L) > pr(1L))
    assert(pr(1L) === pr(2L) && pr(2L) === pr(3L))
  }

  test("pageRankResume(snapshot(n), k) == pageRank(n+k) BIT-exactly on an " +
       "asymmetric graph, for several (n, k) seams") {
    // asymmetric weights + a dangling sink so ranks are non-trivial
    // doubles (not the fixed-point 1/N the two-cycle would give)
    val e = edges((0L, 1L, 3L), (1L, 2L, 1L), (2L, 0L, 2L), (0L, 2L, 1L),
      (2L, 3L, 5L))
    for ((n, k) <- Seq((1, 2), (2, 1), (3, 2))) {
      val oneShot = Graph.pageRank(e, iters = n + k)
        .as[(Long, Double)].collect().toMap
      val resumed = Graph.pageRankResume(e, Graph.pageRankSnapshot(e, iters = n),
        extraIters = k).as[(Long, Double)].collect().toMap
      assert(resumed === oneShot, s"seam n=$n k=$k must be invisible")
      // the fused shape (r21: one prepared universe for both phases)
      // must be the same bits as the two-call form — and the one-shot
      val fused = Graph.pageRankSnapshotResume(e, iters = n, extraIters = k)
        .as[(Long, Double)].collect().toMap
      assert(fused === oneShot, s"fused seam n=$n k=$k must be invisible")
    }
  }

  test("pageRankResume: pages absent from the snapshot seed at 1/N " +
       "(a re-crawl's new pages); wrong snapshot shape is rejected loudly") {
    val e = edges((0L, 1L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
    // snapshot from the OLD crawl (page 2 not yet seen)
    val oldSnap = Graph.pageRankSnapshot(edges((0L, 1L, 1L), (1L, 0L, 1L)),
      iters = 2)
    val warm = Graph.pageRankResume(e, oldSnap, extraIters = 10)
      .as[(Long, Double)].collect().toMap
    assert(warm.keySet === Set(0L, 1L, 2L), "new pages must be ranked")
    // warm start converges to the same fixed point: the seeded 1/3 of
    // extra mass decays as d^k (0.33·0.85^10 ≈ 0.065 total), so after
    // 10 rounds every page is within that envelope of the cold answer
    val cold = Graph.pageRank(e, iters = 16).as[(Long, Double)].collect().toMap
    warm.foreach { case (p, r) => assert(math.abs(r - cold(p)) < 0.065) }
    intercept[IllegalArgumentException] {
      Graph.pageRankResume(e, oldSnap.withColumnRenamed("pr_raw", "r"), 1)
    }
  }

  test("personalizedPageRank matches the hand-computed seeded two-cycle") {
    // 0 <-> 1, seed {0}: r0 = (1, 0); each iteration moves mass around
    // the cycle while the teleport re-injects 0.15 at the seed:
    // r1 = (0.15, 0.85), r2 = (0.8725, 0.1275),
    // r3 = (0.85*0.1275 + 0.15, 0.85*0.8725) = (0.258375, 0.741625)
    val ppr = Graph.personalizedPageRank(
      edges((0L, 1L, 1L), (1L, 0L, 1L)), seeds = Seq(0L), iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(ppr(0L) === 0.258375 && ppr(1L) === 0.741625)
    // mass conservation with existing seeds (6-dp rounding slack)
    assert(math.abs(ppr.values.sum - 1.0) < 1e-6)
  }

  test("personalizedPageRank: non-seed unreachable pages rank zero; dangling " +
       "mass returns to the seeds") {
    // 0 -> 1 (1 dangling) and an unrelated component 8 -> 9, seed {0}:
    // pages 8, 9 never receive teleport or flow; 1's dangling rank
    // teleports back to seed 0 only
    val ppr = Graph.personalizedPageRank(
      edges((0L, 1L, 1L), (8L, 9L, 1L)), seeds = Seq(0L), iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(ppr(8L) === 0.0 && ppr(9L) === 0.0)
    assert(math.abs(ppr(0L) + ppr(1L) - 1.0) < 1e-6)
    assert(ppr(0L) > 0 && ppr(1L) > 0)
  }

  test("degreeCensus zero-fills pure sources and pure sinks") {
    val out = Graph.degreeCensus(edges((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L)))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) === ((2L, 4L, 0L, 0L))) // pure source
    assert(out(3L) === ((0L, 0L, 2L, 3L))) // pure sink
    assert(out(2L) === ((1L, 2L, 1L, 3L)))
  }

  test("triangleCensus counts K4 as three triangles per vertex") {
    // K4 has 4 triangles; each vertex sits on exactly 3 of them. Feed
    // directed duplicates + a self-loop to exercise normalization.
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a != b } yield (a, b, 1L)
    val out = Graph.triangleCensus(edges(k4 :+ ((2L, 2L, 1L)): _*))
      .as[(Long, Long)].collect().toMap
    assert(out === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangleCensus on a triangle-free star is empty") {
    val out = Graph.triangleCensus(edges((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L)))
    assert(out.isEmpty)
  }

  test("harmonicCentrality matches the hand-computed path and cycle") {
    // path 1->2->3->4: H(4) = 1 + 1/2 + 1/3 = 110/60; H(3) = 1 + 1/2;
    // H(2) = 1; H(1) = 0 (directed — nothing reaches the head)
    val path = Graph.harmonicCentrality(edges(
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L)))
      .as[(Long, Double)].collect().toMap
    assert(path(4L) === 110.0 / 60.0)
    assert(path(3L) === 1.5 && path(2L) === 1.0 && path(1L) === 0.0)
    // 3-cycle: every vertex is reached at distances 1 and 2
    val cyc = Graph.harmonicCentrality(edges(
      (0L, 1L, 1L), (1L, 2L, 1L), (2L, 0L, 1L)))
      .as[(Long, Double)].collect().toMap
    assert(cyc === Map(0L -> 1.5, 1L -> 1.5, 2L -> 1.5))
  }

  test("harmonicCentrality respects the radius bound and zero-fills") {
    // chain of 5 with maxDist=2: the tail sees only its two predecessors;
    // a self-loop-only page is in the universe with harmonic 0
    val out = Graph.harmonicCentrality(edges(
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L), (9L, 9L, 1L)),
      maxDist = 2).as[(Long, Double)].collect().toMap
    assert(out(5L) === 1.5 && out(4L) === 1.5 && out(3L) === 1.5)
    assert(out(2L) === 1.0 && out(1L) === 0.0)
    assert(out(9L) === 0.0)
  }

  test("harmonicCentrality takes shortest distance when paths tie") {
    // 0->3 direct AND 0->1->2->3: d(0,3) = 1, not 3; plus multiplicity
    // duplicates in the edge list must not double-count
    val out = Graph.harmonicCentrality(edges(
      (0L, 3L, 5L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (0L, 3L, 2L)))
      .as[(Long, Double)].collect().toMap
    // H(3) = 1/d(0,3) + 1/d(1,3) + 1/d(2,3) = 1 + 1/2 + 1 = 2.5
    assert(out(3L) === 2.5)
  }

  test("harmonicCentralityHyperBall equals the exact BFS in coupon regime") {
    // page-domain ball sizes keep the HLL sketch in its exact
    // coupon-list mode, so HyperBall must reproduce the exact operator
    // (rounded to the 6 dp it publishes) — this is the property that
    // lets g7 share g6's SQL oracle
    val es = edges(
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (0L, 3L, 1L),
      (4L, 1L, 2L), (9L, 9L, 1L))
    val exact = Graph.harmonicCentrality(es)
      .select(col("page"),
        (round(col("harmonic") * 1000000) / 1000000.0 + lit(0.0)).as("h"))
      .as[(Long, Double)].collect().toMap
    val hb = Graph.harmonicCentralityHyperBall(es)
      .as[(Long, Double)].collect().toMap
    assert(hb === exact)
    assert(hb(9L) === 0.0) // self-loop-only page zero-fills
  }

  test("harmonicCentralityHyperBall estimates within HLL error at scale") {
    // a 5000-source star pushes the hub's ball far past coupon
    // promotion into the genuinely-approximate regime: lgK=12 has
    // ~1.6% relative standard error, gate at 5%
    val star = (1L to 5000L).map(s => (s, 0L, 1L))
    val out = Graph.harmonicCentralityHyperBall(edges(star: _*), maxDist = 2)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(0L) - 5000.0) < 250.0)
    assert(out(1L) === 0.0) // sources are unreached
  }

  test("pageRank rejects fractional weight columns loudly") {
    // a double weight would silently truncate to 0 in the exact-long
    // normalization and collapse ranks to pure teleport — the contract
    // fails fast instead
    val frac = Seq((0L, 1L, 0.5)).toDF("src", "dst", "n_trans")
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRank(frac)
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("pageRank survives deep iteration counts (checkpointed rank frames)") {
    // 16 iterations would embed 2^16 copies of the rank subtree without
    // the per-iteration checkpoint; with it the plan stays constant-size
    // and the cycle still converges toward the uniform fixed point
    val pr = Graph.pageRank(edges((0L, 1L, 1L), (1L, 0L, 1L)), iters = 16)
      .as[(Long, Double)].collect().toMap
    assert(pr(0L) === 0.5 && pr(1L) === 0.5)
  }

  test("every graph operator returns empty on an empty edge list") {
    // a quiet ingest window produces zero transitions; nothing may
    // throw (pageRank's 1/N, harmonic's BFS loop, HyperBall's
    // saturation probe all see zero vertices)
    val none = edges()
    assert(Graph.pageRank(none).isEmpty)
    assert(Graph.degreeCensus(none).isEmpty)
    assert(Graph.triangleCensus(none).isEmpty)
    assert(Graph.components(none).isEmpty)
    assert(Graph.labelPropagation(none).isEmpty)
    assert(Graph.harmonicCentrality(none).isEmpty)
    assert(Graph.harmonicCentralityHyperBall(none).isEmpty)
  }

  test("labelPropagation splits a weak bridge into two communities; " +
       "self-loop-only vertices keep their own label") {
    // two triangles {1,2,3} and {10,11,12} with heavy internal edges,
    // bridged by one weight-1 edge 3-10; 20 has only a self-loop
    val out = Graph.labelPropagation(edges(
      (1L, 2L, 5L), (2L, 3L, 5L), (3L, 1L, 5L),
      (10L, 11L, 5L), (11L, 12L, 5L), (12L, 10L, 5L),
      (3L, 10L, 1L), (20L, 20L, 2L)))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) === out(2L) && out(2L) === out(3L))
    assert(out(10L) === out(11L) && out(11L) === out(12L))
    assert(out(1L) !== out(10L))
    assert(out(20L) === 20L)
  }

  test("labelPropagation: heavier votes beat more-numerous ones; ties to min label") {
    // vertex 5 hears label votes from 1 (weight 10) and from 2,3 — after
    // round 1 every vertex keeps distinct labels {1,2,3} around 5, and
    // 5's weighted argmax is 1's label (10 > 3+3)
    val heavy = Graph.labelPropagation(edges(
      (1L, 5L, 10L), (2L, 5L, 3L), (3L, 5L, 3L)), iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(heavy(5L) === 1L)
    // exact tie (3+3 vs 6? -> make 1's weight 6): min label wins
    val tied = Graph.labelPropagation(edges(
      (7L, 5L, 6L), (2L, 5L, 6L)), iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(tied(5L) === 2L)
  }

  test("labelPropagation: randomized parity with the brute-force reference") {
    val rnd = new scala.util.Random(43)
    val es = Seq.fill(70)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong,
      (rnd.nextInt(5) + 1).toLong))
    def ref(iters: Int): Map[Long, Long] = {
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
      val und = es.filter(e => e._1 != e._2)
        .flatMap { case (s, d, c) => Seq(((s, d), c), ((d, s), c)) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      var lab = verts.map(v => v -> v).toMap
      for (_ <- 0 until iters) {
        lab = verts.map { v =>
          // toSeq first: collecting pairs straight out of the Map would
          // itself build a Map and silently collapse same-label votes
          val votes = und.toSeq.collect { case ((a, b), w) if a == v => (lab(b), w) }
            .groupBy(_._1).map { case (l, vs) => l -> vs.map(_._2).sum }
          if (votes.isEmpty) v -> lab(v)
          else v -> votes.toSeq.sortBy { case (l, s) => (-s, l) }.head._1
        }.toMap
      }
      lab
    }
    val got = Graph.labelPropagation(es.toDF("src", "dst", "n_trans"), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === ref(4))
  }

  test("labelPropagation rejects fractional weight columns loudly") {
    val bad = Seq((1L, 2L, 0.5)).toDF("src", "dst", "n_trans")
    val ex = intercept[IllegalArgumentException] {
      Graph.labelPropagation(bad)
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("labelPropagationResume(snapshot(n), k) == labelPropagation(n+k) " +
       "BIT-exactly, for several (n, k) seams") {
    // bridged triangles + a pendant chain so labels keep moving for
    // 4+ rounds (the seam must be invisible mid-convergence, not only
    // at the fixed point)
    val e = edges(
      (1L, 2L, 5L), (2L, 3L, 5L), (3L, 1L, 5L),
      (10L, 11L, 5L), (11L, 12L, 5L), (12L, 10L, 5L),
      (3L, 10L, 1L), (12L, 13L, 2L), (13L, 14L, 2L), (14L, 15L, 2L),
      (20L, 20L, 2L))
    for ((n, k) <- Seq((1, 3), (2, 2), (3, 1))) {
      val oneShot = Graph.labelPropagation(e, iters = n + k)
        .as[(Long, Long)].collect().toMap
      val resumed = Graph.labelPropagationResume(e,
        Graph.labelPropagationSnapshot(e, iters = n), extraIters = k)
        .as[(Long, Long)].collect().toMap
      assert(resumed === oneShot, s"seam n=$n k=$k must be invisible")
      // the fused shape (r21: one prepared universe for both phases)
      // must be the same bits as the two-call form — and the one-shot
      val fused = Graph.labelPropagationSnapshotResume(e, iters = n,
        extraIters = k).as[(Long, Long)].collect().toMap
      assert(fused === oneShot, s"fused seam n=$n k=$k must be invisible")
    }
  }

  test("componentsIncrement: fold(components(b1), b2) == components(b1 ∪ b2) " +
       "on random multi-way splits; bridges merge; new vertices appear") {
    // bridge merge: {1,2} and {10,11} are separate in history; the batch
    // edge 2-10 must merge them under the global min label 1
    val merged = Graph.componentsIncrement(
      Graph.components(edges((1L, 2L, 1L), (10L, 11L, 1L))),
      edges((2L, 10L, 1L), (20L, 21L, 1L)))
      .as[(Long, Long)].collect().toMap
    assert(merged === Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 20L, 21L -> 20L))
    // random multi-way folds == one-shot, in any batch order
    val rnd = new scala.util.Random(47)
    val es = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong, 1L))
    val oneShot = Graph.components(edges(es: _*))
      .as[(Long, Long)].collect().toMap
    for (parts <- Seq(2, 3)) {
      val batches = es.zipWithIndex.groupBy(_._2 % parts).toSeq.sortBy(_._1)
        .map(_._2.map(_._1))
      val folded = batches.tail.foldLeft(Graph.components(edges(batches.head: _*))) {
        (labels, batch) => Graph.componentsIncrement(labels, edges(batch: _*))
      }.as[(Long, Long)].collect().toMap
      assert(folded === oneShot, s"$parts-way fold must equal one-shot")
    }
    intercept[IllegalArgumentException] {
      Graph.componentsIncrement(
        Graph.components(edges((1L, 2L, 1L)))
          .withColumnRenamed("component", "label"),
        edges((2L, 3L, 1L)))
    }
  }

  test("labelPropagationResume: vertices absent from the snapshot seed as " +
       "their own label (a re-crawl's new pages); wrong shape rejected loudly") {
    // old crawl: one triangle; new crawl appends vertex 4 hanging off 3
    val oldSnap = Graph.labelPropagationSnapshot(
      edges((1L, 2L, 5L), (2L, 3L, 5L), (3L, 1L, 5L)), iters = 2)
    val e = edges((1L, 2L, 5L), (2L, 3L, 5L), (3L, 1L, 5L), (3L, 4L, 3L))
    val warm = Graph.labelPropagationResume(e, oldSnap, extraIters = 2)
      .as[(Long, Long)].collect().toMap
    assert(warm.keySet === Set(1L, 2L, 3L, 4L), "new pages must be labeled")
    // 4's only neighbor is 3: it joins 3's converged community
    assert(warm(4L) === warm(3L))
    intercept[IllegalArgumentException] {
      Graph.labelPropagationResume(e, oldSnap.withColumnRenamed("l_raw", "l"), 1)
    }
  }

  test("components treats direction-disjoint chains as one component") {
    // 1->2, 3->2 (undirected: {1,2,3}); 5<->6; 7 self-loop only
    val out = Graph.components(edges(
      (1L, 2L, 1L), (3L, 2L, 1L), (5L, 6L, 1L), (6L, 5L, 2L), (7L, 7L, 1L)))
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }
}
