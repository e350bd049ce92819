package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training of a document quality classifier — the fasttext-
  * quality-classifier rung of a corpus pipeline (GPT-3/LLaMA-style "looks
  * like the reference corpus" scoring), expressed as pure relational
  * full-batch gradient descent so the whole fit is ONE lazy plan.
  *
  * Model: squared-loss regression through a SOFTSIGN link
  * `p = 0.5 + 0.5·z/(1+|z|)` (z = w·x). Softsign replaces the logistic
  * link deliberately: Spark SQL's `exp` evaluates through
  * `StrictMath.exp` while DuckDB's goes through libm — they differ in
  * the last ulp on ~1/9 of inputs (measured on this box), and a
  * transcendental inside an ITERATED fit amplifies any divergence.
  * Softsign's forward pass and its exact derivative
  * `0.5/(1+|z|)²` use only `*, /, +, abs` — every step is a correctly-
  * rounded IEEE operation, bit-identical on any engine, so the trained
  * weights are exactly replayable by the unrolled-CTE DuckDB oracle.
  * Swapping the link for the true logistic changes nothing structural.
  *
  * Scale shape (the MLlib treeAggregate shape): the gradient of
  * full-batch GD is a 4-term SUM over the corpus — one map-side-combined
  * aggregate per epoch, decimal-stabilized; only the 4-double gradient
  * ever reaches the driver, and the updated coefficients re-enter the
  * next epoch's plan as literals. The feature frame (id + 4 doubles +
  * label — narrow regardless of corpus width) is persisted across
  * epochs and unpersisted after the fit.
  *
  * Reference analog: none — the reference has no trainable surface;
  * this family extends the engine toward model-in-the-loop curation.
  */
object QualityClassifier {

  /** Feature columns (fixed order — z sums left-to-right in this order
    * on both engines): intercept, CENTERED log-length, CENTERED token
    * count/100, 'a'-character ratio. Centering (at the exactly-
    * representable 5.5 / 0.5) is load-bearing: uncentered, the feature
    * mean dwarfs its variance and full-batch GD spends all its steps
    * rediscovering the prior through the intercept — the standard
    * unscaled-feature pathology, fixed the standard way. All double;
    * all DuckDB-replayable.
    */
  def featurize(docs: DataFrame, idCol: String, textCol: String,
                nCharsCol: String, label: Column): DataFrame =
    docs.select(col(idCol),
      lit(1.0).as("x0"),
      (log(lit(1.0) + col(nCharsCol)) - lit(5.5)).as("x1"),
      (size(graft.text.Text.tokens(col(textCol))).cast("double") / lit(100.0)
        - lit(0.5)).as("x2"),
      // branch-guarded: a zero-char document would otherwise abort the
      // whole featurize scan under ANSI division-by-zero; an empty doc
      // has no 'a'-rate signal, so the feature is its centered zero
      when(col(nCharsCol) === 0, lit(0.0))
        .otherwise((length(col(textCol))
          - length(replace(col(textCol), lit("a"), lit(""))))
          .cast("double") / col(nCharsCol).cast("double")).as("x3"),
      when(label, lit(1.0)).otherwise(lit(0.0)).as("y"))

  private val featCols = Seq("x0", "x1", "x2", "x3")

  /** `iters` GD steps from w = 0, coefficients DRIVER-HELD between
    * epochs — the MLlib treeAggregate shape: each step is one map-side-
    * combined aggregate over the (cached) feature frame computing the
    * exact softsign squared-loss gradient `(p−y)·x/(1+|z|)²`, decimal-
    * summed; the 4 doubles come back to the driver, update, and re-enter
    * the next epoch's plan as literals. A fully-relational unrolling was
    * measured first and rejected: nesting each epoch's 1-row weight
    * frame into the next replicates the feature subtree O(iters²) times
    * and Catalyst analysis alone pushed ml1 to 9.3 s at sf0.1 — literal
    * re-entry keeps every epoch's plan constant-size (9.3 s → well under
    * 1 s). Per-row arithmetic stays double, sums stay DECIMAL(20,10), so
    * the collected weights are STILL bit-identical to the oracle's
    * unrolled CTEs — collect changes where the 4 doubles live, not one
    * bit of them. Returns (b0..b3).
    */
  def trainWeights(features: DataFrame, iters: Int = 8,
                   lr: Double = 8.0): Array[Double] = {
    val cached = features.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fitOn(cached, iters, lr)._1
    finally { cached.unpersist(blocking = false); () }
  }

  /** [[trainWeights]] plus the corpus size — from the fit's OWN cached
    * pass, so publishing it never re-runs the featurize scan.
    */
  def trainWeightsAndCount(features: DataFrame, iters: Int = 8,
                           lr: Double = 8.0): (Array[Double], Long) = {
    val cached = features.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fitOn(cached, iters, lr)
    finally { cached.unpersist(blocking = false); () }
  }

  /** The fit loop over a frame the CALLER has persisted. */
  private def fitOn(cached: DataFrame, iters: Int, lr: Double): (Array[Double], Long) = {
    val nDocs = cached.count()
    val n = nDocs.toDouble
    var w = Array.fill(featCols.size)(0.0)
    // zero documents: no gradient exists — return the init weights
    // instead of NPE-ing on the null gradient row and dividing by 0
    if (nDocs == 0L) return (w, 0L)
    for (_ <- 0 until iters) {
      val z = featCols.zipWithIndex
        .map { case (f, i) => lit(w(i)) * col(f) }.reduceLeft(_ + _)
      val p = lit(0.5) + lit(0.5) * col("__z") / (lit(1.0) + abs(col("__z")))
      val term = (col("__p") - col("y")) /
        ((lit(1.0) + abs(col("__z"))) * (lit(1.0) + abs(col("__z"))))
      val row = cached
        .withColumn("__z", z)
        .withColumn("__p", p)
        .withColumn("__t", term)
        .agg(sum((col("__t") * col("x0")).cast("decimal(20,10)"))
          .cast("double").as("g0"),
          featCols.zipWithIndex.tail.map { case (f, i) =>
            sum((col("__t") * col(f)).cast("decimal(20,10)"))
              .cast("double").as(s"g$i")
          }: _*)
        .head()
      // a NULL gradient component (every row's feature null — e.g. a
      // corpus of all-null texts) means no usable signal for that
      // weight: skip its update instead of NPE-ing on the null cell
      w = w.indices.map(i =>
        if (row.isNullAt(i)) w(i) else w(i) - lr * row.getDouble(i) / n).toArray
    }
    (w, nDocs)
  }

  /** [[trainWeights]] as a 1-row (b0..b3) frame. */
  def train(features: DataFrame, iters: Int = 8, lr: Double = 8.0): DataFrame = {
    val w = trainWeights(features, iters, lr)
    features.sparkSession.range(1)
      .select(w.zipWithIndex.map { case (v, i) => lit(v).as(s"b$i") }: _*)
  }

  /** The published 1-row fit summary for ALREADY-KNOWN weights — rounded
    * coefficients + corpus size. What [[trainedWeights]] publishes after
    * a fit, and what a caller holding persisted weights
    * ([[WeightsIndex]]) publishes without one.
    */
  def weightsSummary(spark: org.apache.spark.sql.SparkSession, w: Seq[Double],
                     nDocs: Long): DataFrame =
    spark.range(1)
      .select((w.zipWithIndex.map { case (v, i) =>
        (round(lit(v) * 1000000) / 1000000.0 + lit(0.0)).as(s"w$i")
      } :+ lit(nDocs).as("n_docs")): _*)

  /** The published 1-row fit summary: rounded weights + corpus size
    * (n_docs from the fit's own cached pass — previously a second full
    * featurize scan AFTER the fit unpersisted the frame).
    */
  def trainedWeights(features: DataFrame, iters: Int = 8, lr: Double = 8.0): DataFrame = {
    val (w, nDocs) = trainWeightsAndCount(features, iters, lr)
    weightsSummary(features.sparkSession, w, nDocs)
  }

  /** Per-document scoring under GIVEN weights — the pure inference pass,
    * and the incremental path's whole cost: the coefficients enter the
    * plan as 4 literals, so scoring a daily batch is ONE codegen'd scan
    * of the batch (no fit, no training-corpus scan, no join — the
    * m9→m12 amortization shape; [[WeightsIndex.ensure]] supplies
    * standing weights). Output: (idCol, quality_score, predicted, label).
    */
  def scoreWith(features: DataFrame, idCol: String, w: Seq[Double]): DataFrame = {
    require(w.size == featCols.size, s"expected ${featCols.size} weights, got ${w.size}")
    val z = featCols.zipWithIndex
      .map { case (f, i) => lit(w(i)) * col(f) }.reduceLeft(_ + _)
    features
      .withColumn("__z", z)
      .select(col(idCol),
        (round((lit(0.5) + lit(0.5) * col("__z") / (lit(1.0) + abs(col("__z"))))
          * 1000000) / 1000000.0 + lit(0.0)).as("quality_score"),
        when(col("__z") >= 0, lit(1L)).otherwise(lit(0L)).as("predicted"),
        col("y").cast("long").as("label"))
  }

  /** Fit-then-score in one call: [[trainWeights]] + [[scoreWith]]. The
    * one-shot form — a standing pipeline persists the fit once
    * ([[WeightsIndex]]) and calls [[scoreWith]] per batch instead.
    */
  def score(features: DataFrame, idCol: String, iters: Int = 8,
            lr: Double = 8.0): DataFrame =
    scoreWith(features, idCol, trainWeights(features, iters, lr).toSeq)
}
