package graft.er

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) for training-data pipelines:
  * fuzzy-match free-text entity names (products, authors, sources,
  * publishers) whose spellings drift across records, then map every
  * record to a canonical entity label. The missing rung between EXACT
  * dedup (hash equality — [[graft.dedup.Dedup.exactDedup]]) and
  * SEMANTIC dedup (embedding cosine — e3): edit-distance identity over
  * a bounded name universe.
  *
  * Scale posture (the m17 "distinct hash universe" shape applied to
  * names): resolution runs over DISTINCT names, never rows — entity
  * name domains grow sublinearly with a corpus (a 100 TB crawl has
  * billions of rows but a far smaller name universe), and the row-level
  * answer is a broadcast join back. Candidate generation is TOKEN
  * blocking (a pair is considered only if it shares one whitespace
  * token) with a per-token occupancy cap — a stop-token shared by half
  * the universe is a useless, quadratic block key and drops whole, the
  * LSH-bucket cap discipline ([[graft.dedup.Dedup.defaultBucketCap]]'s
  * rationale). Verification is codegen `levenshtein` on the capped
  * candidate pairs only. No all-pairs stage exists at any scale.
  *
  * Reference analog: none — the reference keys city records by exact
  * name match (/root/reference/src/transform.py); this family is the
  * north-star extension for corpora where names arrive dirty.
  */
object EntityResolution {

  /** Max DISTINCT NAMES a token may block before it stops being a
    * candidate key (the token is then dropped whole, like an over-cap
    * LSH bucket): tokens this common are stop-words whose blocks grow
    * ~quadratically while adding pairs levenshtein almost surely
    * rejects. Capped blocks bound the candidate join at
    * O(tokens · cap²) regardless of corpus size.
    */
  val defaultBlockCap = 1000

  /** The module's ONE tokenization: distinct (name, whitespace-token)
    * pairs over the distinct non-null name universe. Every blocking
    * surface (pair search, spanning edges, standing blocks, indexed
    * batch side) derives from this helper — tokenization drift between
    * er1/er2 and er3/er4 (or engine vs persisted NameIndex) would
    * silently desynchronize their candidate sets.
    */
  private[graft] def nameTokens(df: DataFrame, nameCol: String): DataFrame =
    df.select(col(nameCol).as("__name"))
      .filter(col("__name").isNotNull).distinct()
      .select(col("__name"), explode(split(col("__name"), "\\s+")).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .distinct() // a token repeated inside one name blocks it once

  /** Distinct-name pairs within `maxDist` edits that share ≥ 1
    * whitespace token: (name1, name2, dist), name1 < name2. One shuffle
    * lands names on their tokens (cap counted there), the self-join
    * rides that same partitioning, and `levenshtein` verifies only the
    * capped candidates. Output is NAME-level by design — id-level pair
    * emission would rebuild the clique problem the spanning/star forms
    * exist to avoid; [[entityGroups]] is the row-level consumer.
    */
  def nameMatchPairs(df: DataFrame, nameCol: String, maxDist: Int,
                     blockCap: Int = defaultBlockCap): DataFrame = {
    val capped = nameTokens(df, nameCol)
      .withColumn("__occ",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("__tok")))
      .filter(col("__occ") <= blockCap)
      .select("__name", "__tok")
    capped.as("a")
      .join(capped.as("b"),
        col("a.__tok") === col("b.__tok") && col("a.__name") < col("b.__name"))
      .select(col("a.__name").as("name1"), col("b.__name").as("name2"))
      .distinct() // pairs sharing several tokens verify once
      .withColumn("dist", levenshtein(col("name1"), col("name2")).cast("long"))
      .filter(col("dist") <= maxDist)
  }

  /** Classic unit-cost Wagner–Fischer edit distance over CODE POINTS —
    * the in-task replica of Spark's `levenshtein` expression
    * (UTF8String.levenshteinDistance is the same DP over code points),
    * so a spanning edge's threshold decision agrees with the join-form
    * verify exactly (the round4/cosineLocal discipline from
    * [[graft.dedup.Dedup]], applied to strings).
    */
  private[graft] def levenshteinLocal(a: String, b: String): Int = {
    val ca = a.codePoints().toArray
    val cb = b.codePoints().toArray
    if (ca.length == 0) return cb.length
    if (cb.length == 0) return ca.length
    var prev = Array.tabulate(cb.length + 1)(identity)
    var cur = new Array[Int](cb.length + 1)
    var i = 1
    while (i <= ca.length) {
      cur(0) = i
      var j = 1
      while (j <= cb.length) {
        val cost = if (ca(i - 1) == cb(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(cb.length)
  }

  /** Banded (Ukkonen) threshold test: `levenshtein(a, b) ≤ k` without
    * the full DP — only the |i−j| ≤ k diagonal band is evaluated
    * (O(k·n) per pair instead of O(n·m)), with a length-difference
    * pre-reject and an early exit the moment a whole band row exceeds
    * k. Decision-identical to [[levenshteinLocal]] ≤ k (randomized
    * parity gate in the spec) — this is what the spanning forest's
    * verify lambda calls, because on a growing block most consulted
    * pairs are REJECTIONS (cross-component) and their cost dominates.
    */
  private[graft] def withinDistance(a: String, b: String, k: Int): Boolean = {
    val ca = a.codePoints().toArray
    val cb = b.codePoints().toArray
    val n = ca.length; val m = cb.length
    if (math.abs(n - m) > k) return false
    if (n == 0) return m <= k
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j0 = 0
    while (j0 <= math.min(m, k)) { prev(j0) = j0; j0 += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      var rowMin = inf
      if (lo == 1 && i <= k) { cur(0) = i; rowMin = i }
      var j = lo
      while (j <= hi) {
        val cost = if (ca(i - 1) == cb(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        if (prev(j) + 1 < v) v = prev(j) + 1
        if (cur(j - 1) + 1 < v) v = cur(j - 1) + 1
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= inf) return false // whole band over k: no path back
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m) <= k
  }

  /** Connectivity-only reduction of [[nameMatchPairs]] for CLOSURE
    * consumers ([[entityGroups]]) — the e3/d12 spanning-forest medicine
    * applied to names: on a corpus where k spellings of one entity all
    * match mutually (the common case — that is what makes them one
    * entity), the verified pair set is a k-clique and the ×100 probe
    * measured the pair form at 66× for a ×100 universe. This emits a
    * per-token-block SPANNING FOREST of the verified subgraph instead:
    * ≤ members−1 edges per block, each a genuine `levenshtein ≤ maxDist`
    * pair, and — because the forest's union-find consults the distance
    * ONLY for pairs not already connected — the verify work inside a
    * duplicate-heavy block collapses from O(k²) distance evaluations to
    * ~O(k). Union-of-forests preserves the union graph's connectivity
    * exactly, so [[entityGroups]] labels are IDENTICAL to the clique
    * form's (gated in EntityResolutionSpec). [[nameMatchPairs]] keeps
    * the clique form: there the pairs ARE the result (the e1/e2/d13
    * rationale).
    */
  def nameMatchSpanningEdges(df: DataFrame, nameCol: String, maxDist: Int,
                             blockCap: Int = defaultBlockCap): DataFrame = {
    val grouped = nameTokens(df, nameCol)
      .groupBy(col("__tok"))
      // name-ascending members: deterministic edge choice, name1 < name2
      .agg(sort_array(collect_list(col("__name"))).as("__m"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name1",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("name2",
        org.apache.spark.sql.types.StringType)))
    grouped.flatMap { row =>
      val m = row.getSeq[String](1)
      if (m.length > blockCap) Iterator.empty
      else {
        val arr = m.toArray
        graft.dedup.Dedup.spanningForestIndexEdges(arr.length) { (i, j) =>
          withinDistance(arr(i), arr(j), maxDist)
        }.map { case (i, j) => org.apache.spark.sql.Row(arr(i), arr(j)) }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema)).distinct()
  }

  /** Incremental ER — the d15/m9 "only the batch pays" pattern applied
    * to names: conform each BATCH row's name to a STANDING name universe
    * (the canonical vocabulary a pipeline has already resolved). Token
    * blocking runs batch names against standing names only (never
    * batch×batch, never standing×standing), the per-token occupancy cap
    * counts the STANDING side (the index side — a stop-token's block
    * drops whole, both sides consistently), and each batch name keeps
    * its BEST standing match: min distance, ties to the lexicographically
    * smaller standing name — a total order, so the assignment is a pure
    * function of the data. Unmatched names label as themselves with
    * `matched = false`.
    *
    * Output: (idCol, nameCol, entity, matched). At 100 TB the standing
    * side is the distinct-name universe (sublinear in rows) and the
    * batch side is one day's arrivals — the join never touches corpus
    * rows.
    */
  def incrementalEntityMatches(batch: DataFrame, standing: DataFrame,
                               idCol: String, nameCol: String, maxDist: Int,
                               blockCap: Int = defaultBlockCap): DataFrame =
    incrementalEntityMatchesIndexed(batch,
      standingTokenBlocks(standing, nameCol, blockCap), idCol, nameCol, maxDist)

  /** The standing side of [[incrementalEntityMatches]] as a reusable
    * frame: capped (__sname, __tok) token-block pairs of the distinct
    * standing names — what [[NameIndex.ensure]] persists so a daily
    * conformance pass stops re-deriving (and re-scanning) the standing
    * table per batch.
    */
  private[graft] def standingTokenBlocks(standing: DataFrame, nameCol: String,
                                         blockCap: Int): DataFrame = {
    nameTokens(standing, nameCol)
      .withColumn("__occ",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("__tok")))
      .filter(col("__occ") <= blockCap)
      .select(col("__name").as("__sname"), col("__tok"))
  }

  /** [[incrementalEntityMatches]] over a pre-built standing frame (the
    * persisted [[NameIndex]] or any (__sname, __tok) source): only the
    * BATCH side derives tokens per call — the d16/m12 indexed-twin
    * shape.
    */
  def incrementalEntityMatchesIndexed(batch: DataFrame, standingToks: DataFrame,
                                      idCol: String, nameCol: String,
                                      maxDist: Int): DataFrame = {
    val cand = nameTokens(batch, nameCol).as("b")
      .join(standingToks.as("s"), col("b.__tok") === col("s.__tok"))
      .select(col("b.__name").as("__bname"), col("__sname"))
      .distinct()
      .withColumn("__dist", levenshtein(col("__bname"), col("__sname")).cast("long"))
      .filter(col("__dist") <= maxDist)
    val best = cand
      .withColumn("__rk", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("__bname").orderBy(col("__dist"), col("__sname"))))
      .filter(col("__rk") === 1)
      .select(col("__bname"), col("__sname"))
    batch.select(col(idCol), col(nameCol))
      .join(broadcast(best), col(nameCol) === col("__bname"), "left")
      .select(col(idCol), col(nameCol),
        coalesce(col("__sname"), col(nameCol)).as("entity"),
        col("__sname").isNotNull.as("matched"))
  }

  /** Budget for the driver-side closure over the name-match graph —
    * the [[graft.dedup.Dedup]] union-find budget: the DISTINCT-NAME
    * pair graph is small by construction (names, not rows), and a
    * corpus that still exceeds it should go through
    * `Dedup.dupClusters`'s distributed pointer-jumping on a dense
    * name-id assignment instead of silently collecting.
    */
  val maxClosureEdges: Long = 4000000L

  /** Every row labeled with its canonical entity: (idCol, nameCol,
    * entity) where `entity` is the lexicographic minimum name of the
    * row's connected component in the [[nameMatchPairs]] graph (rows
    * whose name matches nothing label as themselves). The closure input
    * is [[nameMatchSpanningEdges]] — identical components, ≤ members−1
    * edges per block instead of the clique — and runs on the driver
    * (≤ [[maxClosureEdges]], checked loudly), returning to the cluster
    * as ONE broadcast join; rows never shuffle.
    */
  def entityGroups(df: DataFrame, idCol: String, nameCol: String, maxDist: Int,
                   blockCap: Int = defaultBlockCap): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // budget-check BEFORE any driver materialization (the dupClusters
    // discipline): collecting first would OOM the driver on exactly the
    // corpora the guard exists to reroute; the localCheckpoint makes
    // the count and the collect share one evaluation of the edge search
    val edges = nameMatchSpanningEdges(df, nameCol, maxDist, blockCap)
      .localCheckpoint()
    val nEdges = edges.count()
    require(nEdges <= maxClosureEdges,
      s"name-match graph has $nEdges edges > $maxClosureEdges; " +
        "route through Dedup.dupClusters on a dense name-id assignment")
    val pairs = edges.collect()
    // union-find, always attaching the lexicographically LARGER root
    // under the smaller: the root IS the component's min name
    val parent = scala.collection.mutable.HashMap.empty[String, String]
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (c != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    // root choice compares UTF-8 BYTES (UTF8String), not JVM UTF-16
    // code units: the blocking join's `name1 < name2`, sort_array, and
    // the DuckDB oracle's min() all order binary UTF-8 — for names with
    // supplementary-plane code points the two orders diverge, and the
    // component label must agree with all of them
    def utf8Lt(a: String, b: String): Boolean =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0
    pairs.foreach { row =>
      val (r1, r2) = (find(row.getString(0)), find(row.getString(1)))
      if (r1 != r2) {
        if (utf8Lt(r1, r2)) parent(r2) = r1 else parent(r1) = r2
      }
    }
    // snapshot keys BEFORE the find loop: path compression mutates the
    // map that would otherwise be under iteration
    val attached = parent.keysIterator.toVector
    val canon = attached.map(n => (n, find(n))).toDF("__name", "__entity")
    df.select(col(idCol), col(nameCol))
      .join(broadcast(canon), col(nameCol) === col("__name"), "left")
      .select(col(idCol), col(nameCol),
        coalesce(col("__entity"), col(nameCol)).as("entity"))
  }

  /** The conformed-dimension publish of [[entityGroups]] — the d14
    * `fuzzySurvivors` shape at name granularity: every row labeled with
    * its canonical entity plus a `keep` mark on the SURVIVOR rows (those
    * whose name IS the component's canonical label; singletons and
    * null-name rows keep themselves). Downstream, `keep = true` rows
    * form the conformed dimension and `keep = false` rows carry the
    * redirect (row → entity) a replace/merge step applies — the "answer
    * sheet" a curation pipeline publishes after resolution, not just
    * the grouping. Null-safe comparison keeps the null-name contract:
    * a null entity marks its own (null-name) row kept, never fabricated
    * into a label. Output: (idCol, nameCol, entity, keep).
    */
  def entitySurvivors(df: DataFrame, idCol: String, nameCol: String,
                      maxDist: Int,
                      blockCap: Int = defaultBlockCap): DataFrame =
    entityGroups(df, idCol, nameCol, maxDist, blockCap)
      .withColumn("keep", col(nameCol) <=> col("entity"))
}
