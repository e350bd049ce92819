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
    val names = df.select(col(nameCol).as("__name"))
      .filter(col("__name").isNotNull).distinct()
    val toks = names
      .select(col("__name"), explode(split(col("__name"), "\\s+")).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .distinct() // a token repeated inside one name blocks it once
    val capped = toks
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
    * whose name matches nothing label as themselves). The closure runs
    * on the driver over the name-level edges (≤ [[maxClosureEdges]],
    * checked loudly) and returns to the cluster as ONE broadcast join —
    * rows never shuffle.
    */
  def entityGroups(df: DataFrame, idCol: String, nameCol: String, maxDist: Int,
                   blockCap: Int = defaultBlockCap): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = nameMatchPairs(df, nameCol, maxDist, blockCap)
      .select("name1", "name2").collect()
    require(pairs.length <= maxClosureEdges,
      s"name-match graph has ${pairs.length} edges > $maxClosureEdges; " +
        "route through Dedup.dupClusters on a dense name-id assignment")
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
    pairs.foreach { row =>
      val (r1, r2) = (find(row.getString(0)), find(row.getString(1)))
      if (r1 != r2) {
        if (r1 < r2) parent(r2) = r1 else parent(r1) = r2
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
}
