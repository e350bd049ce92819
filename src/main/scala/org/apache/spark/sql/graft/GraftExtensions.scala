// In the Spark namespace for the same reason as VectorExpressions: the
// FunctionRegistry plumbing used by expression builders is private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the native vector expressions, so
  * `spark.sql("SELECT graft_cosine(a, b) ...")` works wherever the
  * extension is installed:
  *
  *   spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
  *
  * (a STATIC conf — it applies only when the first session of the JVM is
  * created; submit it with the job, don't set it on a live session), or
  * `SparkSession.builder.withExtensions(new GraftExtensions())` when a
  * SparkContext already exists (GraftExtensionsSpec drives this path), or
  * piecemeal on a live session via [[GraftFunctions.register]] +
  * [[GraftOptimizations.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(session => ApproxAggRewrite(session))
  }
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage, "")

  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  val all: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_cosine",
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two vectors, null on zero norm"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    ("graft_dot",
      info("graft_dot", "graft_dot(a, b) - dot product of two vectors"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    ("graft_dot_int8",
      info("graft_dot_int8", "graft_dot_int8(a, b) - integer dot product of two int8 (tinyint) vectors"),
      (children: Seq[Expression]) => Int8DotProduct(children(0), children(1))),
    ("graft_int8_quantize",
      info("graft_int8_quantize",
        "graft_int8_quantize(v) - symmetric int8 quantization: floor(x*127/max_abs + 0.5) as array<tinyint>"),
      (children: Seq[Expression]) => Int8QuantizeVec(children.head)),
    ("graft_linf",
      info("graft_linf", "graft_linf(v) - L-infinity norm max(abs(x_i)) of a vector"),
      (children: Seq[Expression]) => MaxAbs(children.head)),
    ("graft_srp_bucket",
      info("graft_srp_bucket",
        "graft_srp_bucket(v, nPlanes, seed) - signed-random-projection LSH bucket id"),
      (children: Seq[Expression]) => SrpBucket(children(0),
        litInt(children(1), "nPlanes"), litInt(children(2), "seed"))),
    ("graft_simhash",
      info("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash of a string array"),
      (children: Seq[Expression]) => SimHash64(children.head)),
    ("graft_minhash",
      info("graft_minhash", "graft_minhash(shingles, k) - k-element MinHash signature"),
      (children: Seq[Expression]) => MinHashSignature(children(0), litInt(children(1), "k"))),
    ("graft_word_shingles",
      info("graft_word_shingles", "graft_word_shingles(text, n) - deduplicated word n-grams"),
      (children: Seq[Expression]) => WordShingles(children(0), litInt(children(1), "n"))),
    ("graft_char_shingles",
      info("graft_char_shingles", "graft_char_shingles(text, n) - deduplicated char n-grams"),
      (children: Seq[Expression]) => CharShingles(children(0), litInt(children(1), "n"))),
    ("graft_lsh_bands",
      info("graft_lsh_bands",
        "graft_lsh_bands(shingles, bands, rowsPerBand) - LSH band bucket ids from a shingle array"),
      (children: Seq[Expression]) => LshBandBuckets(children(0),
        litInt(children(1), "bands"), litInt(children(2), "rowsPerBand"))),
    ("graft_winnow",
      info("graft_winnow",
        "graft_winnow(text, k, w) - MOSS winnowing fingerprints (k-gram hashes, window-w minima)"),
      (children: Seq[Expression]) => Winnow(children(0),
        litInt(children(1), "k"), litInt(children(2), "w"))))

  /** Register into an already-running session's function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
