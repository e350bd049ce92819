package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that don't need a SparkSession: the
  * oracle_sql.json escaper and the queries/oracle map consistency rules
  * the gate depends on.
  */
class ContractSpec extends AnyFunSuite {

  test("flagship entry returns rows at sf0.001 (the driver's smoke contract)") {
    assert(SparkEntry.entry(SparkTestBase.session).count() > 0)
  }

  test("JsonEscape: quotes, backslashes, and every control char survive json parsing") {
    val nasty = "SELECT 'a\"b' AS x,\n\t c FROM t WHERE s = '\\d+' \r\n -- "
    val escaped = JsonEscape(nasty)
    // minimal JSON parse: the escaped form must round-trip via a real parser
    // (use Jackson from Spark's classpath — the driver uses python json.load)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val parsed = mapper.readTree(s"""{"sql": $escaped}""").get("sql").asText()
    assert(parsed === nasty)
  }

  test("every oracle key has a registered query (no orphan oracle entries)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("oracle coverage: every non-hash-keyed query carries an oracle") {
    // rows-only set is a deliberate, documented whitelist — anything new
    // must either get an oracle or be added here with justification
    val rowsOnlyByDesign = Set(
      "a15_approx_distinct",   // HLL sketch, engine-specific estimate
      "d3_lsh_buckets",        // xxhash-keyed
      "d4_simhash_sigs",       // xxhash-keyed
      // d12_dup_clusters is ORACLED as of round 10: recursive-CTE closure
      // over the d13 candidate dump (see SparkEntry.oracleSql)
      "t18_bloom_decontaminate", // bloom bit layout is engine-internal (gated in RowsOnlyGateSpec)
      "t5_fingerprint",        // xxhash-keyed
      // t7_winnow is ORACLED as of round 13: dumps its positional k-gram
      // hash sequence; DuckDB independently replays the window-minimum
      // selection over the dump (see SparkEntry.oracleSql)
      // s2/s4/s7/s8 are ORACLED as of round 13: each dumps its candidate/
      // survivor pair set and publishes the exact-cosine rescore of the
      // read-back dump, which DuckDB replays (see annRerankSql)
      "e1_embedding_neardups") // SRP-bucket
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled === rowsOnlyByDesign,
      s"unexpected rows-only queries: ${unoracled -- rowsOnlyByDesign}; " +
      s"stale whitelist: ${rowsOnlyByDesign -- unoracled}")
  }

  test("no registered query publishes a top-level array/map column " +
    "(the harness canonicalizes by sorting every column — r18's dq6 red row)") {
    // the driver's compare loads each result into pandas and sorts all
    // columns; a top-level ArrayType/MapType crashes that sort, turning a
    // correct answer into an unverifiable one. Publish array_join(...)
    // or a scalar key instead (the library API may keep the array form).
    //
    // A few builders run EAGER driver work at construction (w19's fold-cut
    // .head jobs, s13/s14's ensure+append index builds) — a schema-only
    // gate must not execute those heavyweight side effects, so they are
    // exempted here and covered by the SAME gate inside Verify, which
    // builds every frame anyway each round (zero marginal cost there).
    val eagerBuilders = Set(
      "w19_scd2_frontier", "s13_ivf_append_topk", "s14_srp_append_topk",
      "s15_pq_append_topk", "s16_ivfpq_append_topk", "w21_sessions_epochs")
    assert((eagerBuilders -- SparkEntry.queries.keySet).isEmpty,
      "stale eager-builder exemption (query renamed/removed?)")
    val s = SparkTestBase.session
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => eagerBuilders.contains(name) }
      .flatMap { case (name, q) =>
        q(s, dir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
            f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
      }
    assert(offenders.isEmpty,
      s"unsortable top-level columns in registered outputs: $offenders")
  }

  test("docs/QUERIES.md matches the generated index of the full query surface") {
    val f = new java.io.File("docs/QUERIES.md")
    assert(f.isFile, "missing index — run: sbt \"runMain graft.QueryIndex\"")
    val committed = new String(
      java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(committed === QueryIndex.render,
      "docs/QUERIES.md is stale — regenerate with: sbt \"runMain graft.QueryIndex\"")
  }

  test("query names follow the documented prefix convention") {
    // the family registry IS the convention — a query whose parsed
    // prefix has no QueryIndex.families row would render unlabelled
    val prefixes = QueryIndex.families.map(_._1).toSet
    SparkEntry.queries.keys.foreach { k =>
      val p = k.takeWhile(_ != '_').replaceAll("[0-9b]+$", "")
      assert(prefixes.contains(p), s"unexpected query name shape: $k")
    }
  }
}
