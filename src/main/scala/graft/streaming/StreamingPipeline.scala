package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.observe.Metrics

/** The reference pipeline as an actual stream (north star: "Structured
  * Streaming + Kafka"): polling source → statistics-guarded cleaning →
  * event-time windowed aggregation → `foreachBatch` driving the same batch
  * sinks as the daily pipeline. One checkpointed query replaces the cron.
  *
  * `foreachBatch` is the sink bridge: each micro-batch appends the same
  * (city, date)-partitioned parquet layout `Sinks.writePartitioned`
  * produces (append here, overwrite there — a batch backfill can replace
  * exactly the partitions a stream wrote), so downstream consumers cannot
  * tell whether a day came from the stream or a backfill.
  */
object StreamingPipeline {

  case class Config(
      checkpointDir: String,
      outputDir: String,
      cities: Seq[String] = Seq("New York", "London", "Tokyo", "Sydney", "Berlin"),
      window: String = "1 hour",
      lateness: String = "2 hours",
      statsSnapshot: Option[DataFrame] = None,
      maxPolls: Long = -1L, // >0 = finite stream (tests / drain runs)
      // Kafka source branch (the north star's named ingestion path):
      // bootstrap set -> consume `kafkaTopic` in wire format and decode
      // with KafkaWire.decodeFlat instead of using the polling source.
      kafkaBootstrap: Option[String] = None,
      kafkaTopic: String = "weather",
      // Test seam: a pre-built wire-format streaming DataFrame (e.g. a
      // MemoryStream of binary key/value rows) run through the SAME
      // decode + window + sink path as a real topic — the broker is the
      // only thing it bypasses.
      wireSource: Option[DataFrame] = None,
      // Keys for watermark-bounded streaming dedup before the window —
      // fixes the reference's duplicate-poll duplication (its transform
      // re-reads ALL raw files, transform.py:64-66). E.g. Seq("city","ts")
      // drops redelivered observations; None = keep every record.
      dedupKeys: Option[Seq[String]] = None,
      // NEAR-dup branch: when set, the dedup state keys on the SimHash
      // SIGNATURE of this column (scoped per city) instead of exact
      // columns — a re-poll that re-serializes the same observation with
      // cosmetic text differences or a jittered capture timestamp
      // matches no exact key set but keeps its token-majority signature,
      // so the redelivery is dropped within the watermark
      // (Streaming.nearDupDedupWithinWatermark; batch twin =
      // Dedup.simhash). Takes precedence over dedupKeys.
      dedupSignatureOf: Option[String] = None,
      // Dead-letter route: a row-scoped Checks suite applied to every
      // decoded record BEFORE dedup state or cleaning sees it. Rows
      // violating any check land in `${outputDir}/quarantine` with
      // their declaration-ordered reason list (`failed_checks`); clean
      // rows flow on unchanged. Routing is Checks.quarantine — the
      // SAME declaration gates a batch table and routes the stream, so
      // micro-batch routing == batch routing by construction.
      quarantineChecks: Seq[graft.quality.Checks.Check] = Nil)

  /** Wire and start the streaming query (AvailableNow when `drain` — the
    * batch-parity trigger — else continuous micro-batches). REJECTS a
    * config with `quarantineChecks` set: that config starts TWO queries
    * (main + dead-letter), and a single returned handle would strand the
    * quarantine query — the caller could neither await nor stop it, and a
    * drain would tear the session down before the dead-letter sink
    * flushes. Use [[startRouted]], which hands back both handles.
    */
  def start(spark: SparkSession, cfg: Config, drain: Boolean = false): StreamingQuery = {
    require(cfg.quarantineChecks.isEmpty,
      "quarantineChecks starts a second (dead-letter) query whose handle " +
      "start() cannot return — use startRouted() and manage both queries")
    startRouted(spark, cfg, drain).head
  }

  /** [[start]] plus the dead-letter route: element 0 is always the main
    * windowed query; element 1 (present only when `cfg.quarantineChecks`
    * is non-empty) is the quarantine sink's query. Two queries because
    * Structured Streaming binds one sink per query and the dead-letter
    * rows leave the plan BEFORE the stateful window — each query
    * checkpoints its own offsets (`checkpointDir` /
    * `checkpointDir-quarantine`), so the two routes restart
    * independently with exactly-once delivery per sink. The routing
    * itself is stateless and map-side ([[graft.quality.Checks.quarantine]]),
    * applied to decoded records before any dedup state or cleaning —
    * invalid rows never occupy state, and the quarantined record
    * carries its full payload plus the declaration-ordered
    * `failed_checks` reason list for triage/replay.
    */
  def startRouted(spark: SparkSession, cfg: Config,
                  drain: Boolean = false): Seq[StreamingQuery] = {
    // the signature column rides along only when the near-dup branch
    // needs it (dropped again right after the dedup)
    val decodeCols = Seq(col("city"), col("timestamp").as("ts"), col("temperature")) ++
      cfg.dedupSignatureOf.filterNot(Set("city", "ts", "temperature")).map(col)
    val raw = (cfg.wireSource, cfg.kafkaBootstrap) match {
      case (Some(wire), _) =>
        graft.sources.KafkaWire.decodeFlat(wire).select(decodeCols: _*)
      case (None, Some(bootstrap)) =>
        graft.sources.KafkaWire.decodeFlat(
            graft.sources.KafkaWire.stream(spark, bootstrap, cfg.kafkaTopic))
          .select(decodeCols: _*)
      case _ => spark.readStream
        .format("graft.sources.v2.PollingSource")
        .option("cities", cfg.cities.mkString(","))
        .option("maxPolls", cfg.maxPolls.toString)
        .load()
    }

    // dead-letter routing first: invalid records must not enter dedup
    // state or the clean/window path
    val (admitted, dirty) =
      if (cfg.quarantineChecks.nonEmpty) {
        val routed = graft.quality.Checks.quarantine(raw, cfg.quarantineChecks)
        (routed.filter(size(col("failed_checks")) === 0).drop("failed_checks"),
          Some(routed.filter(size(col("failed_checks")) > 0)))
      } else (raw, None)

    val deduped = (cfg.dedupSignatureOf, cfg.dedupKeys) match {
      case (Some(textCol), _) =>
        Streaming.nearDupDedupWithinWatermark(admitted, "ts", cfg.lateness, textCol,
          extraKeys = Seq("city")).drop(Seq(textCol).filterNot(
            Set("city", "ts", "temperature")): _*)
      case (None, Some(keys)) =>
        Streaming.dedupWithinWatermark(admitted, "ts", cfg.lateness, keys)
      case _ => admitted
    }

    val cleaned = cfg.statsSnapshot match {
      case Some(snap) => Streaming.cleanWithStaticBounds(deduped, snap, Seq("temperature"))
      case None => deduped
    }

    val windowed = Streaming.windowedAgg(
      cleaned, "ts", "city", "temperature", cfg.window, cfg.lateness,
      // either dedup branch already declared the watermark
      setWatermark = cfg.dedupKeys.isEmpty && cfg.dedupSignatureOf.isEmpty)

    val writer = windowed.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist: count + write must not re-execute the stateful agg
        batch.persist()
        try {
          val n = batch.count()
          if (n > 0) {
            // pipeline-owned counter; the generic batch/stream counters
            // come from the Metrics listeners, never from here (double
            // counting when both are wired)
            Metrics.inc(Metrics.StreamWindowsWritten, n)
            batch
              .withColumn("date", date_format(col("window_start"), "yyyy-MM-dd"))
              .write.mode("append").partitionBy("city", "date")
              .parquet(s"${cfg.outputDir}/windowed")
          }
        } finally batch.unpersist()
      }

    val main = (if (drain) writer.trigger(Trigger.AvailableNow()) else writer).start()

    val dlq = dirty.map { d =>
      val w = d.writeStream
        .option("checkpointLocation", s"${cfg.checkpointDir}-quarantine")
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.persist()
          try {
            val n = batch.count()
            if (n > 0) {
              Metrics.inc(Metrics.StreamRowsQuarantined, n)
              batch.write.mode("append").parquet(s"${cfg.outputDir}/quarantine")
            }
          } finally batch.unpersist()
        }
      (if (drain) w.trigger(Trigger.AvailableNow()) else w).start()
    }
    Seq(main) ++ dlq
  }
}
