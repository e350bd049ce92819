// Spark namespace: metrics.source.Source and SparkEnv.metricsSystem are
// private[spark]; registering a custom Source is the documented pattern
// for surfacing library metrics through Spark's metrics system (and from
// there to its Prometheus/JMX/console sinks).
package org.apache.spark.sql.graft

import com.codahale.metrics.{Gauge, MetricRegistry}
import org.apache.spark.SparkEnv
import org.apache.spark.metrics.source.Source

/** Spark metrics Source exposing the graft counters (reference metric
  * names, SURVEY §2.12) as gauges: whatever sink the cluster's
  * metrics.properties configures — including Spark's built-in
  * PrometheusServlet — now scrapes `weather_records_processed` etc.
  * exactly like the reference's Grafana dashboard expects
  * (monitoring/prometheus.yml:1-5, grafana-dashboard.json:69-80).
  */
class GraftMetricsSource(names: Seq[String], read: String => Long) extends Source {
  override val sourceName: String = "graft_weather"
  override val metricRegistry: MetricRegistry = new MetricRegistry()
  names.foreach { n =>
    metricRegistry.register(n, new Gauge[Long] { override def getValue: Long = read(n) })
  }
}

object GraftMetricsSource {
  @volatile private var registered: Option[GraftMetricsSource] = None

  /** Register once per JVM with Spark's metrics system; idempotent (the
    * metrics system throws on duplicate source names). A call before the
    * SparkEnv exists returns an UNREGISTERED source and does NOT cache it,
    * so the next call (with a live env) still registers.
    */
  def register(names: Seq[String], read: String => Long): GraftMetricsSource =
    synchronized {
      registered.getOrElse {
        val s = new GraftMetricsSource(names, read)
        Option(SparkEnv.get) match {
          case Some(env) =>
            env.metricsSystem.registerSource(s)
            registered = Some(s)
            s
          case None => s
        }
      }
    }
}
