package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for operator specs. Small core count + few
  * shuffle partitions keeps tiny-fixture tests fast; UTC pinned to match
  * the driver harness (SURVEY §7.4 risk 2).
  */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session
  override def afterAll(): Unit = () // shared session; never stop per-suite
}

object SparkTestBase {
  lazy val session: SparkSession = graft.sink.BucketedMirror
    .withSessionConfs(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()
}
