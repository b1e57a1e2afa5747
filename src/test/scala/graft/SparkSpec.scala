package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all suites: one local session, UTC, non-ANSI
  * (pandas/DuckDB division semantics), small shuffle fan-out. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** Write a test-input file under target/test-fixtures/<subdir>/. */
  def writeFixture(subdir: String, name: String, content: String): String = {
    val dir = java.nio.file.Paths.get("target", "test-fixtures", subdir)
    java.nio.file.Files.createDirectories(dir)
    val p = dir.resolve(name)
    java.nio.file.Files.writeString(p, content)
    p.toString
  }
}
