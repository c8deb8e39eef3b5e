package graft.mr

import scala.sys.process._
import org.scalatest.funsuite.AnyFunSuite

/** Drives ClusterChaosMain in a CHILD JVM (one SparkContext per JVM; the
  * shared local[4,2] test session can't host a local-cluster master).
  * Covers the two reference behaviors the in-JVM ChaosSpec can't: real
  * executor-process death (crash.go) and straggler speculation
  * (coordinator deadline re-issue).
  */
class ClusterChaosSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def runChild(mode: String): (Int, String) = {
    val java = sys.props("java.home") + "/bin/java"
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.mr.ClusterChaosMain", mode)
    val buf = new StringBuilder
    val logger = ProcessLogger(l => buf.append(l).append('\n'), l => buf.append(l).append('\n'))
    // SPARK_SCALA_VERSION: the in-process Worker builds executor commands
    // via WorkerCommandBuilder, which skips the release scripts that
    // normally set it — without it getScalaVersion() hunts for dev build
    // directories and executor launch fails.
    val code = Process(cmd, None,
      "SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13").!(logger)
    (code, buf.toString)
  }

  test("executor-JVM death: task re-executes elsewhere; wc output equals the oracle") {
    val (code, log) = runChild("kill")
    assert(code == 0 && log.contains("[clusterchaos] kill OK"),
      s"child failed (exit $code):\n${log.linesIterator.toSeq.takeRight(30).mkString("\n")}")
  }

  test("speculation: the scheduler re-issues a straggler past the deadline") {
    val (code, log) = runChild("speculate")
    assert(code == 0 && log.contains("[clusterchaos] speculate OK"),
      s"child failed (exit $code):\n${log.linesIterator.toSeq.takeRight(30).mkString("\n")}")
  }
}
