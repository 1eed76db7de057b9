package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.PlanSignature

/** Registry-wide plan-SHAPE regression gate (round-10 verdict stretch
  * item): every query's physical-operator multiset + exchange counts
  * must match the checked-in `plan_signatures.json`. The hash oracle
  * can't catch a broadcast join silently degrading to a shuffle join —
  * the rows stay identical; this gate fails the build instead, and a
  * REVIEWED plan change regenerates the file deliberately:
  *
  *   sbt "runMain graft.tools.PlanSignature"
  */
class PlanSignatureSpec extends AnyFunSuite {
  import TestSession.spark

  test("every registry query's plan shape matches plan_signatures.json") {
    val path = java.nio.file.Paths.get(PlanSignature.defaultPath)
    assert(java.nio.file.Files.exists(path),
      s"${PlanSignature.defaultPath} missing — generate it with " +
        "`sbt \"runMain graft.tools.PlanSignature\"` and commit it")
    val entry = """\s*"((?:[^"\\]|\\.)*)":\s*"((?:[^"\\]|\\.)*)",?""".r
    def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
    val want: Map[String, String] =
      java.nio.file.Files.readString(path).linesIterator.collect {
        case entry(k, v) => unesc(k) -> unesc(v)
      }.toMap
    val got = PlanSignature
      .registrySignatures(spark, PlanSignature.defaultSf).toMap

    val missing = got.keySet.diff(want.keySet).toSeq.sorted
    val stale = want.keySet.diff(got.keySet).toSeq.sorted
    val changed = got.keySet.intersect(want.keySet).toSeq.sorted
      .filter(k => got(k) != want(k))
      .map(k => s"$k:\n  pinned: ${want(k)}\n  now:    ${got(k)}")
    val report = Seq(
      if (missing.nonEmpty) s"unpinned new queries: ${missing.mkString(", ")}" else "",
      if (stale.nonEmpty) s"pinned but gone: ${stale.mkString(", ")}" else "",
      if (changed.nonEmpty) s"shape changed:\n${changed.mkString("\n")}" else "",
    ).filter(_.nonEmpty).mkString("\n")
    assert(report.isEmpty,
      s"\n$report\nIf the change is intended, regenerate with " +
        "`sbt \"runMain graft.tools.PlanSignature\"` and commit the diff.")
  }
}
