package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Repo hygiene: no Scala source may contain raw control characters.
  * A literal NUL (or any C0 control) byte in a string literal makes git
  * classify the file as binary, so its diffs/blame/grep go dark — write
  * `backslash-u0000` escapes instead (advisor finding, round 3).
  */
class HygieneSpec extends AnyFunSuite {

  test("no .scala source contains raw control characters") {
    // anchor on this spec's own compiled class location (target/...),
    // walking up to the build root that owns src/ — NOT the process CWD,
    // which a runner started elsewhere could point at an unrelated tree
    // (vacuous pass or foreign-file failures); walk stream closed so
    // directory handles don't leak.
    val classAnchor = Paths.get(
      getClass.getProtectionDomain.getCodeSource.getLocation.toURI).toAbsolutePath
    val src = Iterator.iterate(classAnchor)(_.getParent)
      .takeWhile(_ != null).map(_.resolve("src")).find(Files.isDirectory(_))
      .getOrElse(fail("no src/ directory found above the compiled classes — cannot scan sources"))
    val walk = Files.walk(src)
    val offenders =
      try {
        walk.iterator().asScala
          .filter(p => p.toString.endsWith(".scala") && Files.isRegularFile(p))
          .filter { p =>
            val bytes = Files.readAllBytes(p)
            bytes.exists(b => b >= 0 && b < 0x20 && b != '\n' && b != '\t' && b != '\r')
          }
          .map(_.toString).toList
      } finally walk.close()
    assert(offenders.isEmpty,
      s"raw control characters (git-binary trap) in: ${offenders.mkString(", ")}")
  }
}
