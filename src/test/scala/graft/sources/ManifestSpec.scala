package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.conf.Configuration

/** The consolidated provenance manifest (round 19, VERDICT r18 #3): one
  * reader/writer for every staged-product sidecar — shingle basis,
  * embedding signatures, frozen delta plans, the IVF serving index. The
  * fence semantics the staged dispatches rely on live HERE, so the
  * roundtrip, escaping, strictness, and mismatch behavior are pinned
  * once for all families (the family specs then only need to prove
  * their own fence FIELDS are right).
  */
class ManifestSpec extends AnyFunSuite {

  private val conf = new Configuration()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("manifest-spec").toString

  test("write/read roundtrip: strings, ints, longs, escapes") {
    val dir = tmpDir()
    val fields = Seq[(String, Any)](
      "sfDir" -> """/odd "path"\with\escapes""",
      "tag" -> "hi768",
      "multiline" -> "a\nb",
      "dim" -> 768, "rows" -> 123456789012345L, "neg" -> -3)
    Manifest.write(conf, dir, "m.json", fields)
    val m = Manifest.read(conf, dir, "m.json").get
    assert(m("sfDir") == """/odd "path"\with\escapes""")
    assert(m("tag") == "hi768")
    assert(m("multiline") == "a\nb")
    assert(m("dim") == "768" && m("rows") == "123456789012345" && m("neg") == "-3")
    assert(m.size == fields.size)
  }

  test("matches: all required fields must hold; extra manifest keys are fine") {
    val dir = tmpDir()
    Manifest.write(conf, dir, "m.json",
      Seq("corpusFp" -> "abc123", "dim" -> 64, "nprobe" -> 40))
    // A fence naming a subset (served values like nprobe not required).
    assert(Manifest.matches(conf, dir, "m.json",
      Seq("corpusFp" -> "abc123", "dim" -> 64)))
    // Any single mismatched field fails the fence.
    assert(!Manifest.matches(conf, dir, "m.json",
      Seq("corpusFp" -> "abc123", "dim" -> 65)))
    assert(!Manifest.matches(conf, dir, "m.json",
      Seq("corpusFp" -> "OTHER", "dim" -> 64)))
    // A required key absent from the manifest fails too.
    assert(!Manifest.matches(conf, dir, "m.json",
      Seq("corpusFp" -> "abc123", "missingKey" -> 1)))
  }

  test("missing file and malformed bodies read as None (fence → recompute)") {
    val dir = tmpDir()
    assert(Manifest.read(conf, dir, "absent.json").isEmpty)
    assert(!Manifest.matches(conf, dir, "absent.json", Seq("k" -> "v")))
    // Strictness: the reader accepts exactly the writer's shape.
    for (bad <- Seq("", "{", """{"k":}""", """{"k":"v"} trailing""",
        """{"k":"v",}""", """["not","an","object"]""", """{"k":1.5}""",
        """{k:"v"}"""))
      assert(Manifest.parse(bad).isEmpty, s"must reject: $bad")
    // And the empty object is valid (no fields — matches only an empty
    // requirement).
    assert(Manifest.parse("{}").contains(Map.empty[String, String]))
  }
}
