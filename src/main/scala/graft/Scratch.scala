package graft

/** Stable per-input scratch directories for gates/fixtures that
  * materialize a derived table (TSV round-trip, the q61/q62 scratch
  * lake). Keyed by the FULL md5 of the absolute input path: a 32-bit
  * `hashCode` key can collide across two different dataset paths, and
  * two concurrent runs would then delete and rebuild each other's
  * scratch mid-gate. Fixed (non-random) names are deliberate — the dir
  * is overwritten per run instead of leaking one temp dir per
  * invocation across repeated gate/bench runs.
  */
object Scratch {
  def dirFor(tag: String, inputPath: String): String = {
    val abs = java.nio.file.Paths.get(inputPath).toAbsolutePath.toString
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"), s"graft-$tag-$md5").toString
  }
}
