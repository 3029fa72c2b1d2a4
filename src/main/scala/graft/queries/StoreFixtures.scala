package graft.queries

/** Shared build-once scaffolding for the graded queries' persisted
  * store fixtures (index/positional/PQ/IVFADC/vec/SCD2 stores under
  * java.io.tmpdir). One copy of the fingerprint + rebuild-gate dance —
  * each duplicated copy previously had to get the crash-window rebuild
  * rules right independently (ADVICE r10). */
private[queries] object StoreFixtures {

  /** Store path keyed by the fixture file's (length, mtime) and a
    * version tag: regenerating the fixture or bumping the tag derives a
    * FRESH path, so a schema or parameter change can never silently
    * reuse a stale store. */
  def path(prefix: String, sfDir: String, fixtureFile: String,
           tag: String): String = {
    val f = new java.io.File(sfDir, fixtureFile)
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${f.length}:${f.lastModified}:$tag".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/$prefix-" +
      s"${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}-$fp"
  }

  /** Build once, gated on an explicit done-marker: a MISSING marker
    * wipes the dir wholesale and reruns `build` — multi-step builds
    * (base + append, staged streams) interrupted mid-way would
    * double-append if resumed — then writes the marker LAST. */
  def onceByMarker(dir: String, marker: String)(build: => Unit): String = {
    val m = new java.io.File(dir, marker)
    if (!m.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
      build
      java.nio.file.Files.createDirectories(m.toPath.getParent)
      java.nio.file.Files.writeString(m.toPath, "1")
      ()
    }
    dir
  }

  /** Build once, gated on the store's own `_SUCCESS` under
    * `dir/successIn` (single-step builds whose writer commits at job
    * granularity — an absent _SUCCESS means the overwrite write simply
    * reruns). */
  def onceBySuccess(dir: String, successIn: String)(build: => Unit): String = {
    val probe =
      if (successIn.isEmpty) new java.io.File(dir, "_SUCCESS")
      else new java.io.File(new java.io.File(dir, successIn), "_SUCCESS")
    if (!probe.exists()) build
    dir
  }
}
