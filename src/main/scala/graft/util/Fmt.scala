package graft.util

/** Locale-pinned number formatting for every JSON-emitting path.
  *
  * `f"$d%.3f"` uses the JVM default locale: on a comma-decimal locale
  * (de_DE etc.) it renders `1,234` and the emitted JSON line — the
  * driver contract — is unparseable. Same failure class inside the
  * MultiProcBench protocol, where the parent `toDouble`s the worker's
  * DONE line. One ROOT-locale helper, shared by every emitter, so the
  * fix cannot drift per call site.
  */
object Fmt {
  def f3(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
}
