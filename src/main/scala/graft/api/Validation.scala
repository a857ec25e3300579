package graft.api

/** S3/S4 — the MCP/HTTP layer's validation semantics as pure functions
  * (/root/reference/src/mcp/simple_server.py:39-43,98-150,428-543).
  * Not dataflow ops; kept driver-side exactly like the reference keeps
  * them at the API edge.
  */
object Validation {

  val MaxBatchFiles = 100 // simple_server.py:39
  val MaxFileSizeMb = 50 // simple_server.py:40
  val MaxPathLength = 255 // simple_server.py:41
  val MaxQueryLength = 1000 // simple_server.py:42
  val MaxTopK = 20 // simple_server.py:43
  val DefaultTopK = 5

  sealed trait Result { def isValid: Boolean }
  case object Valid extends Result { val isValid = true }
  final case class Invalid(reason: String) extends Result { val isValid = false }

  /** simple_server.py:436-446 */
  def validateQuery(q: String): Result =
    if (q == null || q.trim.isEmpty) Invalid("query must not be empty")
    else if (q.length > MaxQueryLength)
      Invalid(s"query exceeds $MaxQueryLength characters")
    else Valid

  /** simple_server.py:449-452 — clamp, not reject */
  def clampTopK(k: Int): Int = math.max(1, math.min(MaxTopK, k))

  /** converter.py:96-111 — suffix + existence are the reference's
    * checks; existence is the caller's concern here.
    */
  def validateDocumentPath(path: String): Result =
    if (path == null || path.isEmpty) Invalid("path must not be empty")
    else if (path.length > MaxPathLength)
      Invalid(s"path exceeds $MaxPathLength characters")
    else if (!path.toLowerCase.endsWith(".pdf"))
      Invalid("only .pdf files are supported")
    else Valid

  /** simple_server.py:539-543 */
  def validateFileSize(bytes: Long): Result =
    if (bytes > MaxFileSizeMb * 1024L * 1024L)
      Invalid(s"file exceeds $MaxFileSizeMb MB")
    else Valid

  /** simple_server.py:519 */
  def validateBatchSize(n: Int): Result =
    if (n > MaxBatchFiles) Invalid(s"batch exceeds $MaxBatchFiles files")
    else Valid

  /** Resolve like Python's Path.resolve(strict=False): walk the
    * absolute path COMPONENT-WISE, resolving each existing prefix's
    * symlinks BEFORE applying a later `..`. Lexically normalizing
    * first would collapse `root/L/../x` to `root/x` even when L is a
    * symlink out of the root — the OS (and the reference) resolve L
    * first, so `..` climbs from the link *target*. Segments that do
    * not exist yet fall back to lexical appends, matching
    * strict=False — but an EXISTING symlink whose target does not
    * exist yet (toRealPath throws for it too) is still FOLLOWED, like
    * os.path.realpath: falling back to the lexical path there would
    * pass the sandbox check while a later write through the link
    * lands outside the root. Link-follow depth is bounded like the
    * kernel's ELOOP (40); past it the lexical path stands.
    */
  private val MaxSymlinkDepth = 40

  def resolvePosix(path: String): java.nio.file.Path =
    resolveWalk(java.nio.file.Paths.get(path).toAbsolutePath, 0)

  private def resolveWalk(abs: java.nio.file.Path, depth: Int): java.nio.file.Path = {
    var cur = abs.getRoot
    val it = abs.iterator()
    while (it.hasNext) {
      val seg = it.next().toString
      if (seg == "." || seg.isEmpty) ()
      else if (seg == "..") {
        val p = cur.getParent
        if (p != null) cur = p
      } else {
        val cand = cur.resolve(seg)
        cur =
          try cand.toRealPath() // resolves the symlink when its target exists
          catch {
            case _: java.io.IOException =>
              if (depth < MaxSymlinkDepth &&
                  java.nio.file.Files.isSymbolicLink(cand)) {
                // dangling (or looping) link: follow its target and
                // re-resolve it component-wise — the target may itself
                // contain `..` or further links
                val t = java.nio.file.Files.readSymbolicLink(cand)
                val target =
                  if (t.isAbsolute) t else cand.getParent.resolve(t)
                resolveWalk(target, depth + 1)
              } else cand // not yet created (or depth exhausted)
          }
      }
    }
    cur
  }

  /** S4 — path sandbox (simple_server.py:98-150): resolved path must
    * live under one of the allowed roots. Resolution follows symlinks
    * component-wise before `..` is applied (resolvePosix above) — a
    * symlink inside an allowed root pointing outside it must NOT pass,
    * including via the `root/link/../x` parent-traversal form.
    */
  def validateSandboxed(path: String, allowedRoots: Seq[String]): Result = {
    val resolved = resolvePosix(path)
    val ok = allowedRoots.exists(root => resolved.startsWith(resolvePosix(root)))
    if (ok) Valid else Invalid(s"path outside allowed roots: $resolved")
  }
}
