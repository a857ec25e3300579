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

  /** S4 — path sandbox (simple_server.py:98-150): resolved path must
    * live under one of the allowed roots. Resolution follows symlinks
    * (like the reference's Path.resolve()) — a symlink inside an
    * allowed root pointing outside it must NOT pass. For path segments
    * that do not exist yet, the deepest existing ancestor is resolved
    * and the remainder appended lexically, matching Python's
    * Path.resolve(strict=False).
    */
  def validateSandboxed(path: String, allowedRoots: Seq[String]): Result = {
    def real(p: java.nio.file.Path): java.nio.file.Path =
      try p.toRealPath()
      catch {
        case _: java.io.IOException =>
          val parent = p.getParent
          if (parent == null) p
          else real(parent).resolve(p.getFileName)
      }
    val resolved = real(java.nio.file.Paths.get(path).toAbsolutePath.normalize)
    val ok = allowedRoots.exists { root =>
      resolved.startsWith(
        real(java.nio.file.Paths.get(root).toAbsolutePath.normalize))
    }
    if (ok) Valid else Invalid(s"path outside allowed roots: $resolved")
  }
}
