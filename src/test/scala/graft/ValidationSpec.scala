package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.{SystemInfo, Validation}
import graft.api.Validation._

class ValidationSpec extends AnyFunSuite {

  test("query: empty and over-length rejected, bounds match reference") {
    assert(!validateQuery("").isValid)
    assert(!validateQuery("  ").isValid)
    assert(validateQuery("a" * 1000).isValid)
    assert(!validateQuery("a" * 1001).isValid)
  }

  test("top_k clamped to [1, 20], default 5") {
    assert(clampTopK(0) == 1)
    assert(clampTopK(5) == 5)
    assert(clampTopK(21) == 20)
    assert(Validation.DefaultTopK == 5)
  }

  test("document path: suffix, length") {
    assert(validateDocumentPath("/x/doc.pdf").isValid)
    assert(validateDocumentPath("/x/DOC.PDF").isValid)
    assert(!validateDocumentPath("/x/doc.txt").isValid)
    assert(!validateDocumentPath(("a" * 252) + ".pdf").isValid)
  }

  test("file size cap 50 MB, batch cap 100") {
    assert(validateFileSize(50L * 1024 * 1024).isValid)
    assert(!validateFileSize(50L * 1024 * 1024 + 1).isValid)
    assert(validateBatchSize(100).isValid)
    assert(!validateBatchSize(101).isValid)
  }

  test("sandbox: a symlink escaping the allowed root is rejected") {
    val root = java.nio.file.Files.createTempDirectory("sbx").toString
    val outside = java.nio.file.Files.createTempDirectory("out")
    val link = java.nio.file.Paths.get(root, "escape")
    java.nio.file.Files.createSymbolicLink(link, outside)
    assert(!Validation.validateSandboxed(s"$root/escape/x.pdf", Seq(root)).isValid)
    assert(Validation.validateSandboxed(s"$root/ok/x.pdf", Seq(root)).isValid)
  }

  test("system info + component self-test mirror the reference introspection") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val chunks = Seq(("c1", "x"), ("c2", "y")).toDF("chunk_id", "content")
    val info = SystemInfo.systemInfo(chunks, "knowledge_base", "/tmp/store")
    assert(info.vector_store.document_count == 2)
    assert(info.embedding_dim == graft.rag.HashEmbedder.Dim)
    val tests = SystemInfo.testComponents(chunks)
    assert(tests.embedding_model && tests.llm && tests.vector_store)
  }

  test("sandbox: symlink resolves BEFORE '..' — root/link/../x climbs from the target") {
    val root = java.nio.file.Files.createTempDirectory("sbx2").toString
    val outside = java.nio.file.Files.createTempDirectory("out2")
    val link = java.nio.file.Paths.get(root, "ldir")
    java.nio.file.Files.createSymbolicLink(link, outside)
    // lexical collapse would turn root/ldir/../esc.pdf into root/esc.pdf
    // (inside!); symlink-first resolution climbs from `outside`'s parent
    val r = Validation.validateSandboxed(s"$root/ldir/../esc.pdf", Seq(root))
    assert(!r.isValid)
    // and the resolved form names the true parent, not the lexical one
    assert(Validation.resolvePosix(s"$root/ldir/../esc.pdf") ==
      outside.toRealPath().getParent.resolve("esc.pdf"))
  }

  test("sandbox: a DANGLING symlink escaping the root is rejected (write-through escape)") {
    val root = java.nio.file.Files.createTempDirectory("sbx3").toString
    val outside = java.nio.file.Files.createTempDirectory("out3")
    // link target does NOT exist yet — toRealPath throws for it, but a
    // later write through the link would CREATE the file outside the
    // root, so resolution must still follow the link (realpath
    // semantics), not fall back to the lexical path under root
    val link = java.nio.file.Paths.get(root, "dangling")
    java.nio.file.Files.createSymbolicLink(link,
      outside.resolve("not_yet_created.pdf"))
    assert(!Validation.validateSandboxed(s"$root/dangling", Seq(root)).isValid)
    // a dangling link whose target stays INSIDE the root remains valid
    val inLink = java.nio.file.Paths.get(root, "inside")
    java.nio.file.Files.createSymbolicLink(inLink,
      java.nio.file.Paths.get(root, "later.pdf"))
    assert(Validation.validateSandboxed(s"$root/inside", Seq(root)).isValid)
    // a dangling-link LOOP terminates at the depth bound, not an error
    val a = java.nio.file.Paths.get(root, "loop_a")
    val b = java.nio.file.Paths.get(root, "loop_b")
    java.nio.file.Files.createSymbolicLink(a, b)
    java.nio.file.Files.createSymbolicLink(b, a)
    assert(Validation.validateSandboxed(s"$root/loop_a", Seq(root)).isValid)
  }

  test("sandbox: resolved path must be under an allowed root") {
    assert(validateSandboxed("/tmp/a/../b.pdf", Seq("/tmp")).isValid)
    assert(!validateSandboxed("/tmp/../etc/passwd", Seq("/tmp")).isValid)
    assert(!validateSandboxed("/etc/x.pdf", Seq("/tmp", "/root/repo")).isValid)
  }
}
