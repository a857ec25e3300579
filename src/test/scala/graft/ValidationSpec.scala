package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Validation
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

  test("sandbox: resolved path must be under an allowed root") {
    assert(validateSandboxed("/tmp/a/../b.pdf", Seq("/tmp")).isValid)
    assert(!validateSandboxed("/tmp/../etc/passwd", Seq("/tmp")).isValid)
    assert(!validateSandboxed("/etc/x.pdf", Seq("/tmp", "/root/repo")).isValid)
  }
}
