package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Catalog

/** The fail-loud staleness posture around the materialization cache
  * (VERDICT r13 #8): fingerprinted keys rebuild cleanly ACROSS sessions,
  * but a mid-session source regeneration must throw, not silently mix
  * derived-store generations between entries. */
class CatalogSpec extends AnyFunSuite {

  test("mid-session source regeneration fails loud, stable sources pass") {
    val dir = s"/tmp/graft-catalog-spec-${System.nanoTime()}"
    Catalog.assertStableSource(dir, "aaaa11")
    Catalog.assertStableSource(dir, "aaaa11") // unchanged: idempotent
    val e = intercept[IllegalStateException] {
      Catalog.assertStableSource(dir, "bbbb22")
    }
    assert(e.getMessage.contains("regenerated mid-session"), e.getMessage)
    assert(e.getMessage.contains(dir), e.getMessage)
  }
}
