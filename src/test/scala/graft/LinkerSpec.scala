package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.link.Linker
import graft.model.NER

class LinkerSpec extends AnyFunSuite {

  test("blocking keys: normalized, acronym, surname") {
    val keys = Linker.blockKeys("John Smith", NER.PERSON)
    assert(keys.contains("n:PERSON:john smith"))
    assert(keys.contains("s:PERSON:smith"))
    val orgKeys = Linker.blockKeys("Global Dynamics Corp.", NER.ORGANIZATION)
    assert(orgKeys.contains("n:ORGANIZATION:global dynamics"))
    assert(orgKeys.exists(_.startsWith("a:ORGANIZATION:gdc")))
    val acr = Linker.blockKeys("GDC", NER.ORGANIZATION)
    assert(acr.contains("a:ORGANIZATION:gdc")) // shares the acronym block
  }

  test("sameEntity: suffix-stripped equality, acronym, containment") {
    assert(Linker.sameEntity("Acme Corp.", "Acme"))
    assert(Linker.sameEntity("GDC", "Global Dynamics Corp"))
    assert(Linker.sameEntity("Smith", "John Smith"))
    assert(!Linker.sameEntity("John Smith", "John Davis"))
    assert(!Linker.sameEntity("Global Dynamics Group",
      "Global Dynamics Holdings"))
  }
}
