package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Relations

/** Official-name canonicalization vs the reference's KBP2013 switch
 *  (evaluate/OfficialOutputWriter.java:184-196) — the expected map is
 *  transcribed here independently of Relations.official2013 so the two
 *  cannot drift self-consistently (the P/R gate alone cannot catch a
 *  rename bug because PageGen gold goes through the same map). */
class OntologySpec extends AnyFunSuite {

  test("official2013 mirrors OfficialOutputWriter KBP2013 exactly") {
    val reference = Map(
      "per:employee_of" -> "per:employee_or_member_of",
      "per:member_of" -> "per:employee_or_member_of",
      "per:stateorprovinces_of_residence" -> "per:statesorprovinces_of_residence",
      "org:political/religious_affiliation" -> "org:political_religious_affiliation",
      "org:top_members/employees" -> "org:top_members_employees",
      "org:number_of_employees/members" -> "org:number_of_employees_members",
      "org:founded" -> "org:date_founded",
      "org:dissolved" -> "org:date_dissolved")
    assert(Relations.official2013 == reference)
    // names the reference never renames pass through unchanged
    Relations.names.filterNot(reference.contains).foreach { n =>
      assert(Relations.officialName(n) == n, s"spurious rename of $n")
    }
  }

  test("every official output name is accepted back on input (fromString)") {
    Relations.names.foreach { n =>
      val meta = Relations.fromString(Relations.officialName(n))
      assert(meta.isDefined, s"official name of $n not accepted on input")
      // the merged employee/member name maps to one of its two sources
      if (Relations.officialName(n) != n && n != "per:member_of")
        assert(meta.get.name == n)
    }
  }
}
