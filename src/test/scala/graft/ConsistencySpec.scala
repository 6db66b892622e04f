package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.consistency.Consistency
import graft.model.{NER, Provenance, SlotFill}

class ConsistencySpec extends AnyFunSuite {

  private val prov = Provenance("d", "u", 0, 0, 1, 2, 3)
  private def f(subj: String, pred: String, obj: String, score: Double = 1.0,
                subjType: String = NER.PERSON, objType: String = NER.CITY) =
    SlotFill(subj, subjType, pred, obj, objType, score, prov)

  test("X2 type gate kills wrong entity/slot types") {
    assert(Consistency.unaryOne(
      f("Acme", "per:title", "engineer", subjType = NER.ORGANIZATION,
        objType = NER.TITLE)).isEmpty)
    assert(Consistency.unaryOne(
      f("A", "per:city_of_birth", "March", objType = NER.DATE)).isEmpty)
  }

  test("X4 sanity: length, age range, subj==obj") {
    assert(Consistency.unaryOne(f("A", "per:city_of_birth", "x" * 81)).isEmpty)
    assert(Consistency.unaryOne(
      f("A", "per:age", "300", objType = NER.NUMBER)).isEmpty)
    assert(Consistency.unaryOne(
      f("A", "per:age", "44", objType = NER.NUMBER)).isDefined)
    assert(Consistency.unaryOne(f("Paris", "per:city_of_birth", "Paris")).isEmpty)
  }

  test("X5 date padding and year requirement") {
    val padded = Consistency.unaryOne(
      f("A", "org:founded", "1985", subjType = NER.ORGANIZATION,
        objType = NER.DATE)).get
    assert(padded.obj == "1985-XX-XX")
    assert(Consistency.unaryOne(
      f("A", "per:date_of_birth", "XXXX-03-12", objType = NER.DATE)).isEmpty)
    // death dates may lack a year
    assert(Consistency.unaryOne(
      f("A", "per:date_of_death", "XXXX-03-12", objType = NER.DATE)).isDefined)
  }

  test("X1 website overlap filter + base-url rewrite") {
    val ok = Consistency.unaryOne(f("Acme Global Corp", "org:website",
      "https://www.acmeglobal.com/about", subjType = NER.ORGANIZATION,
      objType = NER.URL))
    assert(ok.exists(_.obj == "https://www.acmeglobal.com"))
    assert(Consistency.unaryOne(f("Acme Global Corp", "org:website",
      "https://www.zzzqqq.com", subjType = NER.ORGANIZATION,
      objType = NER.URL)).isEmpty)
  }

  test("X12 nationality -> country rewrite for country relations") {
    val r = Consistency.unaryOne(f("A", "per:country_of_birth", "French",
      objType = NER.NATIONALITY)).get
    assert(r.obj == "France" && r.obj_type == NER.COUNTRY)
  }

  test("X13 exact dedup keeps best score") {
    val out = Consistency.entityPass(Seq(
      f("A", "per:title", "engineer", 0.9, objType = NER.TITLE),
      f("A", "per:title", "engineer", 0.6, objType = NER.TITLE)))
    assert(out.size == 1 && out.head.score == 0.9)
  }

  test("X13b employee_of dies under same-pair member_of") {
    val out = Consistency.entityPass(Seq(
      f("A", "per:employee_of", "Acme", 0.9, objType = NER.ORGANIZATION),
      f("A", "per:member_of", "Acme", 0.8, objType = NER.ORGANIZATION)))
    assert(out.map(_.pred) == Seq("per:member_of"))
  }

  test("X15 SINGLE-cardinality argmax keeps exactly one") {
    val out = Consistency.entityPass(Seq(
      f("A", "per:city_of_birth", "Paris", 0.9),
      f("A", "per:city_of_birth", "Lyon", 0.8)))
    assert(out.size == 1 && out.head.obj == "Paris")
    // LIST relations keep both
    val out2 = Consistency.entityPass(Seq(
      f("A", "per:cities_of_residence", "Paris", 0.9),
      f("A", "per:cities_of_residence", "Lyon", 0.8)))
    assert(out2.size == 2)
  }

  test("X16 incompatible same-obj relations: lower dies unless plausible") {
    val out = Consistency.entityPass(Seq(
      f("A", "per:spouse", "Bob King", 0.9, objType = NER.PERSON),
      f("A", "per:other_family", "Bob King", 0.8, objType = NER.PERSON)))
    assert(out.map(_.pred) == Seq("per:spouse"))
    // plausible overlap survives: employee_of + schools_attended
    val out2 = Consistency.entityPass(Seq(
      f("A", "per:employee_of", "Acme University", 0.9, objType = NER.ORGANIZATION),
      f("A", "per:schools_attended", "Acme University", 0.8, objType = NER.ORGANIZATION)))
    assert(out2.size == 2)
  }

  test("X17 location of death requires date of death") {
    val noDate = Consistency.entityPass(Seq(
      f("A", "per:city_of_death", "Paris", 0.9)))
    assert(noDate.isEmpty)
    val withDate = Consistency.entityPass(Seq(
      f("A", "per:city_of_death", "Paris", 0.9),
      f("A", "per:date_of_death", "1999-03-02", 0.9, objType = NER.DATE)))
    assert(withDate.size == 2)
  }

  test("X12 pairwise geo: state fill must match the city's state") {
    val ok = Consistency.entityPass(Seq(
      f("A", "per:city_of_birth", "Paris", 1.0),
      f("A", "per:stateorprovince_of_birth", "Ile-de-France", 1.0,
        objType = NER.STATE_OR_PROVINCE),
      f("A", "per:date_of_death", "1999-01-01", 1.0, objType = NER.DATE)))
    assert(ok.size == 3)
    val bad = Consistency.entityPass(Seq(
      f("A", "per:city_of_birth", "Paris", 1.0),
      f("A", "per:stateorprovince_of_birth", "Texas", 1.0,
        objType = NER.STATE_OR_PROVINCE)))
    assert(bad.map(_.pred) == Seq("per:city_of_birth"))
  }

  test("X12 state fill implies country agreement; country aliases rename") {
    val ok = Consistency.entityPass(Seq(
      f("A", "per:stateorprovince_of_birth", "Texas", 1.0,
        objType = NER.STATE_OR_PROVINCE),
      f("A", "per:country_of_birth", "United States", 1.0,
        objType = NER.COUNTRY)))
    assert(ok.size == 2)
    // reference semantics (pairwiseKeepLowerScoringFill): the LOWER-scoring
    // side of an inconsistent region/country pair dies — state-in-wrong-
    // country killed when the country outranks it...
    val stateDies = Consistency.entityPass(Seq(
      f("A", "per:country_of_birth", "France", 0.9, objType = NER.COUNTRY),
      f("A", "per:stateorprovince_of_birth", "Texas", 0.8,
        objType = NER.STATE_OR_PROVINCE)))
    assert(stateDies.map(_.pred) == Seq("per:country_of_birth"))
    // ...and the wrong country dies when the state outranks it
    val countryDies = Consistency.entityPass(Seq(
      f("A", "per:stateorprovince_of_birth", "Texas", 0.9,
        objType = NER.STATE_OR_PROVINCE),
      f("A", "per:country_of_birth", "France", 0.8, objType = NER.COUNTRY)))
    assert(countryDies.map(_.pred) == Seq("per:stateorprovince_of_birth"))
    // canonical rename: U.S. -> United States (unary)
    val r = Consistency.unaryOne(f("A", "per:country_of_birth", "U.S.",
      objType = NER.COUNTRY)).get
    assert(r.obj == "United States")
  }

  test("X12 region-code canonical rename + city abbreviation rename") {
    val ca = Consistency.unaryOne(f("A", "per:stateorprovince_of_birth",
      "CA", objType = NER.STATE_OR_PROVINCE)).get
    assert(ca.obj == "California")
    val on = Consistency.unaryOne(f("A", "per:stateorprovince_of_birth",
      "ON", objType = NER.STATE_OR_PROVINCE)).get
    assert(on.obj == "Ontario")
    // an already-canonical region is untouched
    val tx = Consistency.unaryOne(f("A", "per:stateorprovince_of_birth",
      "Texas", objType = NER.STATE_OR_PROVINCE)).get
    assert(tx.obj == "Texas")
    val nyc = Consistency.unaryOne(
      f("A", "per:cities_of_residence", "NYC")).get
    assert(nyc.obj == "New York")
    // alternate country names beyond the flat alias map
    val gb = Consistency.unaryOne(f("A", "per:country_of_birth",
      "Great Britain", objType = NER.COUNTRY)).get
    assert(gb.obj == "United Kingdom")
  }

  test("X12 containment hierarchy: ambiguous city names fail open, wrong pairs die") {
    import graft.consistency.WorldKnowledge
    val wk = WorldKnowledge.default
    // Cambridge exists in England AND Massachusetts: both containments hold
    assert(wk.consistentCityRegion("Cambridge", "England"))
    assert(wk.consistentCityRegion("Cambridge", "Massachusetts"))
    assert(wk.consistentCityCountry("Cambridge", "United Kingdom"))
    assert(wk.consistentCityCountry("Cambridge", "United States"))
    assert(!wk.consistentCityRegion("Cambridge", "Texas"))
    // population-weighted primary region picks the bigger Cambridge
    assert(wk.regionForCity("Cambridge").contains("England"))
    // unknown city: checks pass (fail-open — recall-safe at web scale)
    assert(wk.consistentCityRegion("Nowhereville", "Texas"))
    // region-country containment through the hierarchy
    assert(wk.consistentRegionCountry("Ontario", "Canada"))
    assert(!wk.consistentRegionCountry("Ontario", "France"))
    assert(wk.countryForRegion("Ontario").contains("Canada"))
    assert(wk.countryForCity("Toronto").contains("Canada"))
    // entityPass: city of residence + hq-family untouched; wrong-state
    // residence fill dies against the higher-ranked city
    val out = Consistency.entityPass(Seq(
      f("A", "per:cities_of_residence", "Toronto", 0.9),
      f("A", "per:stateorprovinces_of_residence", "Texas", 0.8,
        objType = NER.STATE_OR_PROVINCE),
      f("A", "per:stateorprovinces_of_residence", "Ontario", 0.7,
        objType = NER.STATE_OR_PROVINCE)))
    assert(out.map(_.obj) == Seq("Toronto", "Ontario"))
  }

  test("X5 invalid-title stop-set kills generic titles") {
    assert(Consistency.unaryOne(
      f("A", "per:title", "leader", objType = NER.TITLE)).isEmpty)
    assert(Consistency.unaryOne(
      f("A", "per:title", "engineer", objType = NER.TITLE)).isDefined)
  }

  test("entityPass is idempotent") {
    val fills = Seq(
      f("A", "per:city_of_birth", "Paris", 0.9),
      f("A", "per:cities_of_residence", "Lyon", 0.7),
      f("A", "per:title", "engineer", 0.8, objType = NER.TITLE))
    val once = Consistency.entityPass(fills)
    assert(Consistency.entityPass(once) == once)
  }

  test("Gibbs SUM variant escapes the greedy local optimum; agrees with " +
       "greedy when greedy is optimal") {
    // A (0.9) X16-clashes with BOTH B and C (same obj, implausible pred
    // overlap); B and C are mutually plausible. Greedy (score order)
    // keeps only A (sum 0.9); the SUM objective prefers {B, C} (1.2).
    val o = "Acme Corp"
    val a = f("A", "per:origin", o, 0.9)
    val b = f("A", "per:spouse", o, 0.6)
    val c = f("A", "per:stateorprovince_of_birth", o, 0.6)
    assert(Consistency.entityPass(Seq(a, b, c)).toSet == Set(a))
    val gibbs = Consistency.entityPassGibbs(Seq(a, b, c), mixingTime = 20)
    assert(gibbs.toSet == Set(b, c))
    // when greedy is already optimal, the variant returns the same set
    // (the greedy assignment seeds the argmax)
    val fills = Seq(
      f("A", "per:city_of_birth", "Paris", 0.9),
      f("A", "per:title", "engineer", 0.8, objType = NER.TITLE))
    assert(Consistency.entityPassGibbs(fills).toSet ==
      Consistency.entityPass(fills).toSet)
  }
}
