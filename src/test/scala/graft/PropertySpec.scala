package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.consistency.Consistency
import graft.model.{NER, Provenance, Relations, SlotFill}

/** Property tests via raw ScalaCheck generators (fixed seeds — no
 *  scalatestplus bridge in the offline dependency set). */
class PropertySpec extends AnyFunSuite {

  private val prov = Provenance("d", "u", 0, 0, 1, 2, 3)

  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("noisy-or is in [max p, 1)") {
    val gen = Gen.nonEmptyListOf(Gen.choose(0.0, 0.999))
    samples(gen).foreach { ps =>
      val v = 1.0 - math.exp(ps.map(p => math.log1p(-p)).sum)
      // v < 1 mathematically; double rounding may reach exactly 1.0
      assert(v >= ps.max - 1e-12 && v <= 1.0)
    }
  }

  test("SINGLE-cardinality relations emit at most one fill per entity") {
    val deathLoc = Set("per:city_of_death", "per:stateorprovince_of_death",
      "per:country_of_death")
    val gen = for {
      rel <- Gen.oneOf(Relations.singleValued.toSeq.filterNot(deathLoc))
      objs <- Gen.nonEmptyListOf(
        Gen.identifier.suchThat(s => s.nonEmpty && s.length < 20))
      scores <- Gen.listOfN(objs.size, Gen.choose(0.02, 1.0))
    } yield objs.zip(scores).map { case (o, sc) =>
      val meta = Relations.byName(rel)
      SlotFill("EntityX", meta.entityType, rel, o, meta.primarySlotType,
        sc, prov)
    }
    samples(gen).foreach { fs =>
      val out = Consistency.entityPass(fs)
      out.groupBy(_.pred).foreach { case (p, v) =>
        if (Relations.singleValued.contains(p))
          assert(v.size <= 1, s"$p emitted ${v.size} fills")
      }
    }
  }

  test("entityPass idempotent on arbitrary scored fills") {
    val anyFill = for {
      rel <- Gen.oneOf(Relations.names)
      obj <- Gen.oneOf("Paris", "Acme Corp", "engineer", "1990-01-02", "42")
      sc <- Gen.choose(0.02, 1.0)
    } yield {
      val meta = Relations.byName(rel)
      SlotFill("E", meta.entityType, rel, obj, meta.primarySlotType, sc, prov)
    }
    samples(Gen.listOf(anyFill)).foreach { fs =>
      val once = Consistency.entityPass(fs)
      assert(Consistency.entityPass(once) == once)
    }
  }

  test("unary pass is order-independent and pure") {
    val anyFill = for {
      rel <- Gen.oneOf(Relations.names)
      obj <- Gen.oneOf("Paris", "France", "engineer", "1985", "44",
        "https://www.acme.com/x", "French")
      tpe <- Gen.oneOf(NER.CITY, NER.COUNTRY, NER.TITLE, NER.DATE,
        NER.NUMBER, NER.URL, NER.NATIONALITY)
      sc <- Gen.choose(0.0, 1.0)
    } yield {
      val meta = Relations.byName(rel)
      SlotFill("Acme Person", meta.entityType, rel, obj, tpe, sc, prov)
    }
    samples(Gen.listOf(anyFill)).foreach { fs =>
      val a = fs.flatMap(Consistency.unaryOne)
      val b = fs.reverse.flatMap(Consistency.unaryOne).reverse
      assert(a == b)
    }
  }
}
