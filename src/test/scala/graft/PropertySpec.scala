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

  test("DepLite arcs are well-formed on arbitrary POS streams") {
    import graft.model.Token
    import graft.nlp.DepLite
    val posGen = Gen.oneOf("NNP", "NN", "NNS", "VBD", "VB", "MD", "IN",
      "TO", "DT", "JJ", "CD", "RB", "PRP", "POS", "CC", ",", "SYM")
    val tokGen = for {
      pos <- posGen
      w <- Gen.oneOf("alpha", "beta", "gamma", "x", "of", "in", "the")
    } yield Token(w, w, 0, 0, pos, "O", "", "")
    samples(Gen.nonEmptyListOf(tokGen), n = 200).foreach { ts =>
      val toks = ts.toIndexedSeq
      val arcs = DepLite.parse(toks)
      assert(arcs.length == toks.length)
      arcs.zipWithIndex.foreach { case (a, i) =>
        // heads in range, never self
        assert(a.head >= -1 && a.head < toks.length && a.head != i)
      }
      // the head function is ACYCLIC: following heads from any token
      // terminates at a root within n steps (a cycle would hang the
      // path BFS's intuition and corrupt features)
      arcs.indices.foreach { start =>
        var cur = start
        var steps = 0
        while (cur != -1 && steps <= toks.length) {
          cur = arcs(cur).head
          steps += 1
        }
        assert(cur == -1, s"cycle reached from $start in ${toks.map(_.pos)}")
      }
      // determinism: same tokens, same arcs
      assert(DepLite.parse(toks).toSeq == arcs.toSeq)
      // path features never throw on any span pair
      if (toks.length >= 2) {
        val fs = DepLite.pathFeatures(toks, arcs, 0, 1,
          toks.length - 1, toks.length)
        fs.foreach(f => assert(f.startsWith("dep_")))
      }
    }
  }
}
