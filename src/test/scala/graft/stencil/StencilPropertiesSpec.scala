package graft.stencil

import graft.search.{Objective, Search, SearchOptions, SerialClient}
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based checks over the pure driver math (FIXTURES.md §A). */
object StencilPropertiesSpec extends Properties("graft.stencil") {

  property("first 2d steps are +-e_i for any dims") =
    Prop.forAll(Gen.choose(1, 10)) { d =>
      val steps = new RightHandedSimplexStencil(d, 7).stencilPoints.take(2 * d).toVector
      steps.forall(_.halvings == 0) &&
        steps.zipWithIndex.forall { case (s, i) =>
          val dim = i % d
          val sign = if (i < d) 1.0 else -1.0
          s.offset(dim) == sign && s.offset.count(_ != 0.0) == 1
        }
    }

  property("toGrid is idempotent and snaps to grid multiples") = {
    val st = new RightHandedSimplexStencil(2, 9)
    Prop.forAll(Gen.choose(-1e6, 1e6)) { x =>
      val g = st.toGrid(x)
      val cells = g / st.gridsize
      st.toGrid(g) == g && cells == math.rint(cells)
    }
  }

  property("stencil prefixes are spatially unique") =
    Prop.forAll(Gen.choose(100, 1200), Gen.choose(1, 4)) { (n, d) =>
      val pts = new RightHandedSimplexStencil(d, 20).stencilPoints.take(n)
        .map(_.offset.toVector).toVector
      pts.distinct.size == pts.size
    }

  property("search respects maxHalvings and the global-best invariant") =
    Prop.forAll(Gen.choose(1L, 1000L)) { seed =>
      val res = Search.minimize(
        Objective(x => x.map(v => v * v).sum),
        Array(3.0, -2.0), Array(1.0, 1.0), new SerialClient,
        SearchOptions(stopratio = 0.05, seed = Some(seed)))
      val mh = Search.maxHalvingsFor(0.05)
      res.evaluations.forall(_.halvings <= mh) &&
        res.best.cost == res.evaluations.map(_.cost).min
    }

  property("every evaluated point lies on the evaluation lattice") =
    Prop.forAll(Gen.choose(1L, 1000L)) { seed =>
      val stepsize = 0.5
      val res = Search.minimize(
        Objective(x => x.map(v => math.abs(v)).sum),
        Array(4.0, 4.0), Array(stepsize, stepsize), new SerialClient,
        SearchOptions(stopratio = 0.01, seed = Some(seed)))
      val grid = stepsize / math.pow(2.0, Search.maxHalvingsFor(0.01))
      res.evaluations.forall(_.point.forall { v =>
        val cells = v / grid
        cells == math.rint(cells)
      })
    }
}
