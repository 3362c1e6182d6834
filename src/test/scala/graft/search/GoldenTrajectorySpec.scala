package graft.search

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** End-to-end driver-loop parity: with randomize=false on the serial
  * client the reference's search is fully deterministic, so the ENTIRE
  * evaluation sequence — every trial point in submission order, every cost,
  * and the returned best — must match the reference run for run.
  *
  * Golden files (src/test/resources/search_*.txt) were produced by running
  * /root/reference/dask_patternsearch/search.py itself (serial path,
  * toolz/distributed shims, np.bool alias patch) during this build. First
  * line is `# best: coords;cost`; each following line one evaluation in
  * results-dict insertion order.
  */
class GoldenTrajectorySpec extends AnyFunSuite {

  private val sphere = Objective(x => x.map(v => v * v).sum)
  private val sphereP1 = Objective(x => x.map(v => (v - 0.1) * (v - 0.1)).sum)

  private def golden(name: String): (Array[Double], Double, Vector[(Array[Double], Double)]) = {
    val url = getClass.getResource(s"/search_$name.txt")
    assert(url != null, s"missing golden resource search_$name.txt")
    val src = Source.fromURL(url)
    try {
      val lines = src.getLines().toVector
      val bestLine = lines.head.stripPrefix("# best: ")
      val Array(bc, bcost) = bestLine.split(";")
      val best = (bc.trim.split(" ").map(_.toDouble), bcost.trim.toDouble)
      val evals = lines.tail.map { line =>
        val Array(coords, cost) = line.split(";")
        (coords.trim.split(" ").map(_.toDouble), cost.trim.toDouble)
      }
      (best._1, best._2, evals)
    } finally src.close()
  }

  private def check(
      name: String,
      objective: Objective,
      x0: Array[Double],
      stepsize: Array[Double],
      opts: SearchOptions): Unit = {
    val (wantBest, wantBestCost, want) = golden(name)
    val res = Search.minimize(objective, x0, stepsize, new SerialClient, opts)
    assert(res.evaluations.size == want.size,
      s"$name: eval count ${res.evaluations.size} != reference ${want.size}")
    res.evaluations.zip(want).zipWithIndex.foreach { case (((got), (wp, wc)), i) =>
      assert(got.point.sameElements(wp),
        s"$name eval $i point: [${got.point.mkString(",")}] != [${wp.mkString(",")}]")
      assert(got.cost == wc, s"$name eval $i cost: ${got.cost} != $wc")
    }
    assert(res.best.point.sameElements(wantBest),
      s"$name best: [${res.best.point.mkString(",")}] != [${wantBest.mkString(",")}]")
    assert(res.best.cost == wantBestCost)
  }

  private val base = SearchOptions(randomize = false, stopratio = 1e-2)

  test("sphere 2-D trajectory matches the reference exactly (137 evals)") {
    check("sphere2d", sphere, Array(10.0, 15.0), Array(1.0, 1.0), base)
  }

  test("off-lattice sphereP1 trajectory matches (158 evals)") {
    check("spherep1", sphereP1, Array(10.0, 15.0), Array(1.0, 1.0), base)
  }

  test("sphere 4-D trajectory matches (407 evals)") {
    check("sphere4d", sphere, Array.fill(4)(10.0), Array.fill(4)(1.0), base)
  }

  test("tight stopratio=1e-3 trajectory matches (94 evals)") {
    check("sphere2d_tight", sphere, Array(3.0, -2.0), Array(1.0, 1.0),
      base.copy(stopratio = 1e-3))
  }

  test("integer-dimension trajectory matches (128 evals)") {
    check("intdim", sphere, Array(10.0, 15.0), Array(1.0, 1.0),
      base.copy(integerDimensions = Seq(0)))
  }

  test("batchsize=5 trajectory matches (190 evals)") {
    check("batch5", sphere, Array(10.0, 15.0), Array(1.0, 1.0),
      base.copy(batchsize = Some(5)))
  }

  test("minNewSubmit=4 trajectory matches (146 evals)") {
    check("minnew4", sphere, Array(10.0, 15.0), Array(1.0, 1.0),
      base.copy(minNewSubmit = 4))
  }

  test("maxStencilSize=4 trajectory matches (83 evals)") {
    check("maxstencil4", sphere, Array(10.0, 15.0), Array(1.0, 1.0),
      base.copy(maxStencilSize = 4))
  }
}
