package graft.stencil

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Stencil fidelity tests.
  *
  * Golden files (src/test/resources/stencil_d*_mh*.txt) hold the exact
  * (point, halvings) sequence produced by the reference generator
  * (/root/reference/dask_patternsearch/stencil.py:129-200), dumped during the
  * survey. The BFS emission order is load-bearing (search.py:254,261,286), so
  * we compare the full sequence, not just the set.
  */
class StencilSpec extends AnyFunSuite {

  private def golden(name: String): Vector[(Array[Double], Int)] = {
    val url = getClass.getResource(s"/$name")
    assert(url != null, s"missing golden resource $name")
    val src = Source.fromURL(url)
    try src.getLines().map { line =>
      val Array(coords, h) = line.split(";")
      (coords.trim.split(" ").map(_.toDouble), h.trim.toInt)
    }.toVector
    finally src.close()
  }

  private def check(dims: Int, mh: Int, file: String): Unit = {
    val want = golden(file)
    val got = new RightHandedSimplexStencil(dims, mh).stencilPoints.take(want.size).toVector
    assert(got.size == want.size, s"length mismatch: got ${got.size}, want ${want.size}")
    got.zip(want).zipWithIndex.foreach { case ((g, (wp, wh)), i) =>
      assert(g.halvings == wh, s"step $i halvings: got ${g.halvings}, want $wh")
      assert(g.offset.sameElements(wp),
        s"step $i point: got ${g.offset.mkString(",")}, want ${wp.mkString(",")}")
    }
  }

  test("d=1 mh=7 matches reference exactly (300 steps)") { check(1, 7, "stencil_d1_mh7.txt") }
  test("d=2 mh=7 matches reference exactly (500 steps)") { check(2, 7, "stencil_d2_mh7.txt") }
  test("d=3 mh=7 matches reference exactly (500 steps)") { check(3, 7, "stencil_d3_mh7.txt") }
  test("d=2 mh=14 matches reference exactly (400 steps)") { check(2, 14, "stencil_d2_mh14.txt") }
  test("d=4 mh=7 matches reference exactly (400 steps)") { check(4, 7, "stencil_d4_mh7.txt") }

  test("first 2d steps are the unit axial steps +-e_i with halvings 0") {
    for (d <- 1 to 8) {
      val steps = new RightHandedSimplexStencil(d, 7).stencilPoints.take(2 * d).toVector
      assert(steps.forall(_.halvings == 0))
      val expected =
        (0 until d).map(i => Array.tabulate(d)(c => if (c == i) 1.0 else 0.0)) ++
          (0 until d).map(i => Array.tabulate(d)(c => if (c == i) -1.0 else 0.0))
      steps.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g.offset.sameElements(e), s"d=$d step $i: ${g.offset.mkString(",")}")
      }
    }
  }

  test("first 2000 steps are spatially unique (d=2, d=3)") {
    for (d <- Seq(2, 3)) {
      val pts = new RightHandedSimplexStencil(d, 30).stencilPoints.take(2000)
        .map(_.offset.toVector).toVector
      assert(pts.distinct.size == pts.size, s"d=$d produced spatial duplicates")
    }
  }

  test("toGrid is idempotent and folds -0.0") {
    val st = new RightHandedSimplexStencil(2, 7)
    for (x <- Seq(0.3, -0.3, 1e-9, -1e-9, 17.123, -0.001953125)) {
      val g = st.toGrid(x)
      assert(st.toGrid(g) == g)
    }
    assert(java.lang.Double.doubleToRawLongBits(st.toGrid(-1e-9)) == 0L,
      "-0.0 must be normalized to +0.0")
  }

  test("replay cache: a second iterator replays the same prefix") {
    val st = new RightHandedSimplexStencil(2, 7)
    val a = st.stencilPoints.take(100).map(s => (s.offset.toVector, s.halvings)).toVector
    val b = st.stencilPoints.take(200).map(s => (s.offset.toVector, s.halvings)).toVector
    assert(b.take(100) == a)
  }

  test("StencilDump emits the first-N points as CSV (S4 data half)") {
    val f = java.io.File.createTempFile("stencildump", ".csv")
    f.deleteOnExit()
    graft.tools.StencilDump.main(Array("2", "30", "120", f.getAbsolutePath))
    val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
    assert(lines.head == "idx,x0,x1,halvings")
    assert(lines.size == 121) // header + 120 points (the reference GIF's frame count)
    assert(lines(1) == "1,1.0,0.0,0") // first axial step, halvings 0
    // rows mirror the live stencil stream exactly
    val expect = new RightHandedSimplexStencil(2, 30).stencilPoints.take(120)
      .zipWithIndex
      .map { case (s, i) => s"${i + 1},${s.offset.mkString(",")},${s.halvings}" }
      .toVector
    assert(lines.tail == expect)
  }

  test("StencilSvg renders the reference GIF's frame as well-formed SVG (S4 render half)") {
    val svg = graft.tools.StencilSvg.render(120)
    // one circle per stencil point + the center dot, reference geometry
    assert(svg.sliding("<circle".length).count(_ == "<circle") == 121)
    assert(svg.contains("""<svg xmlns="http://www.w3.org/2000/svg" width="320""""))
    // center dot at offset (0.6w, 0.4w) = (192, 128), halvings-0 color (DB16 #8)
    assert(svg.contains("""<circle cx="192.0" cy="128.0" r="3.25" fill="#597dce"/>"""))
    // first axial step (1, 0): screen x = 1*320/12 + 192 = 218.67, y = 128
    assert(svg.contains("""cx="218.67" cy="128.00" r="3.25" fill="#597dce""""))
    // well-formed XML (would throw on mismatched tags/attrs)
    javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(svg.getBytes("UTF-8")))
  }
}
