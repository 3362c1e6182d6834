package graft.tools

import graft.stencil.RightHandedSimplexStencil

/** Data half of the reference's stencil visualization
  * (/root/reference/tools/stencilgif.py:51-108): dump the first N stencil
  * points with their halvings as CSV, ready for any plotting tool. The
  * reference renders circles whose size/color derive from `halvings` at
  * `point` — this emits exactly those inputs, closing the S4 gap without
  * image codecs (none are available in this environment, and the rendering
  * is tooling, not engine semantics).
  *
  * Usage: runMain graft.tools.StencilDump [dims] [maxHalvings] [n] [outFile]
  * Defaults mirror the reference GIF: dims=2, maxHalvings=30, n=120.
  * With no outFile the CSV goes to stdout.
  */
object StencilDump {
  def main(args: Array[String]): Unit = {
    val dims = if (args.length > 0) args(0).toInt else 2
    val maxHalvings = if (args.length > 1) args(1).toInt else 30
    val n = if (args.length > 2) args(2).toInt else 120
    val out: java.io.PrintStream =
      if (args.length > 3) new java.io.PrintStream(args(3), "UTF-8") else System.out

    val header = "idx," + (0 until dims).map(i => s"x$i").mkString(",") + ",halvings"
    out.println(header)
    new RightHandedSimplexStencil(dims, maxHalvings).stencilPoints
      .take(n)
      .zipWithIndex
      .foreach { case (step, i) =>
        out.println(s"${i + 1},${step.offset.mkString(",")},${step.halvings}")
      }
    if (out ne System.out) out.close()
  }
}
