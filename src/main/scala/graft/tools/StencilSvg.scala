package graft.tools

import graft.stencil.RightHandedSimplexStencil

/** Rendering half of the reference's stencil visualization — the companion
  * to [[StencilDump]]'s data half, closing SURVEY §2 S4 without image
  * codecs: an SVG is plain text, and SMIL `<animate>` reproduces the GIF's
  * one-point-per-frame reveal in any browser.
  *
  * Faithful to /root/reference/tools/stencilgif.py:
  *   - geometry (:55-59): rotate = (1, -1); offset = width/2 + rotate*width/10;
  *     screen point = rotate * point * width/12 + offset
  *   - grid (:64-86): the two axes through the offset at stroke 2, minor
  *     grid lines every width/scale at stroke 0.5, all in DB16 color 15
  *   - circles (:88-95): center dot r=3.25 in halving_colors(0); each
  *     stencil point r = max(0.5, 3.25 - 0.75*halvings), filled by the
  *     DB16 halvings->color map (:33-47); points appear in generation
  *     order at `fps` frames/sec (:100, fps=8)
  *
  * The DB16 palette is DawnBringer's public 16-colour palette, embedded at
  * stencilgif.py:13-30. Halvings outside the reference's color map (< -5 or
  * > 7) clamp to the nearest mapped key — the reference would KeyError
  * there; clamping keeps deep-contraction dumps renderable.
  *
  * Usage: runMain graft.tools.StencilSvg [n] [outFile] [width] [scale] [fps]
  * Defaults mirror the reference GIF: n=120, width=320, scale=11, fps=8.
  */
object StencilSvg {

  private val db16: IndexedSeq[String] = IndexedSeq(
    "#140c1c", "#442434", "#30346d", "#4e4a4e", "#854c30", "#346524",
    "#d04648", "#757161", "#597dce", "#d27d2c", "#8595a1", "#6daa2c",
    "#d2aa99", "#6dc2ca", "#dad45e", "#deeed6")

  /** stencilgif.py:33-47 — halvings -> DB16 index. */
  private def halvingColor(h: Int): String = {
    val idx = h match {
      case x if x <= -2 => 1
      case -1           => 6
      case 0            => 8
      case 1            => 11
      case 2            => 5
      case _            => 0 // 3..7 and clamped beyond
    }
    db16(idx)
  }

  def render(n: Int, width: Int = 320, scale: Int = 11, fps: Int = 8): String = {
    val w = width.toDouble
    val (ox, oy) = (w / 2 + w / 10, w / 2 - w / 10)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$width" viewBox="0 0 $width $width">\n"""
    sb ++= s"""<rect width="$width" height="$width" fill="#ffffff"/>\n"""

    val grid = db16(15)
    def line(x1: Double, y1: Double, x2: Double, y2: Double, sw: Double): Unit =
      sb ++= f"""<line x1="$x1%.2f" y1="$y1%.2f" x2="$x2%.2f" y2="$y2%.2f" stroke="$grid" stroke-width="$sw%.1f"/>%n"""
    line(ox, 0, ox, w, 2.0)
    line(0, oy, w, oy, 2.0)
    val step = w / scale
    var (gx, gy) = (ox + step, oy - step)
    while (gx <= w + 1) { line(gx, 0, gx, w, 0.5); line(0, gy, w, gy, 0.5); gx += step; gy -= step }
    gx = ox - step; gy = oy + step
    while (gx >= -1) { line(gx, 0, gx, w, 0.5); line(0, gy, w, gy, 0.5); gx -= step; gy += step }

    sb ++= s"""<circle cx="$ox" cy="$oy" r="3.25" fill="${halvingColor(0)}"/>\n"""
    new RightHandedSimplexStencil(2, 30).stencilPoints.take(n).zipWithIndex
      .foreach { case (p, i) =>
        val px = p.offset(0) * w / 12 + ox
        val py = -p.offset(1) * w / 12 + oy
        val r = math.max(0.5, 3.25 - 0.75 * p.halvings)
        val t = (i + 1).toDouble / fps
        sb ++= f"""<circle cx="$px%.2f" cy="$py%.2f" r="$r%.2f" fill="${halvingColor(p.halvings)}" opacity="0">""" +
          f"""<animate attributeName="opacity" to="1" begin="$t%.3fs" dur="0.001s" fill="freeze"/></circle>%n"""
      }
    sb ++= "</svg>\n"
    sb.result()
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 120
    val svg = render(
      n,
      width = if (args.length > 2) args(2).toInt else 320,
      scale = if (args.length > 3) args(3).toInt else 11,
      fps = if (args.length > 4) args(4).toInt else 8)
    if (args.length > 1) {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), svg)
      System.err.println(s"wrote ${args(1)}")
    } else print(svg)
  }
}
