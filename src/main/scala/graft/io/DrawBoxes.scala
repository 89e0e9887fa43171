package graft.io

import graft.schema.PageModel

/** draw_bbox debug post-form as SVG (the reference draws detection boxes
  * onto page rasters, utils/draw_bbox.py; this container ships no raster
  * libs, so the sink emits a standalone SVG per page — same information,
  * vector form). Deterministic category -> color mapping. */
object DrawBoxes {

  private val palette = Vector(
    "title" -> "#c0392b", "text" -> "#2c3e50", "figure" -> "#2980b9",
    "table" -> "#27ae60", "formula" -> "#8e44ad", "caption" -> "#d35400",
    "footnote" -> "#7f8c8d", "abandon" -> "#bdc3c7", "region" -> "#f1c40f")
  private val colorOf = palette.toMap

  def renderSvg(pm: PageModel): String = {
    val sb = new StringBuilder(4096)
    sb.append(s"""<svg xmlns="http://www.w3.org/2000/svg" width="${pm.width}" height="${pm.height}" viewBox="0 0 ${pm.width} ${pm.height}">""")
    sb.append(s"""<rect width="${pm.width}" height="${pm.height}" fill="white"/>""")
    (pm.regions ++ pm.dets).foreach { d =>
      val color = colorOf.getOrElse(d.cat, "#16a085")
      sb.append(
        s"""<rect x="${d.x0}" y="${d.y0}" width="${d.w}" height="${d.h}" """ +
          s"""fill="none" stroke="$color" stroke-width="1.5"/>""")
      sb.append(
        s"""<text x="${d.x0 + 2}" y="${d.y0 + 9}" font-size="8" fill="$color">${d.cat}</text>""")
    }
    sb.append("</svg>")
    sb.toString
  }
}
