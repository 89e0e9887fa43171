package graft.pipeline

import graft.schema._
import graft.geom.Geo
import graft.order.XYCut
import scala.collection.mutable

/** Page-level processing: the geometric cleanup + tie-up + reading-order
  * stages of SURVEY.md §2.2-2.5, as one pure function per page row. All
  * decisions are geometry/score-based and independent of the kernel's
  * (scrambled) emission order. */
object PageOps {

  private val LowConf = 0.05          // pipeline_magic_model.py:72-82
  private val IouDedup = 0.9          // pipeline_magic_model.py:84-110
  private val PageNumMaxW = 60.0
  private val PageNumMaxH = 20.0
  private val BottomFenceFrac = 0.93  // block_pre_proc.py:79-97 analogue
  private val LineGapMax = 6.0        // max inter-line gap inside a block

  private val attachCats = Set(Kinds.Caption, Kinds.Footnote)
  // precompiled: .matches() recompiles its pattern on every call, which was
  // a top-10 allocation site at fleet throughput
  private val NumberedLine = java.util.regex.Pattern.compile("^\\d+[.)].*")

  /** OCR rec-confidence floor (ocr_utils.py:374-375): garbled recognition
    * results land below it; real text lines stay above on both routes. */
  private val RecMinConf = 0.3

  /** Attachment distance rejection bound: an attachment farther than this
    * from every subject is an orphan and keeps its own place in the reading
    * order (the reference rejects pairs at >= 3x the nearest distance,
    * magic_model_utils.py:30-169; the renderer guarantees real attachments
    * sit within 26px of their body). Shared with the kernel's order-safety
    * simulation, which must model attachability identically. */
  val MaxAttachDist = 30.0

  def process(pm: PageModel): Vector[OrderedBlock] = {
    // 1. low-confidence filter + OCR rec-confidence filter on text
    val conf = pm.dets.filter(d =>
      d.score > LowConf && !(d.cat == Kinds.Text && d.score < RecMinConf)).toVector

    // 2. high-IoU dedup: drop a det when a strictly better overlapping det
    //    exists (ties impossible by construction; tiebreak on geometry+text
    //    keeps this deterministic regardless of emission order)
    def lexLess(a: Det, b: Det): Boolean =
      if (a.x0 != b.x0) a.x0 < b.x0
      else if (a.y0 != b.y0) a.y0 < b.y0
      else a.text < b.text
    val deduped = conf.filter { d =>
      !conf.exists { o =>
        (o ne d) && Geo.iou(d.x0, d.y0, d.x1, d.y1, o.x0, o.y0, o.x1, o.y1) > IouDedup &&
          (o.score > d.score || (o.score == d.score && lexLess(o, d)))
      }
    }

    // 3. drop model-abandoned regions (headers/footers -> Abandon)
    val live = deduped.filter(_.cat != Kinds.Abandon)

    // 4. page-number fence: a small isolated box in the bottom margin is
    //    boilerplate even when the model mislabeled it as text
    val kept = live.filter { d =>
      val smallBottom = d.w <= PageNumMaxW && d.h <= PageNumMaxH &&
        d.y0 > BottomFenceFrac * pm.height
      val isolated = !live.exists(o =>
        (o ne d) && Geo.interLen(o.y0, o.y1, d.y0, d.y1) > 0)
      !(smallBottom && isolated)
    }

    // 4.5 line merge: consecutive text-line detections sharing the same
    //     column extent merge into paragraph blocks (the reference's
    //     span->line->block build, span_block_fix.py:9-47,126; hyphen rule
    //     pipeline_middle_json_mkcontent.py:11-21)
    val (textLines, nonText) = kept.partition(_.cat == Kinds.Text)
    val mergedText = {
      val sorted = textLines.sortWith((a, b) =>
        a.x0 < b.x0 || (a.x0 == b.x0 && (a.x1 < b.x1 ||
          (a.x1 == b.x1 && a.y0 < b.y0))))
      val out = Vector.newBuilder[Det]
      var cur: Det = null
      sorted.foreach { d =>
        if (cur == null) cur = d
        else if (d.x0 == cur.x0 && d.x1 == cur.x1 &&
            d.y0 >= cur.y1 && d.y0 - cur.y1 <= LineGapMax) {
          val joined =
            if (cur.text.endsWith("-")) cur.text.dropRight(1) + d.text
            else cur.text + " " + d.text
          cur = cur.copy(text = joined, y1 = d.y1, score = math.max(cur.score, d.score))
        } else { out += cur; cur = d }
      }
      if (cur != null) out += cur
      out.result()
    }
    // 4.5b vertical line merge: columns sharing the exact vertical extent,
    //      horizontally adjacent, join RIGHT-to-LEFT (CJK vertical text,
    //      span_block_fix.py:160-236 vertical variants)
    val mergedVert = {
      val sorted = mergedText.sortWith((a, b) =>
        a.y0 < b.y0 || (a.y0 == b.y0 && (a.y1 < b.y1 ||
          (a.y1 == b.y1 && a.x0 > b.x0))))
      val out = Vector.newBuilder[Det]
      var cur: Det = null
      sorted.foreach { d =>
        if (cur == null) cur = d
        else if (d.y0 == cur.y0 && d.y1 == cur.y1 &&
            d.x1 <= cur.x0 && cur.x0 - d.x1 <= LineGapMax) {
          cur = cur.copy(text = cur.text + " " + d.text,
            x0 = d.x0, score = math.max(cur.score, d.score))
        } else { out += cur; cur = d }
      }
      if (cur != null) out += cur
      out.result()
    }
    // 4.6 body-overlap union: figure/table boxes overlapping >=0.8 of the
    //     smaller box merge into their union, keeping the higher-score
    //     carrier's text/media (pipeline_magic_model.py:164-204)
    val unionedBodies = {
      val (bodyDets, others) = nonText.partition(d => Kinds.bodies(d.cat))
      val buf = mutable.ArrayBuffer.from(bodyDets.sortBy(d => (d.x0, d.y0, d.y1, -d.score)))
      var changed = true
      while (changed) {
        changed = false
        var i = 0
        while (i < buf.length && !changed) {
          var j = i + 1
          while (j < buf.length && !changed) {
            val a = buf(i); val b = buf(j)
            if (a.cat == b.cat &&
                Geo.overlapOverMin(a.x0, a.y0, a.x1, a.y1, b.x0, b.y0, b.x1, b.y1) >= 0.8) {
              val hi = if (a.score >= b.score) a else b
              buf(i) = hi.copy(
                x0 = math.min(a.x0, b.x0), y0 = math.min(a.y0, b.y0),
                x1 = math.max(a.x1, b.x1), y1 = math.max(a.y1, b.y1))
              buf.remove(j)
              changed = true
            }
            j += 1
          }
          i += 1
        }
      }
      buf.toVector ++ others
    }
    // 4.7 span scope filter: a text block mostly contained in a figure/table
    //     body is a model misfire (chart labels, cell text) — the body
    //     carries its own content (span_pre_proc.py remove_outside_spans /
    //     remove_overlaps_min_spans:90-125)
    val scopedText = mergedVert.filter { t =>
      val tArea = t.area
      tArea <= 0 || !unionedBodies.exists { b =>
        Kinds.bodies(b.cat) && {
          val inter = Geo.interLen(t.x0, t.x1, b.x0, b.x1) *
            Geo.interLen(t.y0, t.y1, b.y0, b.y1)
          inter / tArea >= 0.8
        }
      }
    }
    val blocks = scopedText ++ unionedBodies

    // 5. tie-up: captions/footnotes attach to the nearest figure/table body,
    //    formula numbers to the nearest formula (greedy by edge distance —
    //    magic_model_utils.py:30-169 tie_up_category_by_distance_v3)
    // All assignment bookkeeping is by index into `blocks` — keying by Det
    // value would silently collapse byte-identical detections (same
    // cat/box/score/text) into one map entry and drop an attachment.
    val attachIdx = blocks.indices.toVector.filter(i => attachCats(blocks(i).cat))
    val numberIdx = blocks.indices.toVector.filter(i => blocks(i).cat == Kinds.FormulaNumber)
    val bodyIdx = blocks.indices.toVector.filter(i => Kinds.bodies(blocks(i).cat))
    val formulaIdx = blocks.indices.toVector.filter(i => blocks(i).cat == Kinds.Formula)

    def greedyAssign(objs: Vector[Int], subjects: Vector[Int]): Map[Int, Int] = {
      if (objs.isEmpty || subjects.isEmpty) return Map.empty
      val pairs = for (oi <- objs; si <- subjects) yield {
        val o = blocks(oi); val s = blocks(si)
        (Geo.edgeDist(o.x0, o.y0, o.x1, o.y1, s.x0, s.y0, s.x1, s.y1), oi, si)
      }
      val sorted = pairs.filter(_._1 <= MaxAttachDist)
        .sortBy { case (dist, oi, si) =>
          val o = blocks(oi); val s = blocks(si)
          (dist, o.y0, o.x0, s.y0, s.x0, oi, si)
        }
      val assigned = mutable.Map.empty[Int, Int]
      sorted.foreach { case (_, oi, si) =>
        if (!assigned.contains(oi)) assigned(oi) = si
      }
      assigned.toMap
    }

    val attachTo = greedyAssign(attachIdx, bodyIdx) ++ greedyAssign(numberIdx, formulaIdx)

    // 6. reading order over the anchor blocks (XY-cut; orphan attachments
    //    degrade to ordinary blocks)
    val anchorsIdx = blocks.indices.toVector.filterNot(attachTo.contains) // includes orphans
    val order = XYCut.order(anchorsIdx.map { i =>
      val d = blocks(i); (d.x0, d.y0, d.x1, d.y1)
    })

    // 7. expand anchors with their attachments (top-to-bottom, then
    //    left-to-right within the group — group median placement degenerates
    //    to this for contiguous authoring indices, block_sort.py:276-292)
    val byAnchor = attachTo.toVector.groupBy(_._2).map { case (si, kv) =>
      si -> kv.map(_._1).sortBy(oi => (blocks(oi).y0, blocks(oi).x0, oi))
    }
    val expanded = order.flatMap { k =>
      val ai = anchorsIdx(k)
      (ai +: byAnchor.getOrElse(ai, Vector.empty)).map(blocks)
    }

    // 8. list re-classification on text blocks (para_split.py:73-270 rules,
    //    simplified: >=3 lines, >=80% bullet/numbered starts)
    expanded.zipWithIndex.map { case (d, idx) =>
      val kind =
        if (d.cat == Kinds.Text) {
          val lines = d.text.split("\n", -1)
          val listLike = lines.count(l =>
            l.startsWith("- ") || l.startsWith("• ") || NumberedLine.matcher(l).matches())
          val indexLike = lines.count(l =>
            l.contains(". . .") && l.nonEmpty && l.last.isDigit)
          if (lines.length >= 3 && indexLike * 5 >= lines.length * 4) Kinds.Index
          else if (lines.length >= 3 && listLike * 5 >= lines.length * 4) Kinds.ListK
          else Kinds.Text
        } else d.cat
      val level =
        if (kind == Kinds.Title) { if (d.h >= 30) 1 else 2 }
        else 0
      OrderedBlock(kind, d.text, d.media_ref, pm.page_idx, idx, level)
    }
  }
}
