package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.DocGen
import graft.kernel.{DocModel, StubModel}
import graft.pipeline.Extract
import graft.schema.{DocRow, PageModel}

/** The kernel hook (DocModel — the reference's CustomBaseModel replacement
  * point, rapid_doc/model/custom/__init__.py:4-10): any model honoring the
  * contract drops into the same mapPartitions scope. Here a "well-behaved"
  * wrapper (a VL-style model that emits detections in reading order rather
  * than scrambled) must produce the identical extraction — the pipeline is
  * emission-order-independent by construction. */
class CustomModelSpec extends AnyFunSuite {

  private object OrderedModel extends DocModel {
    override def analyze(doc: DocRow): Seq[PageModel] =
      StubModel.analyze(doc).map { pm =>
        pm.copy(dets = pm.dets.sortBy(d => (d.y0, d.x0, d.x1, d.score, d.text)))
      }
  }

  test("a custom model behind the same trait extracts golden-exact") {
    (0 until 50).map(i => f"doc-$i%012d").foreach { id =>
      val doc = DocGen.docRow(id)
      val viaCustom = Extract.extractDoc(doc, OrderedModel)
      assert(viaCustom.spans == DocGen.golden(id).spans, s"custom model on $id")
      assert(viaCustom == Extract.extractDoc(doc, StubModel),
        s"emission order must not matter on $id")
    }
  }
}
