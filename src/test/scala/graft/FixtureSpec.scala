package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import graft.corpus.DocGen
import graft.pipeline.Extract
import graft.schema.OutSpan
import scala.jdk.CollectionConverters._

/** Frozen golden fixtures (src/test/resources/golden/, FIXTURES.md §3):
  * the pipeline must reproduce these checked-in span sequences exactly.
  * Unlike the live golden compare, a generator change CANNOT silently
  * rewrite these — regenerating them (graft.tools.FixtureDump) is a
  * deliberate, reviewable act. */
class FixtureSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def load(id: String): Vector[OutSpan] = {
    val in = getClass.getResourceAsStream(s"/golden/$id.json")
    assert(in != null, s"missing fixture $id")
    val tree = mapper.readTree(in)
    tree.elements().asScala.map { n =>
      OutSpan(n.get("kind").asText(), n.get("text").asText(),
        n.get("media_ref").asText(), n.get("order").asInt())
    }.toVector
  }

  test("pipeline reproduces the frozen golden fixtures") {
    graft.tools.FixtureDump.fixtureIds.foreach { id =>
      val got = Extract.extractDoc(DocGen.docRow(id)).spans
      assert(got == load(id), s"frozen-fixture mismatch for $id")
    }
  }
}
