package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LangId

class LangIdSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def predict(texts: String*): Seq[(String, Long)] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id") +: LangId.report(col("text")): _*)
      .orderBy("id")
      .select(col("lang_pred"), col("margin_micro"))
      .as[(String, Long)].collect().toSeq

  test("clear-signal sentences resolve to their language") {
    // held-out sentences (none appear in the seeds)
    val got = predict(
      "the weather was cold yesterday and we decided to stay at home " +
        "with a book about the history of this small village",
      "ayer hacía mucho frío y decidimos quedarnos en casa con un " +
        "libro sobre la historia de este pequeño pueblo",
      "hier il faisait très froid et nous avons décidé de rester à la " +
        "maison avec un livre sur l'histoire de ce petit village",
      "gestern war es sehr kalt und wir haben beschlossen zu hause zu " +
        "bleiben mit einem buch über die geschichte dieses kleinen dorfes",
      "ieri faceva molto freddo e abbiamo deciso di restare a casa con " +
        "un libro sulla storia di questo piccolo paese")
    assert(got.map(_._1) === Seq("en", "es", "fr", "de", "it"))
    got.foreach { case (_, m) => assert(m > 0) }
  }

  test("close pairs: es vs pt and no vs da separate") {
    val got = predict(
      // es: ñ, 'y', 'los', 'cuando'
      "los hermanos estaban cansados cuando llegaron a la montaña y " +
        "el niño pequeño empezó a cantar una canción muy bonita",
      // pt: ão/ç/lh, 'os', 'quando', 'não'
      "os irmãos estavam cansados quando chegaram à montanha e o " +
        "menino pequeno começou a cantar uma canção muito bonita não é",
      // no: 'ikke', 'gjennom', 'også', -ene
      "vi gikk ikke gjennom skogen i dag fordi veien var stengt og " +
        "barna ville også være hjemme hos bestemoren sin hele dagen",
      // da: 'ikke', 'gennem', 'også', -erne
      "vi gik ikke gennem skoven i dag fordi vejen var lukket og " +
        "børnene ville også være hjemme hos deres bedstemor hele dagen")
    assert(got.map(_._1) === Seq("es", "pt", "no", "da"))
  }

  test("short and out-of-model text falls to und, never a wrong call") {
    val got = predict(
      "ok", // far below minGrams
      "la la", // short AND ambiguous
      "zzzz qqqq xxxx wwww zzzz qqqq xxxx wwww zzzz qqqq xxxx wwww") // OOV junk
    assert(got.map(_._1) === Seq("und", "und", "und"))
  }

  test("profiles carry topK-bounded maps and the generated SQL matches") {
    LangId.profiles.foreach { case (l, m, floor) =>
      assert(m.size <= LangId.topK, l)
      assert(m.values.forall(v => v < 0 && v > -5), l)
      assert(floor < 0, l)
    }
    val sql = LangId.oracleSql("documents", "doc_id", "text")
    // one profile fold per language, generated from the same maps
    LangId.langs.foreach(l => assert(sql.contains(s"AS s_$l")))
    assert(sql.contains(LangId.confFloor.toString))
    // margin crosses the gate floored to micro-units only
    assert(sql.contains("floor(_margin * 1000000.0)"))
  }

  test("report is a pure projection (no shuffle in the plan)") {
    val df = Seq((1L, "some text here")).toDF("doc_id", "text")
      .select(col("doc_id") +: LangId.report(col("text")): _*)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }
}
