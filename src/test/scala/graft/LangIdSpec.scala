package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LangId

class LangIdSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def predict(texts: String*): Seq[(String, Long)] =
    LangId.report(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text"), "id", col("text"))
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
    val df = LangId.report(
      Seq((1L, "some text here")).toDF("doc_id", "text"), "doc_id", col("text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
    // the scorer must appear exactly ONCE: its 12 consumers bind to
    // one attribute, not 12 inlined copies (the CollapseProject guard)
    assert("langscores".r.findAllIn(plan.toLowerCase).size <= 2, plan.take(800))
  }

  test("native scorer equals the HOF reference form") {
    import graft.plans.LangScoresExpr
    val texts = Seq(
      "the weather was cold and the children stayed at home",
      "ayer hacía mucho frío y los niños se quedaron en casa",
      "", "ok", "zzzz qqqq wwww 1234 !!!")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val native = df.select(col("id"), LangScoresExpr.scores(col("text")).as("a"))
      .orderBy("id").collect()
      .map(r => r.getSeq[Double](1))
    val grams = LangId.gramsCol(col("text"))
    val hof = df.select(col("id") +:
        (org.apache.spark.sql.functions.size(grams).cast("double") +:
          LangId.langs.map(l => LangId.scoreCol(grams, l))): _*)
      .orderBy("id").collect()
      .map(r => (1 until r.length).map(r.getDouble))
    native.zip(hof).zipWithIndex.foreach { case ((n, h), i) =>
      assert(n === h, s"row $i")
    }
  }
}
