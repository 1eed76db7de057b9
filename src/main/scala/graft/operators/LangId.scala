package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-n-gram language identification with confidence — the
  * robust successor to [[TextAnalysis.langId]]'s 4-language stopword
  * heuristic (reference README.md:38 categorical signals; harness
  * north-star text-analysis family). The public-practice construction
  * (CLD/fastText-class, reimplementable without external models):
  * score a document against per-language character-TRIGRAM profiles
  * with naive-Bayes log-probabilities, pick the argmax, and emit a
  * per-gram confidence margin with an `und` (undetermined) floor for
  * short or out-of-model text — the two failure modes a downstream
  * per-language threshold table (GopherRepetition.langAdjust) or a
  * DSIR language target must not silently mis-key on.
  *
  * Profiles are built AT CLASS LOAD from small embedded seed texts
  * (authored running prose per language — function words carry the
  * signal; Cavnar–Trenkle 1994 and every CLD descendant rest on
  * exactly this property): lowercase, collapse non-letters to `_`,
  * count trigrams, keep the top [[topK]], convert to add-one-smoothed
  * log10 probabilities; unseen grams cost the language its smoothing
  * floor. Nine languages including the two classic CLOSE PAIRS
  * (es/pt, no/da) that a stopword heuristic cannot separate.
  *
  * Scale shape: a PURE PROJECTION — per doc, one bounded trigram
  * array (first [[headChars]] chars; LID saturates long before that,
  * standard practice) folded against 9 broadcast map literals
  * (Catalyst `GetMapValue` probes inside codegen). No shuffle, no
  * join, no UDF; the oracle SQL is GENERATED from the same profile
  * maps, folds in the same left-to-right IEEE order, and quantizes
  * the only accumulated float (the margin) by flooring — the repo's
  * oracle-parity discipline.
  */
object LangId {

  /** Trigram profile size per language. */
  val topK = 300

  /** Leading chars scored (LID saturates; bounds per-doc work). */
  val headChars = 256

  /** Fewer grams than this → `und` (too short to call). */
  val minGrams = 8

  /** Per-gram best-vs-second margin below this → `und`. */
  val confFloor = 0.015

  /** Embedded seed prose (authored; function-word-dense running text —
    * the public Cavnar–Trenkle recipe needs only this much signal). */
  val seeds: Seq[(String, String)] = Seq(
    "en" -> ("the quick brown dog runs through the streets of the old town " +
      "where the people are waiting for the morning train that comes from " +
      "the north with many travellers who want to see the sea and the " +
      "mountains because they have heard that this is the most beautiful " +
      "place in the whole country and that the food there is very good " +
      "also the children play in the square when the sun is shining and " +
      "the shops are open for everyone who comes here in the summer"),
    "es" -> ("el perro corre por las calles de la ciudad vieja donde la " +
      "gente espera el tren de la mañana que viene del norte con muchos " +
      "viajeros que quieren ver el mar y las montañas porque han oído que " +
      "este es el lugar más hermoso de todo el país y que la comida allí " +
      "es muy buena también los niños juegan en la plaza cuando el sol " +
      "brilla y las tiendas están abiertas para todos los que llegan aquí " +
      "en el verano"),
    "pt" -> ("o cão corre pelas ruas da cidade velha onde as pessoas " +
      "esperam o comboio da manhã que vem do norte com muitos viajantes " +
      "que querem ver o mar e as montanhas porque ouviram que este é o " +
      "lugar mais bonito de todo o país e que a comida lá é muito boa " +
      "também as crianças brincam na praça quando o sol brilha e as lojas " +
      "estão abertas para todos os que chegam aqui no verão"),
    "fr" -> ("le chien court dans les rues de la vieille ville où les gens " +
      "attendent le train du matin qui vient du nord avec beaucoup de " +
      "voyageurs qui veulent voir la mer et les montagnes parce qu'ils " +
      "ont entendu dire que c'est le plus bel endroit de tout le pays et " +
      "que la nourriture y est très bonne aussi les enfants jouent sur la " +
      "place quand le soleil brille et les magasins sont ouverts pour " +
      "tous ceux qui viennent ici en été"),
    "de" -> ("der hund läuft durch die straßen der alten stadt wo die " +
      "leute auf den morgenzug warten der aus dem norden kommt mit vielen " +
      "reisenden die das meer und die berge sehen wollen weil sie gehört " +
      "haben dass dies der schönste ort im ganzen land ist und dass das " +
      "essen dort sehr gut ist auch die kinder spielen auf dem platz wenn " +
      "die sonne scheint und die geschäfte für alle offen sind die im " +
      "sommer hierher kommen"),
    "it" -> ("il cane corre per le strade della città vecchia dove la " +
      "gente aspetta il treno del mattino che viene dal nord con molti " +
      "viaggiatori che vogliono vedere il mare e le montagne perché hanno " +
      "sentito che questo è il posto più bello di tutto il paese e che il " +
      "cibo lì è molto buono anche i bambini giocano in piazza quando il " +
      "sole splende e i negozi sono aperti per tutti quelli che arrivano " +
      "qui in estate"),
    "nl" -> ("de hond rent door de straten van de oude stad waar de " +
      "mensen wachten op de ochtendtrein die uit het noorden komt met " +
      "veel reizigers die de zee en de bergen willen zien omdat ze hebben " +
      "gehoord dat dit de mooiste plek van het hele land is en dat het " +
      "eten daar erg goed is ook de kinderen spelen op het plein als de " +
      "zon schijnt en de winkels open zijn voor iedereen die hier in de " +
      "zomer komt"),
    "no" -> ("hunden løper gjennom gatene i den gamle byen der folk " +
      "venter på morgentoget som kommer fra nord med mange reisende som " +
      "vil se havet og fjellene fordi de har hørt at dette er det " +
      "vakreste stedet i hele landet og at maten der er veldig god også " +
      "barna leker på plassen når solen skinner og butikkene er åpne for " +
      "alle som kommer hit om sommeren"),
    "da" -> ("hunden løber gennem gaderne i den gamle by hvor folk venter " +
      "på morgentoget som kommer fra nord med mange rejsende som vil se " +
      "havet og bjergene fordi de har hørt at dette er det smukkeste sted " +
      "i hele landet og at maden der er meget god også børnene leger på " +
      "pladsen når solen skinner og butikkerne er åbne for alle som " +
      "kommer hertil om sommeren"))

  /** Languages in scoring order (ties resolve to the earlier one). */
  val langs: Seq[String] = seeds.map(_._1)

  /** JVM-side normalize, used ONLY to build profiles from the seed
    * constants (the doc side normalizes with Column ops — [[normCol]]
    * — whose SQL replay is generated alongside). */
  private def normalizeJvm(s: String): String =
    "_" + s.toLowerCase.replaceAll("[^\\p{L}]+", "_") + "_"

  private def trigramsJvm(s: String): Seq[String] = {
    val n = normalizeJvm(s)
    (0 to n.length - 3).map(i => n.substring(i, i + 3))
  }

  /** (language, trigram→log10 prob, OOV floor), from the seeds. */
  val profiles: Seq[(String, Map[String, Double], Double)] =
    seeds.map { case (l, seed) =>
      val counts = trigramsJvm(seed).groupBy(identity).map {
        case (g, occ) => g -> occ.size
      }
      val top = counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(topK)
      val total = top.map(_._2).sum
      val probs = top.map { case (g, c) =>
        g -> math.log10((c + 1.0) / (total + topK))
      }.toMap
      (l, probs, math.log10(1.0 / (total + topK)))
    }

  /** Normalized head of a text column: first [[headChars]] chars,
    * lowercased, non-letter runs collapsed to `_`, `_`-padded. */
  def normCol(text: Column): Column =
    concat(lit("_"),
      regexp_replace(lower(substring(text, 1, headChars)),
        "[^\\p{L}]+", "_"),
      lit("_"))

  /** Trigram array of the normalized head (empty when too short —
    * guarded because Spark's sequence counts DOWN for hi < lo). */
  def gramsCol(text: Column): Column = {
    val n = normCol(text)
    when(length(n) >= 3,
      transform(sequence(lit(1), length(n) - 2),
        i => substr(n, i, lit(3))))
      .otherwise(array().cast("array<string>"))
  }

  /** Log10-prob score of a gram array for one profiled language —
    * the HOF reference form. NOT the hot path: `aggregate` +
    * `element_at` on a map literal stays outside codegen and the
    * interpreted map probe is a linear key scan (a measured bench
    * stall at 5k docs). Production scoring is the single-pass
    * [[graft.plans.LangScoresExpr]]; LangIdSpec pins the two forms
    * value-equal. */
  def scoreCol(grams: Column, lang: String): Column = {
    val (_, probs, floor) = profiles.find(_._1 == lang).get
    aggregate(grams, lit(0.0),
      (acc, g) => acc + coalesce(element_at(typedLit(probs), g), lit(floor)))
  }

  /** Decision columns over a bound `[n_grams, s_1..s_9]` scores-array
    * attribute ([[graft.plans.LangScoresExpr]]'s output): `n_grams`,
    * the winning language (`und` when short or low-margin), and the
    * floored micro-unit per-gram margin (best minus second-best score
    * over gram count — the confidence the `und` rule thresholds on). */
  def reportColumns(arr: Column): Seq[Column] = {
    val n = element_at(arr, 1)
    val scores = langs.indices.map(i => element_at(arr, i + 2))
    val sorted = array_sort(array(scores: _*))
    val best = element_at(sorted, -1)
    val second = element_at(sorted, -2)
    val margin = when(n > 0, (best - second) / n).otherwise(lit(0.0))
    val arg = langs.zip(scores)
      .foldLeft(when(lit(false), "und")) { case (acc, (l, s)) =>
        acc.when(s === best, l)
      }.otherwise("und")
    val pred = when(n < minGrams || margin < confFloor, "und").otherwise(arg)
    Seq(n.cast("long").as("n_grams"), pred.as("lang_pred"),
      floor(margin * 1e6).cast("long").as("margin_micro"))
  }

  /** Per-doc LID report: one native scorer pass, then the decision
    * columns. Two Projects ON PURPOSE — the scores array binds to an
    * attribute so its 12 consumers share ONE evaluation (CollapseProject
    * keeps multi-referenced non-trivial expressions un-inlined). */
  def report(df: DataFrame, idCol: String, text: Column): DataFrame =
    df.select(col(idCol),
        graft.plans.LangScoresExpr.scores(text).as("_ls"))
      .select(col(idCol) +: reportColumns(col("_ls")): _*)

  // ---- generated DuckDB replay ---------------------------------------

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** SQL for the normalized head of `textExpr` (same steps as
    * [[normCol]]; DuckDB regexp_replace needs the explicit 'g'). */
  def normSql(textExpr: String): String =
    s"'_' || regexp_replace(lower(substr($textExpr, 1, $headChars)), " +
      s"'[^\\p{L}]+', '_', 'g') || '_'"

  /** The profile table as a VALUES relation: one row per gram in the
    * UNION of the nine profiles' key sets, one DOUBLE column per
    * language (NULL where the language's profile lacks the gram —
    * coalesced to that language's floor at use site). Join-shaped so
    * DuckDB probes a hash table per gram instead of rebuilding a map
    * literal per lambda evaluation (the naive map-in-lambda form
    * measured minutes at 5k docs). */
  private def profileValuesSql: String = {
    val allGrams = profiles.flatMap(_._2.keys).distinct.sorted
    val rows = allGrams.map { g =>
      val vals = profiles.map { case (_, probs, _) =>
        probs.get(g).map(_.toString).getOrElse("NULL")
      }.mkString(", ")
      s"(${sqlStr(g)}, $vals)"
    }.mkString(",\n    ")
    val castCols = langs.map(l => s"CAST(p_$l AS DOUBLE) AS p_$l")
      .mkString(", ")
    val vcols = langs.map(l => s"p_$l").mkString(", ")
    s"""SELECT gram, $castCols
       |  FROM (VALUES
       |    $rows) v(gram, $vcols)""".stripMargin
  }

  /** Full oracle projection over CTE alias `src(idCol, textCol)` —
    * replays the normalized-head grams, the nine profile folds (via
    * an ordinality-keyed LEFT JOIN against the generated profile
    * table, re-folded in the SAME left-to-right IEEE order the engine
    * uses), the sort-based margin, the argmax CASE in declaration
    * order, and the und rule. */
  def oracleSql(src: String, idCol: String, textCol: String): String = {
    val floors = profiles.map { case (l, _, fl) => l -> fl }.toMap
    val contribCols = langs.map { l =>
      s"COALESCE(p.p_$l, ${floors(l)}::DOUBLE) AS c_$l"
    }.mkString(",\n         ")
    val foldCols = langs.map { l =>
      s"list_reduce(list_concat([0.0]::DOUBLE[], " +
        s"list(c_$l ORDER BY ord)), (a, b) -> a + b) AS s_$l"
    }.mkString(",\n         ")
    val arr = langs.map(l => s"s_$l").mkString(", ")
    val argCase = langs.map(l => s"WHEN s_$l = _best THEN '$l'")
      .mkString(" ")
    s"""WITH _prof AS (
       |${profileValuesSql}),
       |_n AS (
       |  SELECT $idCol, ${normSql(textCol)} AS nt FROM $src),
       |_g AS (
       |  SELECT $idCol,
       |         CASE WHEN length(nt) >= 3
       |              THEN list_transform(range(1, length(nt) - 1),
       |                     i -> substr(nt, i::INT, 3))
       |              ELSE []::VARCHAR[] END AS grams
       |  FROM _n),
       |_u AS (SELECT $idCol, len(grams) AS ng FROM _g),
       |_r AS (
       |  SELECT $idCol, ord, grams[ord::INT] AS gram
       |  FROM _g, UNNEST(range(1, len(grams) + 1)) AS t(ord)),
       |_j AS (
       |  SELECT _r.$idCol, _r.ord,
       |         $contribCols
       |  FROM _r LEFT JOIN _prof p USING (gram)),
       |_s AS (
       |  SELECT $idCol,
       |         $foldCols
       |  FROM _j GROUP BY $idCol),
       |_m AS (
       |  SELECT u.$idCol, u.ng, $arr,
       |         list_sort([$arr])[-1] AS _best,
       |         CASE WHEN u.ng > 0
       |              THEN (list_sort([$arr])[-1] - list_sort([$arr])[-2]) / u.ng
       |              ELSE 0.0::DOUBLE END AS _margin
       |  FROM _u u LEFT JOIN _s s USING ($idCol))
       |SELECT $idCol, CAST(ng AS BIGINT) AS n_grams,
       |       CASE WHEN ng < $minGrams OR _margin < $confFloor THEN 'und'
       |            $argCase ELSE 'und' END AS lang_pred,
       |       CAST(floor(_margin * 1000000.0) AS BIGINT) AS margin_micro
       |FROM _m""".stripMargin
  }
}
