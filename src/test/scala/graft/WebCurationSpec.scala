package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.WebCuration

class WebCurationSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("licenseOf classifies CC URLs, ARR text and unknowns; CC beats ARR") {
    val got = Seq(
      "see https://creativecommons.org/licenses/by/4.0/ here",
      "HTTPS://CREATIVECOMMONS.ORG/LICENSES/BY-NC-SA/3.0/deed",
      "https://creativecommons.org/publicdomain/zero/1.0/",
      "cc at https://creativecommons.org/licenses/by-sa/3.0/. All rights reserved.",
      "(C) 2024 — ALL RIGHTS RESERVED",
      "nothing declared here")
      .toDF("t").select(WebCuration.licenseOf(col("t"))).as[String].collect().toSeq
    assert(got === Seq("cc-by", "cc-by-nc-sa", "cc0", "cc-by-sa", "arr", "unknown"))
  }

  test("robotsDisallowAll honors group semantics and whole-site rules only") {
    val got = Seq(
      "User-agent: *\nDisallow: /",                       // denied
      "# c\nuser-agent: *\n disallow: / ",                // denied (case/space)
      "User-agent: badbot\nDisallow: /\n\nUser-agent: *\nDisallow: /private/", // allowed
      "User-agent: *\nDisallow:",                         // allowed (empty)
      "User-agent: *\nDisallow: /private/",               // allowed (path rule)
      "User-agent: *\nDisallow: /tmp/\nUser-agent: bad\nDisallow: /", // allowed
      "User-agent: a\nUser-agent: *\nDisallow: /x\nDisallow: /")      // denied (stacked UA lines share the group)
      .toDF("t").select(WebCuration.robotsDisallowAll(col("t"))).as[Boolean]
      .collect().toSeq
    assert(got === Seq(true, true, false, false, false, false, true))
  }

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(WebCuration.normalizeUrl(col("u")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("normalizeUrl canonicalizes case, www, default ports, slash") {
    assert(norm(
      "HTTPS://WWW.Example.COM:443/A/b/",
      "http://example.com:80/",
      "http://example.com:8080/x",
      "https://example.com") === Seq(
      "https://example.com/A/b", // path case preserved, host lowered
      "http://example.com",
      "http://example.com:8080/x",
      "https://example.com"))
  }

  test("normalizeUrl drops fragments and tracking params, sorts the rest") {
    assert(norm(
      "https://h.io/p?utm_source=x&b=2&a=1#frag",
      "https://h.io/p?gclid=1&fbclid=2&ref=tw&utm_campaign=c",
      "https://h.io/p?ref=tw&refresh=1") === Seq(
      "https://h.io/p?a=1&b=2",
      "https://h.io/p",
      // 'refresh' is NOT the tracking param 'ref' — boundary anchored
      "https://h.io/p?refresh=1"))
  }

  test("normalizeUrl yields NULL for non-URL-shaped input") {
    assert(norm("not a url", "", "ftp//broken") === Seq(null, null, null))
  }

  test("hostOf and domainOf extract host and PSL registrable domain") {
    val r = Seq("https://www.Docs.Site.example.org:8080/x?q=1")
      .toDF("u")
      .select(WebCuration.hostOf(col("u")).as("h"))
      .withColumn("d", WebCuration.domainOf(col("h")))
      .as[(String, String)].head()
    assert(r === ("docs.site.example.org", "example.org"))
    // single- and two-label hosts pass through domainOf unchanged
    val two = Seq(("localhost"), ("a.io")).toDF("h")
      .select(WebCuration.domainOf(col("h"))).as[String].collect().toSeq
    assert(two === Seq("localhost", "a.io"))
  }

  test("domainOf follows the public-suffix list, not last-two-labels") {
    def d(hosts: String*): Seq[String] =
      hosts.toDF("h").select(WebCuration.domainOf(col("h")))
        .as[String].collect().toSeq
    // ccTLD second-level registrations: one more label than the rule
    assert(d("a.b.co.uk", "shop.src1.com.au", "x.co.jp") ===
      Seq("b.co.uk", "src1.com.au", "x.co.jp"))
    // a host that IS a public suffix passes through
    assert(d("co.uk", "com.au", "github.io") ===
      Seq("co.uk", "com.au", "github.io"))
    // private-section hosters: every tenant is its own site
    assert(d("user.github.io", "deep.path.user.github.io", "blog.blogspot.com") ===
      Seq("user.github.io", "user.github.io", "blog.blogspot.com"))
    // 3-label rule
    assert(d("bucket.s3.amazonaws.com", "x.bucket.s3.amazonaws.com") ===
      Seq("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"))
    // wildcard *.ck: any direct child is a public suffix; the
    // exception !www.ck is registrable itself
    assert(d("a.b.ck", "x.ck", "www.ck", "sub.www.ck") ===
      Seq("a.b.ck", "x.ck", "www.ck", "www.ck"))
  }

  test("domainOf Spark and generated DuckDB SQL agree on fixtures") {
    // the oracle SQL is GENERATED from the same rule Seqs; this pins
    // the slicing/guard semantics of the two engines to each other
    // without DuckDB in the JVM: replay the documented clamp rules
    val hosts = Seq("a.b.co.uk", "co.uk", "localhost", "x.ck", "a.b.ck",
      "www.ck", "deep.x.s3.amazonaws.com", "foo.example.com",
      "example.com", "shop.src1.com.au", "user.github.io")
    val spark2 = d2(hosts)
    val expected = Seq("b.co.uk", "co.uk", "localhost", "x.ck", "a.b.ck",
      "www.ck", "x.s3.amazonaws.com", "example.com",
      "example.com", "src1.com.au", "user.github.io")
    assert(spark2 === expected)
  }

  private def d2(hosts: Seq[String]): Seq[String] = {
    import graft.operators.PublicSuffix
    hosts.toDF("h").select(PublicSuffix.registrableDomain(col("h")))
      .as[String].collect().toSeq
  }

  test("full PSL snapshot: previously-unlisted ccTLD 2LDs resolve") {
    // these ccTLD second-level registrations were OUTSIDE the old
    // hand-curated subset and fell to the default rule (folding every
    // site into the registry suffix); the bundled full list fixes the
    // whole class
    assert(d2(Seq("a.x.com.bt", "shop.co.zw", "b.com.bo", "x.co.ao",
        "www.shop.com.eg", "a.co.th", "b.com.ar", "c.co.il")) ===
      Seq("x.com.bt", "shop.co.zw", "b.com.bo", "x.co.ao",
        "shop.com.eg", "a.co.th", "b.com.ar", "c.co.il"))
  }

  test("full PSL snapshot: geo rules, deep rules, wildcard depths") {
    // 3-label ICANN geo rule (ide.kyoto.jp)
    assert(d2(Seq("foo.ide.kyoto.jp", "b.foo.ide.kyoto.jp")) ===
      Seq("foo.ide.kyoto.jp", "foo.ide.kyoto.jp"))
    // *.kawasaki.jp wildcard: every direct child is a public suffix;
    // the !city.kawasaki.jp exception is registrable itself
    assert(d2(Seq("x.kawasaki.jp", "a.x.kawasaki.jp",
        "city.kawasaki.jp", "www.city.kawasaki.jp")) ===
      Seq("x.kawasaki.jp", "a.x.kawasaki.jp",
        "city.kawasaki.jp", "city.kawasaki.jp"))
    // 5-label exact rule and 3-/4-label wildcard bases
    assert(d2(Seq(
        "bucket.s3.dualstack.ap-south-1.amazonaws.com",
        "s3.dualstack.ap-south-1.amazonaws.com",
        "b.vm.compute.amazonaws.com",
        "b.vm.compute.amazonaws.com.cn")) ===
      Seq("bucket.s3.dualstack.ap-south-1.amazonaws.com",
        "s3.dualstack.ap-south-1.amazonaws.com",
        "b.vm.compute.amazonaws.com",
        "b.vm.compute.amazonaws.com.cn"))
  }

  test("full PSL snapshot: IDN rules match unicode AND punycode hosts") {
    // 公司.cn is a listed rule; hosts arrive either as unicode or as
    // the xn-- form — both must resolve identically in shape
    assert(d2(Seq("foo.公司.cn", "foo.xn--55qx5d.cn")) ===
      Seq("foo.公司.cn", "foo.xn--55qx5d.cn"))
    assert(d2(Seq("a.foo.公司.cn", "a.foo.xn--55qx5d.cn")) ===
      Seq("foo.公司.cn", "foo.xn--55qx5d.cn"))
  }

  test("native domain expression equals the Column parity form") {
    // every fixture host this suite uses anywhere, plus edge shapes
    val hosts = Seq("a.b.co.uk", "co.uk", "localhost", "x.ck", "a.b.ck",
      "www.ck", "sub.www.ck", "deep.x.s3.amazonaws.com", "example.com",
      "a.x.com.bt", "shop.co.zw", "foo.ide.kyoto.jp", "b.foo.ide.kyoto.jp",
      "x.kawasaki.jp", "a.x.kawasaki.jp", "www.city.kawasaki.jp",
      "bucket.s3.dualstack.ap-south-1.amazonaws.com",
      "b.vm.compute.amazonaws.com.cn", "foo.公司.cn", "foo.xn--55qx5d.cn",
      "", "a", "a.", ".a", "..", "user.github.io")
    import graft.operators.PublicSuffix
    val both = hosts.toDF("h")
      .select(
        graft.plans.RegistrableDomainExpr.domain(col("h")).as("native"),
        PublicSuffix.registrableDomain(col("h")).as("column"))
      .as[(String, String)].collect().toSeq
    both.zip(hosts).foreach { case ((n, c), h) =>
      assert(n === c, s"host '$h'")
    }
  }

  test("full PSL snapshot: parsed rule-set sizes match the list") {
    import graft.operators.PublicSuffix
    val exact = PublicSuffix.exactByLen.map(_._2.size).sum
    val wild = PublicSuffix.wildcardByLen.map(_._2.size).sum
    val exc = PublicSuffix.exceptionsByLen.map(_._2.size).sum
    // ≥ the raw counts (IDN double forms add, 1-label rules subtract)
    assert(exact >= 7900, s"exact=$exact")
    assert(wild >= 107, s"wild=$wild")
    assert(exc >= 8, s"exc=$exc")
    assert(PublicSuffix.maxRuleLabels === 5)
    // the generated oracle SQL carries the same full list
    val sql = PublicSuffix.domainSqlSelect("t", "host")
    assert(sql.contains("'co.zw'") && sql.contains("'compute.amazonaws.com'")
      && sql.contains("'city.kawasaki.jp'"))
  }

  test("domainQuota keeps exactly quota rows per host, deterministically") {
    val df = (0L until 400L).toDF("id")
      .select(col("id"), concat(lit("h"), pmod(col("id"), lit(4))).as("host"))
    val kept = WebCuration.domainQuota(df, col("host"), col("id"), quota = 7)
    val byHost = kept.groupBy("host").count().as[(String, Long)]
      .collect().toMap
    assert(byHost.values.toSet === Set(7L))
    // partition-insensitive: a reshuffled input picks the same set
    val kept2 = WebCuration
      .domainQuota(df.repartition(13), col("host"), col("id"), quota = 7)
    assert(kept.select("host", "id", "keep_rank").collect().toSet ===
      kept2.select("host", "id", "keep_rank").collect().toSet)
    // and the salted path equals the direct single-window answer
    import org.apache.spark.sql.expressions.Window
    val direct = df
      .withColumn("keep_rank", row_number().over(Window.partitionBy("host")
        .orderBy(md5(col("id").cast("string")), col("id"))))
      .filter(col("keep_rank") <= 7)
    assert(kept.select("host", "id", "keep_rank").collect().toSet ===
      direct.select("host", "id", "keep_rank").collect().toSet)
  }

  test("domainQuota under-quota hosts keep everything") {
    val df = (0L until 5L).toDF("id").withColumn("host", lit("only"))
    assert(WebCuration.domainQuota(df, col("host"), col("id"), 10)
      .count() === 5)
  }

  test("blockHosts removes exactly the blocked hosts via broadcast anti join") {
    val df = Seq(("a.com", 1L), ("b.com", 2L), ("a.com", 3L), ("c.com", 4L))
      .toDF("host", "id")
    val out = WebCuration.blockHosts(df, col("host"),
      Seq("a.com").toDF("host"))
    assert(out.select("id").as[Long].collect().sorted.toSeq === Seq(2L, 4L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"))
  }

  test("domainComposition aggregates per registrable domain") {
    val df = Seq(
      ("x.example.com", 10L, "en"), ("y.example.com", 20L, "de"),
      ("z.other.net", 5L, "en"))
      .toDF("host", "n_chars", "lang")
    val r = WebCuration.domainComposition(df, col("host"), col("n_chars"),
        col("lang"), "en")
      .orderBy("domain")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(r === Seq(
      ("example.com", 2L, 30L, 2L, 0.5),
      ("other.net", 1L, 5L, 1L, 1.0)))
  }
}
