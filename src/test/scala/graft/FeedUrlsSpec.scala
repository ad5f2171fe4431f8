package graft

import graft.operators.FeedUrls
import org.apache.spark.sql.functions._

/** Feed-URL genre classification: one case per reference rule class
  * (scripts/classify_feed_urls.py).
  */
class FeedUrlsSpec extends SparkSpec {
  import spark.implicits._

  private def genre(url: String): String =
    FeedUrls.classifyOn(Seq((1L, url)).toDF("feed_id", "url"))
      .collect().head.getString(2)

  test("path rules beat domain rules and match as raw substrings (:64)") {
    assert(genre("https://www.theguardian.com/artanddesign/x") == "art_culture",
      "a guardian URL with a matching path never reaches the guardian default")
    assert(genre("https://anything.example/science/x") == "science")
    assert(genre("https://x.org/us-news/today") == "global_politics")
    assert(genre("https://x.org/prepuzzles-zone/x") == "unknown",
      "'/puzzles' needs the slash — 'prepuzzles' has none before it")
    assert(genre("https://x.org/a/games") == "games_puzzles",
      "substring match anywhere in the path")
  }

  test("normalize_domain: netloc lowercased, ONE leading www. stripped, port kept (:22)") {
    assert(genre("https://WWW.ZDNET.COM/p/x") == "pro_it_media")
    assert(genre("https://www.theverge.com:8443/p/x") == "unknown",
      "urlparse netloc keeps the port, so the suffix match misses — the reference quirk")
  }

  test("_host_matches is suffix-safe: the docstring's own attack cases miss (:36)") {
    assert(genre("https://evil-theverge.com/p/x") == "unknown")
    assert(genre("https://theverge.com.attacker.com/p/x") == "unknown")
    assert(genre("https://sub.wired.com/p/x") == "consumer_tech",
      "a real subdomain DOES match via the '.suffix' arm")
    assert(genre("https://theverge.com/p/x") == "consumer_tech")
  }

  test("guardian default, substring-domain lists, and rule order (:104,:120,:142)") {
    assert(genre("https://theguardian.com/uk/x") == "global_politics",
      "guardian with an unmatched path takes the default")
    assert(genre("https://acme-techblog.example.com/p/x") == "developer_insights",
      "'techblog' fires before the later '-tech' → pro_it_media rule")
    assert(genre("https://get.tech/p/x") == "pro_it_media", "'.tech' TLD")
    assert(genre("https://api.security-daily.net/p/x") == "security_policy")
    assert(genre("https://uehiro.ox.ac.uk/p/x") == "art_culture")
    assert(genre("https://medicalxpress.com/p/x") == "health")
    assert(genre("https://nngroup.com/p/x") == "design")
    assert(genre("https://cnet.com/p/x") == "tech")
    assert(genre("https://openai.com/index/x") == "ai_research")
  }

  test("scheme-less URLs have an empty netloc: domain rules all miss (:25)") {
    assert(genre("example.com/p/x") == "unknown")
    assert(genre("zdnet.com/p/x") == "unknown",
      "without '//' urlparse puts the host in the PATH")
    assert(genre("zdnet.com/science/x") == "science",
      "…where path rules still see it")
  }

  test("composition reaches every ladder branch class at sf0.001") {
    val out = FeedUrls.ti02(spark, sfDir).cache()
    val genres = out.select("genre").distinct().collect().map(_.getString(0)).toSet
    for (g <- Seq("art_culture", "science", "environment_policy", "global_politics",
                  "society_justice", "games_puzzles", "business_finance",
                  "consumer_tech", "health", "travel_lifestyle", "developer_insights",
                  "pro_it_media", "security_policy", "ai_research", "design",
                  "tech", "unknown"))
      assert(genres.contains(g), s"composition never produces $g")
    out.unpersist()
  }
}
