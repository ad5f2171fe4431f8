package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.microRatio

/** td02: the tag-vote weak-supervision genre labeler — the
  * deterministic labeling half of
  * recap-subworker/recap_subworker/infra/classifier/collect_data.py
  * (`decide_genre` :160 over the TAG_TO_GENRE table :20-157; the
  * surrounding collect_data() is DB export plumbing):
  *
  *  - each of an item's tags lowercases and maps through the literal
  *    256-entry tag->genre table; unmapped tags cast NO vote (:172);
  *  - the winning genre is the vote majority; confidence = top-vote
  *    share of MAPPED votes (:179-183 -- unmapped tags dilute
  *    nothing);
  *  - accept when confidence >= 0.5 (:189 -- exactly half qualifies,
  *    so a 1-1 split between two genres LABELS the item with the
  *    first-seen genre at 0.5, pinned), else (None, confidence);
  *    no votes at all -> (None, 0.0) with the no-tags early return;
  *  - Counter.most_common ties resolve by FIRST INSERTION -- the
  *    genre whose first vote appears earliest in tag order wins
  *    (Python's sort is stable over dict insertion order); mapped
  *    here exactly via min(vote position) as the tie-break, not
  *    re-expressed away.
  *
  * Scale: tags explode in-row, the vote map is a broadcast literal,
  * and the winner is a max_by over the (item, genre) vote frame --
  * TWO map-side-combinable aggs, no windows, no corpus joins; the
  * labeler runs on 100 TB of tag lists in two bounded shuffles.
  */
object TagVote {

  /** TAG_TO_GENRE (:20-157) verbatim -- 256 entries, lowercase keys. */
  val TagToGenre: Map[String, String] = Map(
    "ai" -> "ai_data", "llm" -> "ai_data", "chatgpt" -> "ai_data",
    "openai" -> "ai_data", "machine learning" -> "ai_data", "generative ai" -> "ai_data",
    "nvidia" -> "ai_data", "python" -> "software_dev", "rust" -> "software_dev",
    "go" -> "software_dev", "java" -> "software_dev", "javascript" -> "software_dev",
    "js" -> "software_dev", "code" -> "software_dev", "script" -> "software_dev",
    "programming" -> "software_dev", "github" -> "software_dev", "docker" -> "software_dev",
    "開発" -> "software_dev", "技術" -> "software_dev", "実装" -> "software_dev",
    "プログラミング" -> "software_dev", "aws" -> "software_dev", "cloud" -> "software_dev",
    "linux" -> "software_dev", "ubuntu" -> "software_dev", "security" -> "cybersecurity",
    "hacker" -> "cybersecurity", "vulnerability" -> "cybersecurity", "malware" -> "cybersecurity",
    "breach" -> "cybersecurity", "authentication" -> "cybersecurity", "android" -> "consumer_tech",
    "iphone" -> "consumer_tech", "smartphone" -> "consumer_tech", "pixel" -> "consumer_tech",
    "galaxy" -> "consumer_tech", "ipad" -> "consumer_tech", "tablet" -> "consumer_tech",
    "macbook" -> "consumer_tech", "windows" -> "consumer_tech", "pc" -> "consumer_tech",
    "laptop" -> "consumer_tech", "device" -> "consumer_tech", "hardware" -> "consumer_tech",
    "gadget" -> "consumer_tech", "apple" -> "consumer_tech", "samsung" -> "consumer_tech",
    "google" -> "consumer_tech", "social media" -> "internet_platforms", "facebook" -> "internet_platforms",
    "twitter" -> "internet_platforms", "x" -> "internet_platforms", "instagram" -> "internet_platforms",
    "tiktok" -> "internet_platforms", "youtube" -> "internet_platforms", "app store" -> "internet_platforms",
    "browser" -> "internet_platforms", "space" -> "space_astronomy", "nasa" -> "space_astronomy",
    "spacex" -> "space_astronomy", "astronomy" -> "space_astronomy", "moon" -> "space_astronomy",
    "mars" -> "space_astronomy", "climate" -> "climate_environment", "environment" -> "climate_environment",
    "global warming" -> "climate_environment", "carbon" -> "climate_environment", "emission" -> "climate_environment",
    "plastic" -> "climate_environment", "energy" -> "energy_transition", "solar" -> "energy_transition",
    "wind" -> "energy_transition", "battery" -> "energy_transition", "nuclear" -> "energy_transition",
    "hydrogen" -> "energy_transition", "renewable" -> "energy_transition", "medicine" -> "health_medicine",
    "doctor" -> "health_medicine", "hospital" -> "health_medicine", "health" -> "health_medicine",
    "covid" -> "health_medicine", "virus" -> "health_medicine", "vaccine" -> "health_medicine",
    "mental health" -> "health_medicine", "biology" -> "life_science", "genetics" -> "life_science",
    "dna" -> "life_science", "biotech" -> "life_science", "research" -> "life_science",
    "science" -> "life_science", "economy" -> "economics_macro", "inflation" -> "economics_macro",
    "gdp" -> "economics_macro", "interest rate" -> "economics_macro", "employment" -> "economics_macro",
    "recession" -> "economics_macro", "stock" -> "markets_finance", "market" -> "markets_finance",
    "investing" -> "markets_finance", "finance" -> "markets_finance", "crypto" -> "markets_finance",
    "bitcoin" -> "markets_finance", "bank" -> "markets_finance", "earnings" -> "markets_finance",
    "nasdaq" -> "markets_finance", "startup" -> "startups_innovation", "venture capital" -> "startups_innovation",
    "funding" -> "startups_innovation", "innovation" -> "startups_innovation", "entrepreneur" -> "startups_innovation",
    "founder" -> "startups_innovation", "industry" -> "industry_logistics", "supply chain" -> "industry_logistics",
    "logistics" -> "industry_logistics", "manufacturing" -> "industry_logistics", "factory" -> "industry_logistics",
    "production" -> "industry_logistics", "politics" -> "politics_government", "government" -> "politics_government",
    "election" -> "politics_government", "vote" -> "politics_government", "parliament" -> "politics_government",
    "congress" -> "politics_government", "democrat" -> "politics_government", "republican" -> "politics_government",
    "senate" -> "politics_government", "prime minister" -> "politics_government", "president" -> "politics_government",
    "biden" -> "politics_government", "trump" -> "politics_government", "campaign" -> "politics_government",
    "policy" -> "politics_government", "diplomacy" -> "diplomacy_security", "war" -> "diplomacy_security",
    "military" -> "diplomacy_security", "defense" -> "diplomacy_security", "nato" -> "diplomacy_security",
    "geopolitics" -> "diplomacy_security", "law" -> "law_crime", "court" -> "law_crime",
    "legal" -> "law_crime", "lawsuit" -> "law_crime", "judge" -> "law_crime",
    "crime" -> "law_crime", "police" -> "law_crime", "scam" -> "law_crime",
    "education" -> "education", "school" -> "education", "university" -> "education",
    "student" -> "education", "teacher" -> "education", "learning" -> "education",
    "work" -> "labor_workplace", "job" -> "labor_workplace", "career" -> "labor_workplace",
    "hiring" -> "labor_workplace", "workplace" -> "labor_workplace", "remote work" -> "labor_workplace",
    "salary" -> "labor_workplace", "society" -> "society_demographics", "population" -> "society_demographics",
    "migration" -> "society_demographics", "gender" -> "society_demographics", "welfare" -> "society_demographics",
    "art" -> "culture_arts", "culture" -> "culture_arts", "museum" -> "culture_arts",
    "exhibition" -> "culture_arts", "heritage" -> "culture_arts", "movie" -> "film_tv",
    "film" -> "film_tv", "cinema" -> "film_tv", "tv" -> "film_tv",
    "drama" -> "film_tv", "netflix" -> "film_tv", "disney" -> "film_tv",
    "series" -> "film_tv", "actor" -> "film_tv", "hollywood" -> "film_tv",
    "映画" -> "film_tv", "music" -> "music_audio", "song" -> "music_audio",
    "concert" -> "music_audio", "spotify" -> "music_audio", "band" -> "music_audio",
    "singer" -> "music_audio", "audio" -> "music_audio", "podcast" -> "music_audio",
    "sports" -> "sports", "football" -> "sports", "soccer" -> "sports",
    "baseball" -> "sports", "basketball" -> "sports", "nba" -> "sports",
    "nfl" -> "sports", "tennis" -> "sports", "olympics" -> "sports",
    "athlete" -> "sports", "stadium" -> "sports", "golf" -> "sports",
    "野球" -> "sports", "ゴルフ" -> "sports", "food" -> "food_cuisine",
    "drink" -> "food_cuisine", "restaurant" -> "food_cuisine", "cooking" -> "food_cuisine",
    "recipe" -> "food_cuisine", "beer" -> "food_cuisine", "wine" -> "food_cuisine",
    "travel" -> "travel_places", "tourism" -> "travel_places", "hotel" -> "travel_places",
    "airline" -> "travel_places", "flight" -> "travel_places", "vacation" -> "travel_places",
    "resort" -> "travel_places", "home" -> "home_living", "house" -> "home_living",
    "interior" -> "home_living", "furniture" -> "home_living", "garden" -> "home_living",
    "diy" -> "home_living", "lifehack" -> "home_living", "game" -> "games_esports",
    "games" -> "games_esports", "gaming" -> "games_esports", "esports" -> "games_esports",
    "nintendo" -> "games_esports", "sony" -> "games_esports", "playstation" -> "games_esports",
    "xbox" -> "games_esports", "steam" -> "games_esports", "ps5" -> "games_esports",
    "anime" -> "games_esports", "manga" -> "games_esports", "comics" -> "games_esports",
    "アニメ" -> "games_esports", "漫画" -> "games_esports", "car" -> "mobility_automotive",
    "auto" -> "mobility_automotive", "ev" -> "mobility_automotive", "tesla" -> "mobility_automotive",
    "toyota" -> "mobility_automotive", "transport" -> "mobility_automotive", "train" -> "mobility_automotive",
    "bus" -> "mobility_automotive", "mobility" -> "mobility_automotive", "shopping" -> "consumer_products",
    "retail" -> "consumer_products", "product" -> "consumer_products", "brand" -> "consumer_products",
    "sale" -> "consumer_products", "amazon" -> "consumer_products", "price" -> "consumer_products",
    "discount" -> "consumer_products"
  )

  val AcceptThreshold = 0.5

  /** decide_genre over an exploded (item_id, pos, tag) frame: one
    * vote per mapped tag, majority by count with the first-insertion
    * tie-break, confidence = top count / mapped votes; items whose
    * tags cast NO mapped vote emit the (None, 0.0) row (:168).
    *
    * Unmapped tags LEFT-join to a null genre and ride through the
    * same aggregation — resurrecting vote-less items with an outer
    * join against the item list would be a corpus×corpus sort-merge
    * join (caught by the PlanSpec pin); the winner is a max_by whose
    * ordering key is null on unmapped rows (max_by skips them), so
    * the whole labeler is two map-side-combinable aggs and zero
    * joins beyond the broadcast table.
    */
  def decideGenresOn(tags: DataFrame): DataFrame = {
    val s = tags.sparkSession
    import s.implicits._
    val table = TagToGenre.toSeq.toDF("tag_key", "genre")
    val votes = tags
      .withColumn("tag_key", lower(col("tag")))
      .join(broadcast(table), Seq("tag_key"), "left")
    val perGenre = votes.groupBy("item_id", "genre").agg(
      count(lit(1)).as("votes"),
      min(col("pos")).as("first_pos"))
    // max votes, ties to the earliest first vote: the ordering struct
    // negates first_pos so struct-max is (max votes, min first_pos)
    perGenre.groupBy("item_id").agg(
      max_by(struct(col("genre"), col("votes")),
        when(col("genre").isNotNull,
          struct(col("votes"), -col("first_pos")))).as("win"),
      sum(when(col("genre").isNotNull, col("votes"))).as("total_votes"))
      .select(col("item_id"),
        when(col("win.votes") * 2 >= col("total_votes"), col("win.genre"))
          .as("genre"),
        coalesce(microRatio(col("win.votes"), col("total_votes"), 6), lit(0.0))
          .as("confidence"))
  }

  /** Composed tag lists: tags drawn from the vote table keys plus
    * unmapped noise, with planted all-unmapped and split-vote items.
    */
  def composeTags(s: SparkSession, dir: String): DataFrame = {
    val keys = TagToGenre.keys.toSeq.sorted
    val keyArr = typedLit(keys)
    val d = col("doc_id")
    val tagAt = (m: Int, off: Int) =>
      element_at(keyArr, (pmod(d * m + off, lit(keys.size))).cast("int") + 1)
    val mapped = pmod(d, lit(19)) =!= 0 // residue 19: ALL tags unmapped
    Tables.documents(s, dir).select(d.as("item_id"),
      array(
        when(mapped, tagAt(7, 0)).otherwise(lit("zz-unmapped")),
        when(mapped && pmod(d, lit(3)) =!= 0, tagAt(11, 5)),
        when(mapped && pmod(d, lit(4)) === 0, tagAt(7, 0)), // a repeat vote
        when(pmod(d, lit(5)) === 0, lit("unmapped-noise-tag")),
        when(mapped && pmod(d, lit(17)) === 0, upper(tagAt(13, 9))) // case-folds
      ).as("tags"))
      .select(col("item_id"), posexplode(filter(col("tags"), _.isNotNull))
        .as(Seq("pos", "tag")))
  }

  def td02(s: SparkSession, dir: String): DataFrame =
    decideGenresOn(composeTags(s, dir))
}
