package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** rag16: the article INDEXING chunker — rag-orchestrator's
  * paragraphChunker (internal/domain/chunker.go :68-112, v9;
  * merger.go mergeShortChunks :7-65 + mergeConsecutiveShortChunks
  * :67-104; splitter.go splitLongChunks :9-95 + splitIntoSentences
  * :97-123), production-wired at index_article_usecase.go:96 on every
  * indexed article. Found by the round-16 FULL-basename diff (not the
  * verb grep — the chunker files carry few compute verbs).
  *
  * The v9 SanitizeHTML DOM half (sanitizer.go — golang.org/x/net/html
  * parse, boilerplate trigger tables, block-element line breaks) is a
  * vendored HTML parser (the ammonia/nh3/goquery class); the composed
  * input here is POST-sanitize text, the pre01 precedent. Everything
  * after is the deterministic spine, re-expressed as in-row folds
  * (ce01's pack-fold class — the reference is a per-document
  * sequential state machine, so the Spark form is aggregate() HOFs
  * over the paragraph array, one row per document, no shuffle):
  *
  *  - newline normalization (\r\n, \r → \n), split on BLANK LINES
  *    (`\n\n`), trim, drop empties (chunker.go:74-88);
  *  - pass 1 (mergeShortChunks): paragraphs < MinChunkLength=80 RUNES
  *    accumulate; when a long paragraph arrives the accumulator
  *    flushes — still-short accumulations merge into the PREVIOUS
  *    chunk, or PREPEND to the current long paragraph when nothing
  *    precedes (the v5 leading-short rule); a ≥80 accumulation stands
  *    alone; the trailing accumulator merges back or stands (possibly
  *    still short when it is the only content — chunker's own comment);
  *  - pass 2 (mergeConsecutiveShortChunks): a left fold — a short
  *    current absorbs the next paragraph REGARDLESS of its length
  *    (the while-chain and the prepend-to-next branch produce the
  *    same concatenation, proven in spec), a long current emits;
  *    the trailing short merges into the last result;
  *  - splitLongChunks: paragraphs > MaxChunkLength=1000 runes split
  *    at sentence boundaries (`[.!?。]` followed by space/newline/EOF
  *    — re-expressed as a separator substitution, equivalent after
  *    TrimSpace since the scan leaves the whitespace to be trimmed in
  *    the next sentence) and re-pack greedily to ≤1000 with a single
  *    space joint; sentences THEMSELVES > 1000 split into strict
  *    1000-rune slabs whose trailing sub-80 slab merges into the
  *    previous result if that stays < 1500 (spec-verified; composed
  *    out of oracle scope — no composed sentence exceeds 1000);
  *  - chunks emit with 0-based ordinals and the sha256 content hash
  *    (chunker.go:99-108) — the hash IS the content identity
  *    downstream (rag17's diff keys on it), so the output row is
  *    (doc_id, ordinal, rune_len, hash).
  *
  * All lengths are RUNE counts (utf8.RuneCountInString) — Spark/DuckDB
  * length() on the composed BMP corpus, the standing pin.
  *
  * Scale: one stateless scan projection — every fold is bounded by the
  * document's own paragraph count; zero shuffles.
  */
object ParagraphChunks {

  val MinChunkLength = 80
  val MaxChunkLength = 1000

  private val Sep = "\n\n"

  private def emptyArr: Column = array().cast("array<string>")

  /** merger.go mergeShortChunks (:7-65) as a left fold. */
  def pass1(paras: Column): Column = {
    val init = struct(emptyArr.as("m"), lit("").as("acc"))
    def replaceLast(arr: Column, extra: Column): Column =
      concat(slice(arr, lit(1), size(arr) - 1),
        array(concat(element_at(arr, -1), lit(Sep), extra)))
    val merged = aggregate(paras, init,
      (st, p) => {
        val m = st.getField("m"); val acc = st.getField("acc")
        val longP = length(p) >= MinChunkLength
        val accShort = length(acc) < MinChunkLength
        // long paragraph: flush the accumulator, then append p (with
        // the leading-short prepend when nothing precedes)
        val flushedM = when(acc === "", m)
          .when(accShort && size(m) > 0, replaceLast(m, acc))
          .when(accShort, m) // prepends to p below
          .otherwise(concat(m, array(acc)))
        val pOut = when(acc =!= "" && accShort && size(m) === 0,
          concat(acc, lit(Sep), p)).otherwise(p)
        when(longP,
          struct(concat(flushedM, array(pOut)).as("m"), lit("").as("acc")))
          .otherwise(struct(m.as("m"),
            when(acc === "", p).otherwise(concat(acc, lit(Sep), p)).as("acc")))
      },
      st => {
        val m = st.getField("m"); val acc = st.getField("acc")
        when(acc === "", m)
          .when(length(acc) < MinChunkLength && size(m) > 0, replaceLast(m, acc))
          .otherwise(concat(m, array(acc)))
      })
    merged
  }

  /** merger.go mergeConsecutiveShortChunks (:67-104) as a left fold:
    * short current absorbs the next regardless of length; long emits.
    */
  def pass2(paras: Column): Column =
    aggregate(paras, struct(emptyArr.as("r"), lit("").as("cur")),
      (st, p) => {
        val r = st.getField("r"); val cur = st.getField("cur")
        when(cur === "", struct(r.as("r"), p.as("cur")))
          .when(length(cur) < MinChunkLength,
            struct(r.as("r"), concat(cur, lit(Sep), p).as("cur")))
          .otherwise(struct(concat(r, array(cur)).as("r"), p.as("cur")))
      },
      st => {
        val r = st.getField("r"); val cur = st.getField("cur")
        when(cur === "", r)
          .when(length(cur) < MinChunkLength && size(r) > 0,
            concat(slice(r, lit(1), size(r) - 1),
              array(concat(element_at(r, -1), lit(Sep), cur))))
          .otherwise(concat(r, array(cur)))
      })

  /** splitter.go splitIntoSentences (:97-123): terminator followed by
    * space/newline splits (the substitution consumes the whitespace
    * the reference leaves for TrimSpace — equivalent, pinned).
    */
  def sentences(para: Column): Column =
    filter(transform(
      split(regexp_replace(para, "([.!?。])[ \\n]", "$1"), ""),
      s => regexp_replace(s, "^\\s+|\\s+$", "")), s => s =!= "")

  /** splitter.go splitLongChunks (:9-95): greedy sentence packing to
    * ≤1000 with the strict-slab sub-split and the <1500 tail merge.
    */
  def packLong(para: Column): Column = {
    val pack = aggregate(sentences(para),
      struct(emptyArr.as("r"), lit("").as("c")),
      (st, s) => {
        val r = st.getField("r"); val c = st.getField("c")
        val flushNeeded = length(c) > 0 &&
          length(c) + 1 + length(s) > MaxChunkLength
        val r1 = when(flushNeeded, concat(r, array(c))).otherwise(r)
        val c1 = when(flushNeeded, lit("")).otherwise(c)
        val overlong = length(s) > MaxChunkLength
        // slab path: flush any chunk, emit 1000-rune slabs, tail rule
        val r2 = when(overlong && c1 =!= "", concat(r1, array(c1))).otherwise(r1)
        val nSlabs = ceil(length(s) / lit(MaxChunkLength.toDouble)).cast("int")
        val slabs = transform(sequence(lit(0), nSlabs - 1),
          i => substring(s, (i * MaxChunkLength + 1).cast("int"), lit(MaxChunkLength)))
        val mainSlabs = slice(slabs, lit(1), size(slabs) - 1)
        val lastSlab = element_at(slabs, -1)
        val withMain = concat(r2, mainSlabs)
        val tailMerges = length(lastSlab) < MinChunkLength &&
          size(withMain) > 0 &&
          length(element_at(withMain, -1)) + length(lastSlab) < 1500
        val slabbed = when(tailMerges,
          concat(slice(withMain, lit(1), size(withMain) - 1),
            array(concat(element_at(withMain, -1), lastSlab))))
          .otherwise(concat(withMain, array(lastSlab)))
        when(overlong, struct(slabbed.as("r"), lit("").as("c")))
          .otherwise(struct(r1.as("r"),
            when(c1 === "", s).otherwise(concat(c1, lit(" "), s)).as("c")))
      },
      st => when(st.getField("c") === "", st.getField("r"))
        .otherwise(concat(st.getField("r"), array(st.getField("c")))))
    pack
  }

  /** The full chunker over (doc_id, body) rows →
    * (doc_id, ordinal, rune_len, hash).
    */
  /** The whole chunker as one array column (shared by [[chunk]] and
    * the spec).
    */
  def chunkArray(body: Column): Column = {
    val normalized = regexp_replace(
      regexp_replace(body, "\r\n", "\n"), "\r", "\n")
    // Go strings.TrimSpace trims \r\n\t too — Spark trim() is
    // space-only, so a whitespace regex trim is the faithful twin
    // (ASCII whitespace, the standing composed-BMP pin)
    val paras = filter(transform(split(normalized, "\n\n"),
      p => regexp_replace(p, "^\\s+|\\s+$", "")), p => p =!= "")
    val merged = pass2(pass1(paras))
    flatten(transform(merged,
      p => when(length(p) <= MaxChunkLength, array(p)).otherwise(packLong(p))))
  }

  def chunk(rows: DataFrame): DataFrame = {
    val chunks = chunkArray(col("body"))
    rows.select(col("doc_id"), posexplode(chunks).as(Seq("ordinal", "content")))
      .select(col("doc_id"), col("ordinal"),
        length(col("content")).as("rune_len"),
        sha2(col("content"), 256).as("hash"))
  }

  /** rag16 adapter: six composed post-sanitize body classes. */
  def rag16(s: SparkSession, dir: String): DataFrame = {
    val cls = col("doc_id") % 6
    val longP = (tag: String) => concat(lit(s"Paragraph $tag "),
      rpad(substring(col("text"), 1, 40), 80, "y"))
    val sentencePara = concat(lit("Opening sentence number one here. "),
      repeat(lit("A follow-up sentence with more body text to pack tightly. "), 20),
      lit("The closing sentence ends here."))
    val body = when(cls === 0,
        concat_ws("\n\n", longP("a"), longP("b"), longP("c")))
      .when(cls === 1, concat_ws("\n\n", lit("tiny lead"), lit("more lead"), longP("x")))
      .when(cls === 2, concat_ws("\n\n", longP("a"), lit("interjection"), longP("b")))
      .when(cls === 3, concat(longP("a"), lit("\r\n\r\n"), lit("tail note")))
      .when(cls === 4, concat_ws("\n\n", lit("one"), lit("two"), lit("three"),
        lit("four"), lit("five")))
      .otherwise(concat(longP("pre"), lit("\n\n"), sentencePara))
    chunk(Tables.documents(s, dir).select(col("doc_id"), body.as("body")))
  }

  /** DuckDB twin of [[rag16]] — the same folds as list_reduce over
    * state-shaped structs (the element carries the paragraph; the
    * prepended init is the empty state). The slab sub-split is
    * composed out of scope (no composed sentence exceeds 1000 runes;
    * the Spark side's slab path is spec-verified instead).
    */
  val rag16OracleSql: String = {
    // DuckDB's list_reduce loses LIST-typed struct fields between
    // iterations (verified on this build), so the fold state is ONE
    // string: chunks joined by RS=chr(30), then US=chr(31), then the
    // accumulator — both sentinels composed away (the chr(2)/chr(3)
    // convention). "Merge into the previous chunk" is then a plain
    // concat after the last RS — no list surgery at all.
    val US = "chr(31)"
    val RS = "chr(30)"
    def mOf(st: String) = s"string_split($st, $US)[1]"
    def aOf(st: String) = s"string_split($st, $US)[2]"
    def app(m: String, c: String) = s"(CASE WHEN $m = '' THEN $c ELSE $m || $RS || $c END)"
    // p1 step over state acc (string) and paragraph x
    val p1Step = {
      val m = mOf("acc"); val a = aOf("acc")
      s"""CASE WHEN length(x) >= 80 THEN
            ${app(
              s"""(CASE WHEN $a = '' THEN $m
                   WHEN length($a) < 80 AND $m <> '' THEN $m || e'\\n\\n' || $a
                   WHEN length($a) < 80 THEN $m
                   ELSE ${app(m, a)} END)""",
              s"""(CASE WHEN $a <> '' AND length($a) < 80 AND $m = ''
                   THEN $a || e'\\n\\n' || x ELSE x END)""")} || $US
          ELSE $m || $US || (CASE WHEN $a = '' THEN x ELSE $a || e'\\n\\n' || x END)
          END"""
    }
    val p1Fin = {
      val m = "string_split(st1, chr(31))[1]"; val a = "string_split(st1, chr(31))[2]"
      s"""CASE WHEN $a = '' THEN $m
           WHEN length($a) < 80 AND $m <> '' THEN $m || e'\\n\\n' || $a
           ELSE ${app(m, a)} END"""
    }
    val p2Step = {
      val m = mOf("acc"); val a = aOf("acc")
      s"""CASE WHEN $a = '' THEN $m || $US || x
           WHEN length($a) < 80 THEN $m || $US || $a || e'\\n\\n' || x
           ELSE ${app(m, a)} || $US || x END"""
    }
    val p2Fin = {
      val m = "string_split(st2, chr(31))[1]"; val a = "string_split(st2, chr(31))[2]"
      s"""CASE WHEN $a = '' THEN $m
           WHEN length($a) < 80 AND $m <> '' THEN $m || e'\\n\\n' || $a
           ELSE ${app(m, a)} END"""
    }
    val packStep = {
      val m = mOf("acc"); val a = aOf("acc")
      s"""CASE WHEN $a <> '' AND length($a) + 1 + length(x) > 1000
             THEN ${app(m, a)} || $US || x
           WHEN $a = '' THEN $m || $US || x
           ELSE $m || $US || $a || ' ' || x END"""
    }
    val packFin = {
      val m = "string_split(stp, chr(31))[1]"; val a = "string_split(stp, chr(31))[2]"
      s"""CASE WHEN $a = '' THEN $m ELSE ${app(m, a)} END"""
    }
    s"""WITH comp AS (SELECT doc_id,
         CASE doc_id % 6
           WHEN 0 THEN concat_ws(e'\\n\\n',
             'Paragraph a ' || rpad(substr(text, 1, 40), 80, 'y'),
             'Paragraph b ' || rpad(substr(text, 1, 40), 80, 'y'),
             'Paragraph c ' || rpad(substr(text, 1, 40), 80, 'y'))
           WHEN 1 THEN concat_ws(e'\\n\\n', 'tiny lead', 'more lead',
             'Paragraph x ' || rpad(substr(text, 1, 40), 80, 'y'))
           WHEN 2 THEN concat_ws(e'\\n\\n',
             'Paragraph a ' || rpad(substr(text, 1, 40), 80, 'y'), 'interjection',
             'Paragraph b ' || rpad(substr(text, 1, 40), 80, 'y'))
           WHEN 3 THEN 'Paragraph a ' || rpad(substr(text, 1, 40), 80, 'y')
             || e'\\r\\n\\r\\n' || 'tail note'
           WHEN 4 THEN concat_ws(e'\\n\\n', 'one', 'two', 'three', 'four', 'five')
           ELSE 'Paragraph pre ' || rpad(substr(text, 1, 40), 80, 'y') || e'\\n\\n'
             || 'Opening sentence number one here. '
             || repeat('A follow-up sentence with more body text to pack tightly. ', 20)
             || 'The closing sentence ends here.'
         END AS body
         FROM documents),
       paras AS (SELECT doc_id,
         list_filter(list_transform(
           string_split(replace(replace(body, e'\\r\\n', e'\\n'), e'\\r', e'\\n'), e'\\n\\n'),
           p -> regexp_replace(p, '^\\s+|\\s+$$', '', 'g')), p -> p <> '') AS ps
         FROM comp),
       p1 AS (SELECT doc_id,
         list_reduce([$US] || ps, (acc, x) -> $p1Step) AS st1
         FROM paras),
       p1f AS (SELECT doc_id, ($p1Fin) AS m1 FROM p1),
       p2 AS (SELECT doc_id,
         list_reduce([$US] || list_filter(string_split(m1, $RS), c -> c <> ''),
           (acc, x) -> $p2Step) AS st2
         FROM p1f),
       p2f AS (SELECT doc_id,
         list_filter(string_split(($p2Fin), $RS), c -> c <> '') AS merged2
         FROM p2),
       par_rows AS (SELECT doc_id, generate_subscripts(merged2, 1) AS pord,
              unnest(merged2) AS p
         FROM p2f),
       sent_rows AS (SELECT doc_id, pord, p,
         CASE WHEN length(p) <= 1000 THEN NULL
              ELSE list_filter(list_transform(
                string_split(regexp_replace(p, '([.!?。])[ \\n]', '\\1' || chr(3), 'g'), chr(3)),
                s -> regexp_replace(s, '^\\s+|\\s+$$', '', 'g')), s -> s <> '') END AS sents
         FROM par_rows),
       pk AS (SELECT doc_id, pord, p,
         CASE WHEN sents IS NULL THEN NULL
              ELSE list_reduce([$US] || sents, (acc, x) -> $packStep) END AS stp
         FROM sent_rows),
       pkf AS (SELECT doc_id, pord,
         CASE WHEN stp IS NULL THEN [p]
              ELSE list_filter(string_split(($packFin), $RS), c -> c <> '') END AS cl
         FROM pk),
       chunk_rows AS (SELECT doc_id, pord, generate_subscripts(cl, 1) AS sord,
              unnest(cl) AS content
         FROM pkf)
       SELECT doc_id,
              row_number() OVER (PARTITION BY doc_id ORDER BY pord, sord) - 1 AS ordinal,
              length(content) AS rune_len,
              sha256(content) AS hash
       FROM chunk_rows"""
  }
}
