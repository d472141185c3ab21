package graft.operators

import graft.Tables._
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM-data pipeline over the
  * `documents` table: token statistics, quality signals, stopword-
  * profile language ID, content fingerprinting.
  *
  * Everything is built from codegen'd `functions._` expressions over
  * the tokenized text — no UDFs, no shuffle except the final orderBy
  * (which at scale would be dropped; it exists so the correctness
  * oracle compares deterministically). Filters/projections push down
  * to the parquet scan.
  */
object TextOps {

  private def toks(c: org.apache.spark.sql.Column) = split(c, " ")

  /** Token statistics: count, distinct count, char length.
    * NULL-text docs are excluded on BOTH sides (the family-wide
    * guard): Spark's size(split(NULL)) = -1 vs DuckDB's NULL would
    * otherwise diverge — there are no token statistics for text that
    * does not exist. EdgeCaseSpec pins the NULL-text row. */
  def textStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .filter($"text".isNotNull)
      .select($"doc_id",
        size(toks($"text")).cast("long").as("n_tokens"),
        size(array_distinct(toks($"text"))).cast("long").as("n_unique"),
        length($"text").cast("long").as("len_chars"))
      .orderBy($"doc_id")
  }
  val textStatsSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
      |  CAST(length(text) AS BIGINT) AS len_chars
      |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin

  // shared with CurationOps (quality gate, redaction) — ONE definition
  // of the stopword list and PII patterns, in Scala and (interpolated)
  // in every oracle SQL string, so the operator family cannot drift
  private[operators] val stopwords = Seq("the", "a", "data", "row", "value")
  private[operators] val EmailRe =
    """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"""
  private[operators] val UrlRe = """https?://[^ ]+"""

  /** Quality signals: stopword hits, uniqueness, short-token count. */
  def textQuality(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = toks($"text")
    documents(s, d)
      .filter($"text".isNotNull) // family-wide NULL-text guard, see textStats
      .select($"doc_id",
        size(filter(t, c => c.isInCollection(stopwords))).cast("long").as("n_stop"),
        size(filter(t, c => length(c) <= 3)).cast("long").as("n_short"),
        size(t).cast("long").as("n_tokens"))
      .orderBy($"doc_id")
  }
  val textQualitySql: String = {
    val sw = stopwords.map("'" + _ + "'").mkString(", ")
    s"""SELECT doc_id,
       |  CAST(len(list_filter(string_split(text,' '), t -> t IN ($sw))) AS BIGINT) AS n_stop,
       |  CAST(len(list_filter(string_split(text,' '), t -> length(t) <= 3)) AS BIGINT) AS n_short,
       |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
       |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin
  }

  /** Stopword-profile language ID: score each language by distinct-
    * token overlap with its profile; argmax with fixed tie order.
    * (An n-gram heuristic classifier; profiles are tiny in-plan
    * literals, so this is a pure map-side operation.) */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "un"),
    "fr" -> Seq("le", "la", "et", "est", "un", "une"))

  def textLangId(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dt = array_distinct(toks($"text"))
    // family-wide NULL-text guard (see textStats); composed ops
    // (docCcnetE2e) inherit it symmetrically through the shared SQL
    val scored = documents(s, d).filter($"text".isNotNull).select(
      $"doc_id" +:
        profiles.map { case (l, ws) =>
          size(array_intersect(dt, array(ws.map(lit): _*))).as(s"s_$l")
        }: _*)
    // argmax in declared profile order (first max wins)
    val best = profiles.map(_._1).foldRight(lit("und")) { (l, acc) =>
      when(col(s"s_$l") > 0 &&
        profiles.map(p => col(s"s_${p._1}")).reduce((a, b) => greatest(a, b)) === col(s"s_$l"), lit(l))
        .otherwise(acc)
    }
    scored.select($"doc_id", best.as("pred_lang"))
      .orderBy($"doc_id")
  }
  val textLangIdSql: String = {
    def inter(ws: Seq[String]) =
      s"len(list_intersect(list_distinct(string_split(text,' ')), [${ws.map("'" + _ + "'").mkString(", ")}]))"
    val scores = profiles.map { case (l, ws) => s"${inter(ws)} AS s_$l" }.mkString(",\n  ")
    val mx = s"greatest(${profiles.map(p => "s_" + p._1).mkString(", ")})"
    val caseExpr = profiles.map { case (l, _) =>
      s"WHEN s_$l > 0 AND s_$l = $mx THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH scored AS (SELECT doc_id,
       |  $scores
       |FROM documents WHERE text IS NOT NULL)
       |SELECT doc_id, $caseExpr AS pred_lang FROM scored ORDER BY doc_id""".stripMargin
  }

  /** Content fingerprint: md5 (cross-engine) + char/token shape. */
  def textFingerprint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .filter($"text".isNotNull) // family-wide NULL-text guard, see textStats
      .select($"doc_id", md5($"text").as("fp_md5"),
        substring(sha2($"text", 256), 1, 16).as("fp_sha_pfx"))
      .orderBy($"doc_id")
  }
  val textFingerprintSql: String =
    """SELECT doc_id, md5(text) AS fp_md5,
      |  substr(sha256(text), 1, 16) AS fp_sha_pfx
      |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin

  /** BPE-ish pre-tokenization pattern (GPT-2 style, minus lookarounds
    * so Java regex and RE2 agree): contraction suffixes, letter runs,
    * digit runs, punctuation runs. */
  private val bpePattern = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s']+"

  /** Token counting two ways — whitespace and the BPE-ish regex — the
    * "how many tokens is this corpus" primitive of a training-data
    * pipeline. Pure codegen'd expressions; no shuffle except the
    * deterministic orderBy for the oracle. */
  def textTokensBpe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .filter($"text".isNotNull) // family-wide NULL-text guard, see textStats
      .select($"doc_id",
        size(toks($"text")).cast("long").as("n_ws"),
        size(regexp_extract_all($"text", lit(bpePattern), lit(0))).cast("long").as("n_bpe"))
      .orderBy($"doc_id")
  }
  val textTokensBpeSql: String = {
    val pat = bpePattern.replace("'", "''") // SQL-quote; backslashes pass through
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
       |  CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_bpe
       |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin
  }

  /** Repetition scoring — the fraction of duplicate 3-gram shingles,
    * a standard low-quality/boilerplate signal for LLM corpora. The
    * ratio divides the same two BIGINTs in both engines → identical
    * doubles. */
  def textRepetition(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .filter($"text".isNotNull) // family-wide NULL-text guard, see textStats
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", expr(
        """CASE WHEN size(ws) >= 3
          |THEN transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))
          |ELSE array() END""".stripMargin).as("gs"))
      .select($"doc_id",
        size($"gs").cast("long").as("n_grams"),
        size(array_distinct($"gs")).cast("long").as("n_unique"))
      .withColumn("rep_ratio",
        when($"n_grams" > 0, ($"n_grams" - $"n_unique").cast("double") / $"n_grams")
          .otherwise(lit(0.0)))
      .orderBy($"doc_id")
  }
  val textRepetitionSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents
      |            WHERE text IS NOT NULL),
      |sh AS (SELECT doc_id,
      |         CASE WHEN len(ws) >= 3
      |           THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)]
      |           ELSE [] END AS gs
      |       FROM tok)
      |SELECT doc_id,
      |  CAST(len(gs) AS BIGINT) AS n_grams,
      |  CAST(len(list_distinct(gs)) AS BIGINT) AS n_unique,
      |  CASE WHEN len(gs) > 0
      |    THEN CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE) / len(gs)
      |    ELSE 0.0 END AS rep_ratio
      |FROM sh ORDER BY doc_id""".stripMargin

  /** Repetition REMOVAL — the transform [[textRepetition]]'s detector
    * feeds: excise every RE-occurrence of a 3-gram within a document
    * and emit the cleaned text (as md5 + counts, the textRedact
    * O(1)-compare trick). A gram window whose gram already occurred
    * earlier in the same doc marks its 3 token positions for removal;
    * kept tokens preserve order. Disjoint repeats keep their first
    * occurrence intact; a SELF-overlapping run ("the the the …") has
    * its later windows cover all but the run's first token, so the run
    * collapses to one token (EdgeCaseSpec pins both outcomes) — the
    * RefinedWeb/Gopher "remove intra-doc repetition, keep one copy"
    * production step.
    *
    * Shape: ENTIRELY map-side per document (array ops on the token
    * list — gram list, first-occurrence test, removal-position set,
    * index filter); no shuffle except the oracle sort, so it
    * parallelizes embarrassingly at any corpus size. The
    * first-occurrence test is array_position per gram (O(n²) within a
    * doc) — bounded by document length, and at web-scale doc lengths
    * the same pass runs as a per-doc hash set in mapPartitions; this
    * expression form is the oracle-replayable semantics both engines
    * share bit-for-bit.
    *
    * Each intermediate (token list, gram list, removal set) is bound
    * ONCE per row as a singleton-array lambda argument —
    * `transform(array(X), x -> …)` evaluates X exactly once — instead
    * of a withColumn chain: Catalyst's projection collapse would
    * inline a chained alias into every lambda-body reference and
    * re-derive the gram list (split + concat) per TOKEN access, which
    * measured >1000× slower on the test corpus. */
  def textRepetitionRemove(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .filter($"text".isNotNull) // family-wide NULL-text guard, see textStats
      .withColumn("res", expr(
        """element_at(transform(array(split(text, ' ')), ws ->
          |  element_at(transform(array(
          |      CASE WHEN size(ws) >= 3
          |        THEN transform(sequence(0, size(ws) - 3),
          |               i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))
          |        ELSE array() END), gs ->
          |    element_at(transform(array(
          |        -- removal positions: the 3 token slots under each
          |        -- REPEATED window (first occurrence at a 1-based
          |        -- array_position earlier than the 0-based index i);
          |        -- empty-gram guard: sequence(0,-1) would DESCEND
          |        CASE WHEN size(gs) = 0 THEN array()
          |        ELSE array_distinct(flatten(transform(
          |          filter(sequence(0, size(gs) - 1),
          |                 i -> array_position(gs, element_at(gs, i + 1)) < i + 1),
          |          i -> array(i, i + 1, i + 2)))) END), rem ->
          |      named_struct(
          |        'n_tokens', CAST(size(ws) AS BIGINT),
          |        -- every rem position is a real token index (a gram
          |        -- start i ≤ n-3 puts i+2 ≤ n-1), so |rem| IS the
          |        -- removed-token count
          |        'n_removed', CAST(size(rem) AS BIGINT),
          |        'cleaned_md5', md5(concat_ws(' ',
          |          filter(ws, (w, p) -> NOT array_contains(rem, p))))
          |      )), 1)), 1)), 1)""".stripMargin))
      .select($"doc_id",
        $"res.n_tokens".as("n_tokens"),
        $"res.n_removed".as("n_removed"),
        $"res.cleaned_md5".as("cleaned_md5"))
      .orderBy($"doc_id")
  }
  val textRepetitionRemoveSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents
      |            WHERE text IS NOT NULL),
      |g AS (SELECT doc_id, ws,
      |        CASE WHEN len(ws) >= 3
      |          THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)]
      |          ELSE [] END AS gs
      |      FROM tok),
      |r AS (SELECT doc_id, ws, gs,
      |        [list_position(gs, gs[i]) < i for i in range(1, len(gs)+1)] AS rep
      |      FROM g),
      |rm AS (SELECT doc_id, ws,
      |         flatten([[i, i+1, i+2] for i in range(1, len(gs)+1) if rep[i]]) AS rem
      |       FROM r),
      |k AS (SELECT doc_id, ws,
      |        [ws[p] for p in range(1, len(ws)+1) if NOT list_contains(rem, p)] AS kept
      |      FROM rm)
      |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
      |  CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
      |  md5(array_to_string(kept, ' ')) AS cleaned_md5
      |FROM k ORDER BY doc_id""".stripMargin

  /** Doc-frequency threshold for [[textSpanScrub]]: a verbatim
    * [[DedupOps.SpanLen]]-token span present in MORE THAN this many
    * distinct documents is boilerplate (site chrome, license headers,
    * templated intros) and is excised from every document carrying it.
    * Low on the synthetic corpus so the op exercises real removals;
    * production tunes it per corpus (C4 removed any 3-sentence span
    * occurring more than once). */
  val SpanScrubDf = 2L

  /** CROSS-document boilerplate removal — the corpus-level sibling of
    * [[textRepetitionRemove]] (intra-doc) and the CLEANING step the
    * span pair generator ([[DedupOps.dedupSpan]]) only flags: spans
    * verbatim-shared by more than [[SpanScrubDf]] docs are excised
    * from every document, emitting (n_tokens, n_removed, cleaned_md5)
    * per doc — C4's repeated-span removal, keyed on the same
    * [[DedupOps.SpanLen]]-token windows as the whole span family.
    *
    * Shape: one span-index shuffle to compute doc-frequencies (the
    * same index every span op builds), the boilerplate set joined back
    * to position rows (data-derived, unhinted — it is small by
    * construction: spans in >N docs), covered START positions
    * collected per doc (bounded by doc length), and the excision
    * itself pure map-side array ops. Worst case (every doc identical)
    * the boilerplate join returns every position row — corpus-LINEAR,
    * never quadratic, because positions join the span SET, not other
    * docs. */
  def textSpanScrub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = DedupOps.SpanLen
    val gram = (0 until k).map(j => s"ws[i+$j]").mkString(", ")
    val toks = documents(s, d)
      .filter($"text".isNotNull) // family-wide NULL-text guard
      .select($"doc_id", split($"text", " ").as("ws"))
    val occ = toks.filter(size($"ws") >= k)
      .select($"doc_id", posexplode(expr(
        s"transform(sequence(0, size(ws) - $k), i -> md5(concat_ws(' ', $gram)))")))
      .toDF("doc_id", "i", "g")
    val boiler = occ.select($"doc_id", $"g").distinct()
      .groupBy($"g").agg(count(lit(1)).as("n_docs"))
      .filter($"n_docs" > SpanScrubDf).select($"g")
    val starts = occ.join(boiler, "g")
      .groupBy($"doc_id").agg(collect_set($"i").as("starts"))
    toks.join(starts, Seq("doc_id"), "left")
      .select($"doc_id", $"ws",
        coalesce($"starts", expr("array()").cast("array<int>")).as("starts"))
      .withColumn("clean", expr(
        s"filter(ws, (w, p) -> NOT exists(starts, st -> p >= st AND p <= st + ${k - 1}))"))
      .select($"doc_id",
        size($"ws").cast("long").as("n_tokens"),
        (size($"ws") - size($"clean")).cast("long").as("n_removed"),
        md5(concat_ws(" ", $"clean")).as("cleaned_md5"))
      .orderBy($"doc_id")
  }
  lazy val textSpanScrubSql: String = {
    val k = DedupOps.SpanLen
    val gram = (0 until k).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
    s"""WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents
       |            WHERE text IS NOT NULL),
       |occ AS (SELECT doc_id,
       |          unnest([i - 1 for i in range(1, len(ws) - ${k - 1} + 1)]) AS i,
       |          unnest([md5($gram) for i in range(1, len(ws) - ${k - 1} + 1)]) AS g
       |        FROM tok WHERE len(ws) >= $k),
       |boiler AS (SELECT g FROM (
       |             SELECT g, count(DISTINCT doc_id) AS n_docs FROM occ GROUP BY g)
       |           WHERE n_docs > $SpanScrubDf),
       |starts AS (SELECT doc_id, list(DISTINCT o.i) AS starts
       |           FROM occ o JOIN boiler b ON b.g = o.g GROUP BY doc_id),
       |cl AS (SELECT t.doc_id, t.ws, COALESCE(s.starts, []) AS starts
       |       FROM tok t LEFT JOIN starts s USING (doc_id)),
       |fin AS (SELECT doc_id, ws,
       |          [ws[p] for p in range(1, len(ws) + 1)
       |           if len(list_filter(starts, st -> p - 1 >= st AND p - 1 <= st + ${k - 1})) = 0] AS clean
       |        FROM cl)
       |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
       |  CAST(len(ws) - len(clean) AS BIGINT) AS n_removed,
       |  -- COALESCE: a fully-scrubbed doc has clean = [], which
       |  -- array_to_string renders NULL where Spark's concat_ws
       |  -- renders '' — both engines must hash the empty string
       |  md5(COALESCE(array_to_string(clean, ' '), '')) AS cleaned_md5
       |FROM fin ORDER BY doc_id""".stripMargin
  }

  /** Pattern-count filtering signals (emails / URLs) with a shared
    * lookaround-free regex — the PII / boilerplate pre-filter shape. */
  def textPii(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .filter($"text".isNotNull) // family-wide NULL-text guard, see textStats
      .select($"doc_id",
        size(regexp_extract_all($"text", lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all($"text", lit(UrlRe), lit(0)))
          .cast("long").as("n_urls"))
      .orderBy($"doc_id")
  }
  val textPiiSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$UrlRe')) AS BIGINT) AS n_urls
       |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin

  /** Corpus token frequencies, top 50: explode → two-phase aggregate
    * (map-side combine before the shuffle — the wordcount shape that
    * scales to any corpus size). Deterministic top-k via (count desc,
    * token) ordering. */
  def textTopTokens(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(explode(toks($"text")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token")
      .limit(50)
  }
  val textTopTokensSql: String =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin

  /** SimHash signatures via the native [[graft.functions.SimHashMd5]]
    * Catalyst expression, emitted as the 4 16-bit band chunks c0..c3.
    * The md5 nibble-bit derivation is reproducible in DuckDB →
    * hash-checked (round-2 verdict #1); the xxhash64 `simhash`
    * expression remains the unchecked throughput path. */
  def textSimhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    documents(s, d)
      // NULL text diverges between engines (Spark: NULL sig; the DuckDB
      // replica's CASE folds a NULL list_sum to bit 0) — excluded
      // identically on both sides so the contract is engine-independent
      .filter($"text".isNotNull)
      .select($"doc_id", expr("simhash_md5(split(text, ' '))").as("sig"))
      .select($"doc_id", $"sig"(0).as("c0"), $"sig"(1).as("c1"),
        $"sig"(2).as("c2"), $"sig"(3).as("c3"))
      .orderBy($"doc_id")
  }
  val textSimhashSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |             WHERE text IS NOT NULL),
      |hs AS (SELECT doc_id, [md5(t) for t in ws] AS hs FROM tok),
      |bits AS (SELECT doc_id,
      |           [CASE WHEN list_sum([CASE WHEN ((strpos('0123456789abcdef', substr(h, j//4+1, 1))-1) >> (j%4)) & 1 = 1
      |                                     THEN 1 ELSE -1 END for h in hs]) > 0
      |                 THEN 1 ELSE 0 END for j in range(0,64)] AS bits
      |         FROM hs)
      |SELECT doc_id,
      |  CAST(list_sum([bits[k+1]  * (1::BIGINT << k) for k in range(0,16)]) AS BIGINT) AS c0,
      |  CAST(list_sum([bits[16+k+1] * (1::BIGINT << k) for k in range(0,16)]) AS BIGINT) AS c1,
      |  CAST(list_sum([bits[32+k+1] * (1::BIGINT << k) for k in range(0,16)]) AS BIGINT) AS c2,
      |  CAST(list_sum([bits[48+k+1] * (1::BIGINT << k) for k in range(0,16)]) AS BIGINT) AS c3
      |FROM bits ORDER BY doc_id""".stripMargin

  /** Per-SOURCE corpus signature via the custom TypedImperativeAggregate
    * [[graft.functions.SimHashMd5Agg]]: partial aggregation ships one
    * 256-byte counter buffer per group through the shuffle, never the
    * tokens. group≡concat equivalence pinned in FunctionsSpec; md5 bit
    * family makes it DuckDB-checkable. */
  def textSimhashBySource(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    documents(s, d)
      // same cross-engine NULL contract as [[textSimhash]]: NULL text
      // would hash differently, and a NULL source group would survive
      // Spark's groupBy but fall out of the replica's equi-join
      .filter($"text".isNotNull && $"source".isNotNull)
      .groupBy($"source")
      .agg(expr("simhash_md5_agg(split(text, ' '))").as("sig"),
        count(lit(1)).as("n_docs"))
      .select($"source", $"sig"(0).as("c0"), $"sig"(1).as("c1"),
        $"sig"(2).as("c2"), $"sig"(3).as("c3"), $"n_docs")
      .orderBy($"source")
  }
  val textSimhashBySourceSql: String =
    """WITH docs AS (SELECT source, doc_id, text FROM documents
      |              WHERE text IS NOT NULL AND source IS NOT NULL),
      |tok AS (SELECT source, doc_id, unnest(string_split(text, ' ')) AS tk FROM docs),
      |hb AS (SELECT source, md5(tk) AS h FROM tok),
      |bitsum AS (SELECT source, j,
      |             CAST(sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, j//4+1, 1))-1) >> (j%4)) & 1 = 1
      |                      THEN 1 ELSE -1 END) AS BIGINT) AS sm
      |           FROM hb, range(0,64) t(j) GROUP BY source, j),
      |chunks AS (SELECT source, j//16 AS b,
      |             CAST(sum(CASE WHEN sm > 0 THEN (1::BIGINT << (j%16)) ELSE 0 END) AS BIGINT) AS chunk
      |           FROM bitsum GROUP BY source, j//16),
      |nd AS (SELECT source, count(*) AS n_docs FROM docs GROUP BY source)
      |SELECT c.source,
      |  CAST(max(CASE WHEN b=0 THEN chunk END) AS BIGINT) AS c0,
      |  CAST(max(CASE WHEN b=1 THEN chunk END) AS BIGINT) AS c1,
      |  CAST(max(CASE WHEN b=2 THEN chunk END) AS BIGINT) AS c2,
      |  CAST(max(CASE WHEN b=3 THEN chunk END) AS BIGINT) AS c3,
      |  max(nd.n_docs) AS n_docs
      |FROM chunks c JOIN nd ON nd.source = c.source
      |GROUP BY c.source ORDER BY c.source""".stripMargin

  /** Per-document duplicated-content ratio (the RefinedWeb/C4-style
    * cleaning signal): the fraction of a document's distinct 3-gram
    * shingles that also occur in ANY other document. The inverted
    * index (shingle → doc count) is one shuffle on the shingle, the
    * join back is on the same key, and the per-doc rollup shuffles on
    * doc_id — no pairwise doc×doc comparison anywhere, so the cost is
    * corpus-linear where a pair-based formulation is quadratic. */
  def textDupRatio(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    val sh = documents(s, d)
      .select($"doc_id", explode(expr("word_shingles(split(text, ' '))")).as("g"))
    val gDocs = sh.groupBy($"g").agg(count(lit(1)).as("n_docs"))
    sh.join(gDocs, "g")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"n_docs" > 1, 1L).otherwise(0L)).as("n_shared"))
      .select($"doc_id", $"n_shingles", $"n_shared",
        // Integer parts-per-million, NOT a rounded double: pure int64
        // multiply + integer division is bit-identical on every engine,
        // so no comparator rounding mode can diverge (a rounded DOUBLE
        // passed the repo's strict local diff yet hash-failed the
        // driver's comparator for four rounds).
        expr("(1000000L * n_shared) div n_shingles").as("dup_ppm"))
      .orderBy($"doc_id")
  }
  val textDupRatioSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)])) AS g
      |       FROM tok),
      |gd AS (SELECT g, count(*) AS n_docs FROM sh GROUP BY g)
      |SELECT sh.doc_id, count(*) AS n_shingles,
      |  CAST(sum(CASE WHEN gd.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
      |  CAST((1000000 * sum(CASE WHEN gd.n_docs > 1 THEN 1 ELSE 0 END))
      |    // count(*) AS BIGINT) AS dup_ppm
      |FROM sh JOIN gd ON gd.g = sh.g
      |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin

  /** Gopher-style repetition/quality gate (Rae et al. 2021 §A1.1
    * adapted): per-document boolean rules, every one expressed in pure
    * integer arithmetic so no ratio threshold ever touches a float —
    * "mean word length in [3,10]" is `3·n_words <= word_chars <=
    * 10·n_words`, "≥80% words alphabetic" is `5·n_alpha >= 4·n_words`,
    * etc. Pure map-side over the scan (the only exchange is the oracle
    * sort): the shape every corpus-scale quality filter must have,
    * since at 100 TB a shuffle in a per-doc filter is pure waste. */
  /** One BPE merge iteration over the corpus: count adjacent CHARACTER
    * pairs inside every word and rank the top 50 — the inner loop of
    * tokenizer-vocabulary induction (Sennrich et al. 2016), run as one
    * explode + groupBy. The pair expansion happens map-side (array
    * comprehension over integer offsets, no UDF), so the shuffle moves
    * (pair, partial-count) rows: at 100 TB that is bounded by the pair
    * vocabulary per partition, not by corpus characters. Single-char
    * words are filtered BEFORE the sequence expr — Spark's
    * sequence(1, 0) yields a DESCENDING [1,0], not empty. */
  def textBpePairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(explode(toks($"text")).as("word"))
      .filter(length($"word") >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy($"pair").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"pair")
      .limit(50)
  }
  val textBpePairsSql: String =
    """WITH words AS (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |pairs AS (
      |  SELECT unnest([substr(word, i, 2) for i in range(1, length(word))]) AS pair
      |  FROM words WHERE length(word) >= 2)
      |SELECT pair, count(*) AS n FROM pairs
      |GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin

  /** Merge rounds for [[textBpeTrain]] — enough to exercise chained
    * merges (later rounds pair earlier MERGED symbols) while keeping
    * the unrolled oracle replay tractable, the [[IvfKmeans.Rounds]]
    * discipline applied to tokenizer training. */
  val BpeMerges = 4

  /** Effective merge depth: the library knob `spark.graft.bpeMerges`,
    * default [[BpeMerges]]. The REGISTERED oracles replay the default
    * depth (their CTE chains are unrolled at class-init), so the
    * driver contract always runs at [[BpeMerges]]; the conf is the
    * library-API dial — a caller training a deeper tokenizer sets it
    * and gets the same fit loop, spec-tested at non-default depths. */
  private[operators] def bpeDepth(s: SparkSession): Int = {
    val n = s.conf.get("spark.graft.bpeMerges", BpeMerges.toString).toInt
    require(n >= 1, s"spark.graft.bpeMerges must be >= 1, got $n")
    n
  }

  /** BPE tokenizer TRAINING (Sennrich et al. 2016) — the full
    * iterative loop [[textBpePairs]] is the inner step of, run to
    * [[BpeMerges]] merges and emitting the learned merge table (rank,
    * pair, merged symbol, weighted pair count): THE tokenizer-training
    * artifact an LLM data pipeline ships alongside the corpus.
    *
    * Scale shape: the corpus collapses to the DISTINCT-word dictionary
    * with counts in ONE aggregation (at 100 TB the dictionary is
    * catalog-sized — this is exactly how production BPE trainers run,
    * on word counts, never on raw text); every round then works
    * dictionary-sized data: pair counting is a map-side explode +
    * partial-aggregated sum weighted by word counts, the argmax pair
    * is a 1-row driver artifact (the model parameter itself, the
    * [[IvfKmeans]] centroid discipline), and the merge applies as a
    * per-word greedy left-to-right fold — one map-side `aggregate`
    * expression, no shuffle.
    *
    * Cross-engine: the Spark fold (carry/emit state machine) and the
    * oracle's relational replay (gaps-and-islands parity selection
    * over match positions) are different formulations of the SAME
    * greedy non-overlapping rule — overlapping matches chain only in
    * uniform-symbol runs, where greedy keeps even offsets — so the
    * learned tables agree exactly; ties rank (count DESC, pair). */
  def textBpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (merges, vocab) = bpeFit(s, d)
    vocab.unpersist()
    s.createDataFrame(merges).toDF("rank", "sym_a", "sym_b", "merged", "pair_n")
      .orderBy($"rank")
  }

  /** The shared BPE fit: learned merge list + the final (word → syms)
    * vocabulary frame (returned CACHED — callers unpersist). One
    * implementation under [[textBpeTrain]] (emits the merges) and
    * [[textBpeEncode]] (applies the vocabulary), so trainer and
    * encoder can never disagree. */
  private def bpeFit(s: SparkSession, d: String)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    import s.implicits._
    // backslashes must be doubled BEFORE quote-doubling: the merge
    // symbols are spliced into Spark SQL string literals, where '\'
    // is the escape character (ADVICE r15)
    def esc(x: String) = x.replace("\\", "\\\\").replace("'", "''")
    var vocab = documents(s, d)
      .filter($"text".isNotNull)
      .select(explode(toks($"text")).as("word"))
      // zero-length words (consecutive/leading spaces) carry an empty
      // symbol list; the oracle's unnest(syms) replay would silently
      // drop them mid-fit while Spark kept them — exclude them from
      // the dictionary on BOTH engines (ADVICE r15)
      .filter(length($"word") >= 1)
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", expr("regexp_extract_all(word, '.', 0)"))
      .cache()
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    val depth = bpeDepth(s)
    var r = 0
    var exhausted = false
    // the cached parent of the CURRENT vocab, released only after the
    // next action has materialized the child's cache — each round's
    // argmax job doubles as the previous round's materializer, so the
    // loop pays ONE job per round instead of the former
    // argmax + count() pair (guide §1.2: don't compute things you
    // throw away — the count existed only to sequence the unpersist)
    var pending: Option[DataFrame] = None
    while (r < depth && !exhausted) {
      val best = vocab.filter(size($"syms") >= 2)
        .select($"cnt", explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS a, syms[i+1] AS b))")).as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b")).agg(sum($"cnt").as("n"))
        .orderBy($"n".desc, $"a", $"b").limit(1)
        .collect()
      // this action computed through (and filled) vocab's cache, so
      // the parent's cache can go now
      pending.foreach(_.unpersist()); pending = None
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r + 1L, a, b, a + b, n))
        // greedy left-to-right non-overlapping merge, one fold per word
        pending = Some(vocab)
        vocab = vocab.withColumn("syms", expr(
          s"""aggregate(syms,
             |  named_struct('out', CAST(array() AS array<string>), 'carry', CAST(NULL AS string)),
             |  (st, s) -> CASE
             |    WHEN st.carry IS NULL THEN named_struct('out', st.out, 'carry', s)
             |    WHEN st.carry = '${esc(a)}' AND s = '${esc(b)}'
             |      THEN named_struct('out', concat(st.out, array('${esc(a + b)}')), 'carry', CAST(NULL AS string))
             |    ELSE named_struct('out', concat(st.out, array(st.carry)), 'carry', s) END,
             |  st -> CASE WHEN st.carry IS NULL THEN st.out
             |             ELSE concat(st.out, array(st.carry)) END)""".stripMargin))
          .cache()
        r += 1
      }
    }
    // the last round's vocab is cached but not yet materialized;
    // settle it so the parent cache can be released before returning
    // (callers expect exactly one live cached frame)
    pending.foreach { p => vocab.count(); p.unpersist() }
    (merges.result(), vocab)
  }

  /** BPE ENCODING — the inference side of [[textBpeTrain]]: tokenize
    * every document with the learned merges and report the per-doc
    * BPE token count plus an md5 of the full symbol stream (the
    * textRedact O(1)-compare trick; symbols joined by ' ' within a
    * word, words by ' | '). At scale the encoder is the same shape
    * production uses: the corpus re-tokenizes through a JOIN against
    * the dictionary-sized (word → symbols) table — raw text is never
    * re-scanned per merge — and the per-doc rollup is one
    * partial-aggregated groupBy. The oracle replays the identical
    * fit (shared CTE prefix with [[textBpeTrainSql]]) and encodes by
    * the same join, so trainer and encoder stay in lockstep. NULL-text
    * docs are excluded (family-wide guard). */
  def textBpeEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val (_, vocab) = bpeFit(s, d)
    val words = documents(s, d)
      .filter($"text".isNotNull)
      .select($"doc_id", posexplode(toks($"text")).as(Seq("pos", "word")))
    val enc = words.join(vocab.select($"word", $"syms"), "word")
      .select($"doc_id", $"pos",
        size($"syms").cast("long").as("n_syms"),
        concat_ws(" ", $"syms").as("wenc"))
    val out = enc.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum($"n_syms").as("n_bpe"),
        md5(concat_ws(" | ", array_sort(collect_list(struct($"pos", $"wenc")))
          .getField("wenc"))).as("enc_md5"))
      .orderBy($"doc_id")
    vocab.unpersist()
    out
  }
  /** Per-document REAL-tokenizer length: (doc_id, n_words, n_bpe) from
    * the shared [[bpeFit]] — the count the BPE-length feed variants
    * ([[graft.operators.CurationOps]]'s `*_bpe` ops) budget and mix
    * by. Docs whose text holds no non-empty word (NULL, "", all
    * spaces) have no dictionary entry and produce NO row — the same
    * inner-join semantics as the oracle's `bpe` CTE. Encoder shape:
    * corpus re-tokenizes through a join against the dictionary-sized
    * vocab; the rollup is one partial-aggregated groupBy. */
  private[operators] def bpeDocCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (_, vocab) = bpeFit(s, d)
    val words = documents(s, d)
      .filter($"text".isNotNull)
      .select($"doc_id", explode(toks($"text")).as("word"))
    val out = words.join(vocab.select($"word", $"syms"), "word")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(size($"syms").cast("long")).as("n_bpe"))
    vocab.unpersist()
    out
  }

  /** The encode CTE chain shared by [[textBpeEncodeSql]] and the
    * BPE-length feed oracles: [[bpeFitCtesSql]] plus the word-position
    * explode and the vocab join (`wpos`, `wenc`). */
  private[operators] lazy val bpeWencCtesSql: String =
    s"""$bpeFitCtesSql
       |, wpos AS (
       |  SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS word
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM documents WHERE text IS NOT NULL) t),
       |wenc AS (
       |  SELECT w.doc_id, w.pos,
       |    CAST(len(v.syms) AS BIGINT) AS n_syms,
       |    array_to_string(v.syms, ' ') AS wenc
       |  FROM wpos w JOIN v$BpeMerges v ON v.word = w.word)""".stripMargin

  /** [[bpeWencCtesSql]] extended with the per-doc rollup `bpe`
    * (doc_id, n_words, n_bpe) — the oracle twin of
    * [[bpeDocCounts]]. */
  private[operators] lazy val bpeDocCountsCtesSql: String =
    s"""$bpeWencCtesSql,
       |bpe AS (
       |  SELECT doc_id, count(*) AS n_words,
       |    CAST(sum(n_syms) AS BIGINT) AS n_bpe
       |  FROM wenc GROUP BY doc_id)""".stripMargin

  /** Shares the fit CTEs with [[textBpeTrainSql]] via
    * [[bpeFitCtesSql]]; encoding joins v[[BpeMerges]]. */
  lazy val textBpeEncodeSql: String =
    s"""$bpeWencCtesSql
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(n_syms) AS BIGINT) AS n_bpe,
       |  md5(string_agg(wenc, ' | ' ORDER BY pos)) AS enc_md5
       |FROM wenc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  /** DuckDB replay: same dictionary, same per-round argmax, and the
    * merge applied via gaps-and-islands parity selection (positions
    * matching the pair, grouped into consecutive runs, even offsets
    * kept) — the relational equivalent of Spark's greedy fold. Rounds
    * unrolled as CTE blocks, the [[graft.operators.MlOps]] Lloyd-fit
    * pattern. */
  /** Fit prefix shared by [[textBpeTrainSql]] and [[textBpeEncodeSql]]:
    * word dictionary, the unrolled merge rounds, final vocab
    * v[[BpeMerges]]. */
  private lazy val bpeFitCtesSql: String = {
    val rounds = (1 to BpeMerges).map { r =>
      val p = r - 1
      s"""p$r AS (
         |  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT cnt, syms, unnest([i for i in range(1, len(syms))]) AS i
         |        FROM v$p WHERE len(syms) >= 2) z
         |  GROUP BY 1, 2),
         |b$r AS (SELECT a, b, n FROM p$r ORDER BY n DESC, a, b LIMIT 1),
         |e$r AS (
         |  SELECT v.word, v.cnt, generate_subscripts(v.syms, 1) AS i, unnest(v.syms) AS s
         |  FROM v$p v),
         |m$r AS (
         |  SELECT e.*, lead(e.s) OVER (PARTITION BY e.word ORDER BY e.i) AS s2
         |  FROM e$r e),
         |mm$r AS (
         |  SELECT m.*, COALESCE(m.s = b.a AND m.s2 = b.b, FALSE) AS pm
         |  FROM m$r m LEFT JOIN b$r b ON TRUE),
         |sel$r AS (
         |  SELECT word, i FROM (
         |    SELECT word, i,
         |      (i - min(i) OVER (PARTITION BY word, grp)) % 2 AS par
         |    FROM (SELECT word, i,
         |            i - row_number() OVER (PARTITION BY word ORDER BY i) AS grp
         |          FROM mm$r WHERE pm) g) z
         |  WHERE par = 0),
         |v$r AS (
         |  SELECT mm.word, mm.cnt,
         |    list(CASE WHEN sl.i IS NOT NULL THEN mm.s || mm.s2 ELSE mm.s END
         |         ORDER BY mm.i) AS syms
         |  FROM mm$r mm
         |  LEFT JOIN sel$r sl ON sl.word = mm.word AND sl.i = mm.i
         |  LEFT JOIN sel$r sp ON sp.word = mm.word AND sp.i = mm.i - 1
         |  WHERE sp.i IS NULL
         |  GROUP BY mm.word, mm.cnt)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (
       |  SELECT word, count(*) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word
       |    FROM documents WHERE text IS NOT NULL) t
       |  WHERE length(word) >= 1
       |  GROUP BY word),
       |v0 AS (SELECT word, cnt, regexp_extract_all(word, '.') AS syms FROM w),
       |$rounds""".stripMargin
  }
  lazy val textBpeTrainSql: String = {
    val union = (1 to BpeMerges).map(r =>
      s"SELECT CAST($r AS BIGINT) AS rank, a AS sym_a, b AS sym_b, a || b AS merged, n AS pair_n FROM b$r")
      .mkString("\n  UNION ALL ")
    s"""$bpeFitCtesSql
       |  $union
       |ORDER BY rank""".stripMargin
  }

  // ──────────────── unigram-LM tokenizer (SentencePiece-style) ────────────────

  /** Max piece length for [[textUnigramTrain]] — substrings up to 4
    * chars seed the vocabulary and bound the Viterbi DP fan-in. */
  val UniMaxPiece = 4
  /** Seed cap: the top multi-char substrings by weighted count (ties
    * to the lexicographically lower piece) that enter the initial
    * vocabulary; every single character is kept unconditionally so
    * segmentation always completes. */
  val UniSeedMulti = 256
  /** Hard-EM refinement rounds (Viterbi re-segment → usage re-count →
    * prune/re-score) — the [[BpeMerges]] discipline applied to the
    * unigram trainer: enough to exercise pruning and score drift while
    * keeping the unrolled oracle replay tractable. */
  val UniRounds = 2

  /** Effective EM depth: the library knob `spark.graft.uniRounds`,
    * default [[UniRounds]] — the [[bpeDepth]] contract applied to the
    * unigram trainer. The REGISTERED oracles replay the default depth
    * (their CTE chains unroll at class-init), so the driver contract
    * always runs at [[UniRounds]]; the conf is the library-API dial
    * for deeper fits, spec-tested at non-default depths. */
  private[operators] def uniDepth(s: SparkSession): Int = {
    val n = s.conf.get("spark.graft.uniRounds", UniRounds.toString).toInt
    require(n >= 1, s"spark.graft.uniRounds must be >= 1, got $n")
    n
  }

  /** Cost of the unknown-character fallback piece in milli-log2 units:
    * strictly above any reachable real piece cost (≤ 1000·log2(T) <
    * 63000 for any int64 total), so the fallback decides a segmentation
    * only where the vocabulary has no candidate at all. */
  val UniUnkCostMilli = 1000000L

  /** Exact integer surrogate of `1000·log2(x)` for x ≥ 1: the bit
    * length gives the integer part, a linear interpolation between
    * neighboring powers of two the fractional part —
    * `1000·(L−1) + (1000·(x − 2^(L−1))) div 2^(L−1)` with
    * L = len(bin(x)). Monotone in x, error < 0.09 log2 units, and
    * pure int64 on both engines (`bin()`/shift exist in Spark AND
    * DuckDB), so unigram log-probabilities never touch a float —
    * the Padé-log-odds move ([[graft.operators.CurationOps]]) applied
    * where probabilities span orders of magnitude and a saturating
    * rational approximant would tie everything. */
  private def log2mLong(x: Long): Long = {
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val p = 1L << (bl - 1)
    1000L * (bl - 1) + (1000L * (x - p)) / p
  }
  /** [[log2mLong]] as DuckDB SQL over a BIGINT expression. */
  private def log2mSqlDuck(x: String): String = {
    val l = s"(length(bin($x)) - 1)"
    val p = s"(CAST(1 AS BIGINT) << $l)"
    s"(1000 * $l + (1000 * (($x) - $p)) // $p)"
  }

  /** The shared word dictionary (word, cnt) the unigram trainer works
    * on — identical to the BPE trainer's: the corpus collapses to
    * distinct words with counts in ONE aggregation, and every
    * subsequent fit round is dictionary-sized. */
  private def uniDict(s: SparkSession, d: String): DataFrame =
    documents(s, d).filter(col("text").isNotNull)
      .select(explode(toks(col("text"))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Viterbi segmentation as a MAP-SIDE FOLD over the word: the DP
    * array grows one position per step; each step tries the up-to-
    * [[UniMaxPiece]] pieces ending there (vocabulary lookup against
    * the score-map LITERAL — the model is a driver artifact exactly
    * like [[graft.operators.IvfKmeans]] centroid literals, so
    * segmentation is zero-shuffle), and picks the candidate minimizing
    * (Σ cost, piece count, space-joined path) — cost ties broken
    * toward fewer pieces, then the lexicographically lower
    * segmentation, so both engines pick identically. Returns the
    * final dp cell struct (negs = Σ cost_milli, np, path). */
  private[operators] def uniViterbi(scores: Map[String, Long]): org.apache.spark.sql.Column = {
    val m = typedlit(scores)
    val word = col("word")
    val dp = aggregate(
      sequence(lit(1), length(word)),
      array(struct(lit(0L).as("negs"), lit(0L).as("np"), lit("").as("path"))),
      (st, i) => {
        val cands = (1 to UniMaxPiece).map { l =>
          val piece = word.substr(i - lit(l) + lit(1), lit(l))
          val w = try_element_at(m, piece)
          val prev = element_at(st, i - lit(l) + lit(1))
          when(i >= lit(l) && w.isNotNull,
            struct(
              (prev.getField("negs") + w).as("negs"),
              (prev.getField("np") + lit(1L)).as("np"),
              when(prev.getField("np") === lit(0L), piece)
                .otherwise(concat(prev.getField("path"), lit(" "), piece))
                .as("path")))
        }
        // unknown-character fallback: the char itself at a cost no real
        // piece can reach, so it NEVER displaces a vocabulary candidate
        // (real costs are ≤ 1000·log2(T) ≪ UniUnkCostMilli) but keeps
        // the encoder TOTAL — a streamed document with a character the
        // fit never saw segments instead of failing the batch
        val unk = {
          val piece = word.substr(i, lit(1))
          val prev = element_at(st, i)
          struct(
            (prev.getField("negs") + lit(UniUnkCostMilli)).as("negs"),
            (prev.getField("np") + lit(1L)).as("np"),
            when(prev.getField("np") === lit(0L), piece)
              .otherwise(concat(prev.getField("path"), lit(" "), piece))
              .as("path"))
        }
        concat(st, array(element_at(
          array_sort(filter(array(cands :+ unk: _*), c => c.isNotNull)), 1)))
      })
    element_at(dp, length(word) + lit(1))
  }

  /** The unigram FIT: seed from capped substring counts, then
    * [[UniRounds]] hard-EM rounds — Viterbi re-segmentation of the
    * weighted dictionary, usage re-count, pruning of unused multi-char
    * pieces (single chars survive with +1 smoothing so coverage never
    * breaks), score re-estimation. Returns the final model (piece →
    * cnt), its scores, and the cached dictionary (caller unpersists).
    * Per-round work is dictionary-sized: one map-side fold pass + one
    * vocab-sized usage aggregate; the model itself is a driver scalar
    * artifact, never a join input. */
  private def uniFit(s: SparkSession, d: String)
      : (Seq[(String, Long)], Map[String, Long], DataFrame) = {
    import s.implicits._
    val dict = uniDict(s, d).cache()
    val seeds = dict.select($"cnt", explode(expr(
        s"""flatten(transform(sequence(1, length(word)), st ->
           |  transform(sequence(st, least(st + ${UniMaxPiece - 1}, length(word))), en ->
           |    substring(word, st, en - st + 1))))""".stripMargin)).as("piece"))
      .groupBy($"piece").agg(sum($"cnt").as("cnt"))
      .cache()
    // two collects, deliberately: a one-job union of the two slices
    // was tried in r19 and REVERTED — both subtrees scan the seeds
    // cache inside the same job, racing to fill it (uniFit consumers
    // measured up to ~0.9 s slower); with two jobs the first collect
    // fills the cache and the second reads it
    val singles = seeds.filter(length($"piece") === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val multi = seeds.filter(length($"piece") >= 2)
      .orderBy($"cnt".desc, $"piece").limit(UniSeedMulti)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    seeds.unpersist()
    var model: Seq[(String, Long)] = (singles ++ multi).toSeq
    def scoresOf(md: Seq[(String, Long)]): Map[String, Long] = {
      val t = md.map(_._2).sum
      md.map { case (p, c) => p -> (log2mLong(t) - log2mLong(c)) }.toMap
    }
    var sc = scoresOf(model)
    for (_ <- 1 to uniDepth(s)) {
      val usage = dict.withColumn("seg", uniViterbi(sc))
        .select($"cnt", explode(split($"seg".getField("path"), " ")).as("piece"))
        .groupBy($"piece").agg(sum($"cnt").as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      model = model.flatMap { case (p, _) =>
        if (p.length == 1) Some(p -> (usage.getOrElse(p, 0L) + 1L))
        else usage.get(p).map(p -> _)
      }
      sc = scoresOf(model)
    }
    (model, sc, dict)
  }

  /** Unigram-LM tokenizer TRAINING (Kudo 2018, the SentencePiece
    * sibling of [[textBpeTrain]]): seed vocabulary from capped
    * substring counts, hard-EM prune rounds over the distinct-word
    * dictionary, and the final piece table (piece, size, usage count,
    * integer-milli log2 cost, rank) — the model artifact a pipeline
    * ships next to the corpus. Scale shape matches [[textBpeTrain]]
    * exactly: one corpus scan to the dictionary, then every round is
    * dictionary-sized with the model living on the driver. */
  def textUnigramTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val (model, sc, dict) = uniFit(s, d)
    dict.unpersist()
    val rows = model.map { case (p, c) => (p, p.length.toLong, c, sc(p)) }
    s.createDataFrame(rows).toDF("piece", "n_chars", "cnt", "cost_milli")
      .withColumn("rank",
        row_number().over(Window.orderBy($"cnt".desc, $"piece")).cast("long"))
      .orderBy($"rank")
  }

  /** Unigram ENCODING — the inference side of [[textUnigramTrain]]:
    * Viterbi-segment every document with the final model and report
    * per-doc word/piece counts plus an md5 of the full segmentation
    * stream (pieces joined by ' ' within a word, words by ' | ' in
    * position order — the [[textBpeEncode]] contract). The corpus
    * re-tokenizes through a join against the dictionary-sized
    * (word → segmentation) table; raw text is scanned once. */
  /** The per-doc encode rollup — ONE definition of (n_words, n_pieces,
    * enc_md5) under the batch encoder AND the stream twin, so the
    * stream==batch contract (and the shared oracle) is structural, not
    * two hand-synced copies. Input: (doc_id, pos, n_syms, wenc). */
  private def uniDocRollup(enc: DataFrame): DataFrame =
    enc.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_pieces"),
        md5(concat_ws(" | ",
          array_sort(collect_list(struct(col("pos"), col("wenc"))))
            .getField("wenc"))).as("enc_md5"))

  def textUnigramEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (_, sc, dict) = uniFit(s, d)
    val vocab = dict.withColumn("seg", uniViterbi(sc))
      .select($"word", $"seg".getField("np").as("n_syms"),
        $"seg".getField("path").as("wenc"))
    val words = documents(s, d).filter($"text".isNotNull)
      .select($"doc_id", posexplode(toks($"text")).as(Seq("pos", "word")))
    val out = uniDocRollup(words.join(vocab, "word")).orderBy($"doc_id")
    // release the fit cache now; evaluation recomputes the (determin-
    // istic) dictionary lineage once — the textBpeEncode contract, and
    // no cache outlives the call
    dict.unpersist()
    out
  }

  /** The trained unigram tokenizer DEPLOYED on the live ingest stream —
    * "fit offline on yesterday's corpus, tokenize documents as they
    * arrive", the serving half of [[textUnigramEncode]] and the
    * tokenizer sibling of [[graft.operators.CurationOps]]'s NB stream
    * deploy. The model ([[uniFit]]'s piece scores) is fit ONCE as a
    * batch job and rides every micro-batch as an expression LITERAL —
    * no stream-static join against a fitted table, no state store, no
    * watermark; docs never span micro-batches so the rollup is exact.
    * Within a batch the DP runs once per DISTINCT word and joins back
    * to occurrences (the batch encoder's dictionary discipline —
    * per-occurrence evaluation re-paid the word-length × vocab-scan
    * DP for every repeat and measured 9× slower at sf0.1). The
    * [[UniUnkCostMilli]] fallback keeps the
    * encoder TOTAL: a streamed document carrying a character the fit
    * never saw still segments (char-at-penalty) instead of failing the
    * batch — the novel-input case a deployed tokenizer MUST survive
    * that the batch op's corpus-fit coverage never exercises. Output
    * (and oracle) are [[textUnigramEncode]]'s exactly. */
  def textStreamUnigram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (_, sc, dict) = uniFit(s, d)
    dict.unpersist()
    val seg = uniViterbi(sc)
    val tmp = java.nio.file.Files.createTempDirectory("graft_unisink").toString
    // size the per-batch rollup shuffle to the input, not the batch
    // default (the docStreamQualityNb posture; set before start)
    val partsKey = "spark.sql.shuffle.partitions"
    val prevParts = s.conf.get(partsKey)
    s.conf.set(partsKey,
      EventOps.streamParts(s, d, table = "documents").toString)
    val served = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = graft.Tables.streamTable(s, d, "documents").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        served.incrementAndGet()
        val wds = batch.filter(col("text").isNotNull)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
          .filter(length(col("word")) >= 1)
        val vocabB = wds.select(col("word")).distinct()
          .withColumn("seg", seg)
          .select(col("word"), col("seg").getField("np").as("n_syms"),
            col("seg").getField("path").as("wenc"))
        uniDocRollup(wds.join(vocabB, "word"))
          .write.mode("append").parquet(tmp)
        ()
      }
      .start()
    try q.processAllAvailable()
    finally { q.stop(); s.conf.set(partsKey, prevParts) }
    // fail fast with a pointed message rather than the opaque
    // schema-inference error parquet-reading an empty sink dir throws
    // when the streaming source matched no files (the dedup_stream_near
    // / doc_rag_stream guard)
    require(served.get() > 0L,
      s"text_stream_unigram: no micro-batch fired — streaming source at " +
        s"$d/documents.parquet matched no files")
    // landed files ARE the output at scale — register for JVM-exit
    // cleanup rather than deleting (the docStreamQuality contract)
    val p = new org.apache.hadoop.fs.Path(tmp)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).deleteOnExit(p)
    s.read.parquet(tmp).orderBy($"doc_id")
  }

  /** Per-document unigram length (doc_id, n_words, n_uni) from the
    * shared [[uniFit]] — the [[bpeDocCounts]] twin for the unigram
    * model, feeding the fertility meter. Same inner-join contract:
    * docs with no non-empty word produce no row. */
  private[operators] def uniDocCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (_, sc, dict) = uniFit(s, d)
    val vocab = dict.withColumn("seg", uniViterbi(sc))
      .select($"word", $"seg".getField("np").as("n_syms"))
    val words = documents(s, d).filter($"text".isNotNull)
      .select($"doc_id", explode(toks($"text")).as("word"))
    val out = words.join(vocab, "word")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"), sum($"n_syms").as("n_uni"))
    dict.unpersist() // recompute-on-evaluation, no cache outlives the call
    out
  }

  /** Tokenizer FERTILITY comparison — pieces-per-word for the trained
    * BPE vs the trained unigram model, per source, in integer ppm: the
    * table a pipeline reads to pick its tokenizer (fertility is the
    * standard cross-tokenizer efficiency metric — a domain where one
    * model needs 40% more pieces pays 40% more context budget for the
    * same text). Both fits are the library's own trainers via their
    * shared doc-count rollups ([[bpeDocCounts]] / [[uniDocCounts]]),
    * so the meter can never drift from what the encoders emit. The
    * ppm arithmetic runs in int128 (decimal/HUGEINT — the padeExpr
    * lift) since 1e6·token-count overflows int64 at a ~1e14-token
    * corpus. Shape: two dictionary-sized fits + two corpus-linear
    * re-tokenize joins, rolled up to a sources-sized table. */
  def textTokenizerFertility(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = documents(s, d).filter($"text".isNotNull)
      .select($"doc_id", $"source")
    val bpe = bpeDocCounts(s, d).select($"doc_id", $"n_words", $"n_bpe")
    val uni = uniDocCounts(s, d).select($"doc_id", $"n_uni")
    src.join(bpe, "doc_id").join(uni, "doc_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_words").as("n_words"),
        sum($"n_bpe").as("n_bpe"),
        sum($"n_uni").as("n_unigram"))
      .select($"source", $"n_docs", $"n_words", $"n_bpe", $"n_unigram",
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * n_bpe) div n_words AS BIGINT)")
          .as("bpe_fert_ppm"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * n_unigram) div n_words AS BIGINT)")
          .as("uni_fert_ppm"))
      .orderBy($"source")
  }
  lazy val textTokenizerFertilitySql: String =
    s"""$bpeDocCountsCtesSql,
       |$uniEncCtesBody,
       |uenc AS (
       |  SELECT u.doc_id, count(*) AS n_words,
       |    CAST(sum(v.seg.np) AS BIGINT) AS n_uni
       |  FROM uwp u JOIN uv${UniRounds + 1} v USING (word)
       |  GROUP BY u.doc_id)
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(b.n_words) AS BIGINT) AS n_words,
       |  CAST(sum(b.n_bpe) AS BIGINT) AS n_bpe,
       |  CAST(sum(u.n_uni) AS BIGINT) AS n_unigram,
       |  CAST((CAST(1000000 AS HUGEINT) * CAST(sum(b.n_bpe) AS HUGEINT))
       |    // CAST(sum(b.n_words) AS HUGEINT) AS BIGINT) AS bpe_fert_ppm,
       |  CAST((CAST(1000000 AS HUGEINT) * CAST(sum(u.n_uni) AS HUGEINT))
       |    // CAST(sum(b.n_words) AS HUGEINT) AS BIGINT) AS uni_fert_ppm
       |FROM documents d
       |JOIN bpe b ON b.doc_id = d.doc_id
       |JOIN uenc u ON u.doc_id = d.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** One Viterbi pass as a DuckDB CTE: the EXACT fold shape of
    * [[uniViterbi]] replayed with `list_reduce` (the initial dp cell
    * rides as the list head since DuckDB 1.0's reduce takes no seed;
    * the position index is recovered as len(acc)), same candidate
    * guard, same (cost, piece count, path) tie order via struct
    * list_sort. `scMap` must expose the score map as column `m`. */
  private def uniViterbiCteSql(out: String, scMap: String, src: String): String = {
    val ls = (1 to UniMaxPiece).mkString(", ")
    s"""$out AS (
       |  SELECT word, cnt, list_reduce(
       |    [[{'negs': CAST(0 AS BIGINT), 'np': CAST(0 AS BIGINT), 'path': ''}]] ||
       |      [[{'negs': CAST(0 AS BIGINT), 'np': CAST(0 AS BIGINT), 'path': ''}]
       |       for i in range(length(word))],
       |    (acc, x) -> acc || [list_sort(list_filter([
       |      CASE WHEN len(acc) >= L AND m[substr(word, len(acc)-L+1, L)][1] IS NOT NULL THEN
       |        {'negs': acc[len(acc)-L+1].negs + m[substr(word, len(acc)-L+1, L)][1],
       |         'np': acc[len(acc)-L+1].np + 1,
       |         'path': CASE WHEN acc[len(acc)-L+1].np = 0 THEN substr(word, len(acc)-L+1, L)
       |                      ELSE acc[len(acc)-L+1].path || ' ' || substr(word, len(acc)-L+1, L) END}
       |      END for L in [$ls]] ||
       |      [{'negs': acc[len(acc)].negs + $UniUnkCostMilli,
       |        'np': acc[len(acc)].np + 1,
       |        'path': CASE WHEN acc[len(acc)].np = 0 THEN substr(word, len(acc), 1)
       |                     ELSE acc[len(acc)].path || ' ' || substr(word, len(acc), 1) END}],
       |      c -> c IS NOT NULL))[1]
       |    ])[length(word)+1] AS seg
       |  FROM $src, $scMap)""".stripMargin
  }

  /** The full fit replay shared by [[textUnigramTrainSql]],
    * [[textUnigramEncodeSql]] and the fertility meter: dictionary,
    * capped seed vocabulary, and [[UniRounds]] unrolled EM rounds
    * ending in up/uw/usc$UniRounds — one definition, so trainer and
    * encoder cannot drift. Every CTE is `u`-prefixed so the chain
    * composes with the BPE fit CTEs in a single oracle query
    * (the two share no names). Exposed WITHOUT the leading `WITH` so
    * callers can prepend other chains. */
  private lazy val uniFitCtesBody: String = {
    val rounds = (1 to UniRounds).map { r =>
      val p = r - 1
      s"""${uniViterbiCteSql(s"uv$r", s"usc$p", "udict")},
         |uu$r AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS u FROM (
         |          SELECT cnt, unnest(string_split(seg.path, ' ')) AS piece FROM uv$r) z
         |        GROUP BY piece),
         |up$r AS (
         |  SELECT p.piece,
         |    CAST(CASE WHEN length(p.piece) = 1 THEN COALESCE(u.u, 0) + 1
         |         ELSE u.u END AS BIGINT) AS cnt
         |  FROM up$p p LEFT JOIN uu$r u USING (piece)
         |  WHERE length(p.piece) = 1 OR COALESCE(u.u, 0) > 0),
         |ut$r AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM up$r),
         |uw$r AS (SELECT piece, CAST(${log2mSqlDuck("t")} - ${log2mSqlDuck("cnt")} AS BIGINT) AS w
         |        FROM up$r, ut$r),
         |usc$r AS (SELECT map(list(piece ORDER BY piece), list(w ORDER BY piece)) AS m FROM uw$r)""".stripMargin
    }.mkString(",\n")
    s"""udict AS (
       |  SELECT word, count(*) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word
       |    FROM documents WHERE text IS NOT NULL) t
       |  WHERE length(word) >= 1
       |  GROUP BY word),
       |usst AS (SELECT word, cnt, unnest(range(1, length(word)+1)) AS st FROM udict),
       |usse AS (SELECT cnt, substr(word, st, ln) AS piece FROM (
       |          SELECT word, cnt, st,
       |            unnest(range(1, least($UniMaxPiece, length(word)-st+1)+1)) AS ln
       |          FROM usst) z),
       |useeds AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt FROM usse GROUP BY piece),
       |up0 AS (
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
       |    FROM useeds WHERE length(piece) >= 2) z
       |  WHERE rk <= $UniSeedMulti
       |  UNION ALL
       |  SELECT piece, cnt FROM useeds WHERE length(piece) = 1),
       |ut0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM up0),
       |uw0 AS (SELECT piece, CAST(${log2mSqlDuck("t")} - ${log2mSqlDuck("cnt")} AS BIGINT) AS w
       |       FROM up0, ut0),
       |usc0 AS (SELECT map(list(piece ORDER BY piece), list(w ORDER BY piece)) AS m FROM uw0),
       |$rounds""".stripMargin
  }
  /** [[uniFitCtesBody]] plus the FINAL Viterbi pass (`uv${UniRounds+1}`
    * with the round-[[UniRounds]] scores) and the per-word-position
    * explode (`uwp`) — the encode prefix, also shared with the
    * fertility meter. */
  private lazy val uniEncCtesBody: String =
    s"""$uniFitCtesBody,
       |${uniViterbiCteSql(s"uv${UniRounds + 1}", s"usc$UniRounds", "udict")},
       |uwp AS (
       |  SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS word
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM documents WHERE text IS NOT NULL) t)""".stripMargin
  lazy val textUnigramTrainSql: String =
    s"""WITH $uniFitCtesBody
       |SELECT p.piece, CAST(length(p.piece) AS BIGINT) AS n_chars, p.cnt,
       |  w.w AS cost_milli,
       |  CAST(row_number() OVER (ORDER BY p.cnt DESC, p.piece) AS BIGINT) AS rank
       |FROM up$UniRounds p JOIN uw$UniRounds w USING (piece)
       |ORDER BY rank""".stripMargin
  lazy val textUnigramEncodeSql: String =
    s"""WITH $uniEncCtesBody
       |SELECT u.doc_id, count(*) AS n_words,
       |  CAST(sum(v.seg.np) AS BIGINT) AS n_pieces,
       |  md5(string_agg(v.seg.path, ' | ' ORDER BY u.pos)) AS enc_md5
       |FROM uwp u JOIN uv${UniRounds + 1} v USING (word)
       |GROUP BY u.doc_id ORDER BY doc_id""".stripMargin

  /** [[log2mLong]] as Spark SQL over a BIGINT expression — the
    * in-plan twin of [[log2mSqlDuck]] for scores that must be computed
    * per ROW (corpus-side LM costs) rather than on the driver. */
  private def log2mSqlSpark(x: String): String = {
    val l = s"(length(bin($x)) - 1)"
    val p = s"shiftleft(1L, $l)"
    s"(1000L * $l + (1000L * (($x) - $p)) div $p)"
  }

  /** Perplexity BUCKETING (the CCNet head/middle/tail move, Wenzek et
    * al. 2020): score every document by a corpus bigram LM and cut
    * per-source fluency tertiles — the standard curation signal a
    * hand-rule quality gate cannot express (fluency is distributional,
    * not lexical). The LM cost is EXACT integer milli-log2:
    * per adjacent token pair, cost = log2m(c(prev)+V) −
    * log2m(c(prev,w)+1) ≥ 0 (Laplace-smoothed bigram surprisal via
    * [[log2mLong]]'s bit-length interpolation — no float ln crosses
    * the oracle); doc score = Σcost div n_bigrams, i.e. milli-bits per
    * token, a monotone perplexity surrogate. Bucket = ntile(3) per
    * source ordered by (score, doc_id): 'head' = most fluent.
    *
    * Scale shape: bigram/unigram count tables are one
    * partially-aggregated corpus scan each (vocab-sized out); the
    * score pass joins doc bigrams to those tables on the gram key —
    * corpus-linear inverted-index discipline, AQE-broadcast when the
    * vocab is small, plain shuffle join when it is not; the tertile
    * window partitions per source, never a global sort. Docs with
    * fewer than 2 tokens carry no bigram and are excluded on both
    * engines. */
  def textPplBucket(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toksOf = documents(s, d).filter($"text".isNotNull)
      .select($"doc_id", $"source", toks($"text").as("ws"))
      .filter(size($"ws") >= 2)
    val db = toksOf.select($"doc_id", $"source", explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS pw, ws[i+1] AS w))"))
        .as("b"))
      .select($"doc_id", $"source", $"b.pw".as("pw"), $"b.w".as("w"))
    // the LM count table derives FROM the doc-bigram frame (one corpus
    // explode feeds both, exactly like the oracle's CTE shape)
    val big = db.groupBy($"pw", $"w").agg(count(lit(1)).as("cb"))
    val uni = documents(s, d).filter($"text".isNotNull)
      .select(explode(toks($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cu"))
    val v = uni.count() // vocab size — the Laplace denominator constant
    val scored = db
      .join(big, Seq("pw", "w"), "left") // every doc bigram IS in the corpus LM; left keeps the claim checkable
      .join(uni.withColumnRenamed("w", "pw"), Seq("pw"))
      .withColumn("cost", expr(
        s"${log2mSqlSpark(s"cu + ${v}L")} - ${log2mSqlSpark("cb + 1L")}"))
      .groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("n_bigrams"), sum($"cost").as("sum_cost"))
      .withColumn("ppl_milli", expr("sum_cost div n_bigrams"))
    val w3 = Window.partitionBy($"source").orderBy($"ppl_milli", $"doc_id")
    scored
      .withColumn("t", ntile(3).over(w3))
      .select($"doc_id", $"source", $"n_bigrams", $"ppl_milli",
        when($"t" === 1, "head").when($"t" === 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy($"doc_id")
  }
  lazy val textPplBucketSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS ws
       |  FROM documents WHERE text IS NOT NULL),
       |tk2 AS (SELECT doc_id, source, ws FROM tok WHERE len(ws) >= 2),
       |db AS (
       |  SELECT doc_id, source,
       |    unnest([{'pw': ws[i], 'w': ws[i+1]} for i in range(1, len(ws))], recursive := true)
       |  FROM tk2),
       |big AS (SELECT pw, w, CAST(count(*) AS BIGINT) AS cb FROM db GROUP BY 1, 2),
       |uni AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS cu FROM (
       |    SELECT unnest(ws) AS w FROM tok) z GROUP BY w),
       |vt AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
       |costs AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(${log2mSqlDuck("u.cu + vt.v")} - ${log2mSqlDuck("b.cb + 1")} AS BIGINT) AS cost
       |  FROM db d
       |  LEFT JOIN big b ON b.pw = d.pw AND b.w = d.w
       |  JOIN uni u ON u.w = d.pw
       |  CROSS JOIN vt),
       |scored AS (
       |  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(cost) AS BIGINT) // count(*) AS ppl_milli
       |  FROM costs GROUP BY 1, 2),
       |bucketed AS (
       |  SELECT doc_id, source, n_bigrams, CAST(ppl_milli AS BIGINT) AS ppl_milli,
       |    ntile(3) OVER (PARTITION BY source ORDER BY ppl_milli, doc_id) AS t
       |  FROM scored)
       |SELECT doc_id, source, n_bigrams, ppl_milli,
       |  CASE WHEN t = 1 THEN 'head' WHEN t = 2 THEN 'middle' ELSE 'tail' END AS bucket
       |FROM bucketed ORDER BY doc_id""".stripMargin

  /** Corpus n-gram LM counts: token bigrams and trigrams, top 25 per
    * order by frequency — the count table a KenLM-style quality or
    * perplexity filter is built from. Same inverted-index shape as the
    * shingle ops (map-side expansion, one count shuffle), then one
    * row_number window over the 2-row `n` partition space — the window
    * runs on catalog-sized data (distinct grams), never on the corpus. */
  def textNgramLm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // docs shorter than k tokens are dropped BEFORE the sequence expr:
    // sequence(0, negative) would generate a descending range (and
    // out-of-bounds subscripts), not an empty one
    def grams(k: Int) = documents(s, d)
      .select(toks($"text").as("ws"))
      .filter(size($"ws") >= k)
      .select(explode(expr(
        s"transform(sequence(0, size(ws) - $k), i -> concat_ws(' ', " +
          (0 until k).map(j => s"ws[i+$j]").mkString(", ") + "))"))
        .as("gram"))
      .select(lit(k.toLong).as("n_order"), $"gram")
    val counted = grams(2).union(grams(3))
      .groupBy($"n_order", $"gram").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"n_order").orderBy($"n".desc, $"gram")
    counted.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 25)
      .select($"n_order", $"gram", $"n", $"rank".cast("long").as("rank"))
      .orderBy($"n_order", $"rank")
  }
  val textNgramLmSql: String =
    """WITH tok AS (SELECT string_split(text, ' ') AS ws FROM documents),
      |g2 AS (SELECT 2 AS n_order,
      |         unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS gram
      |       FROM tok),
      |g3 AS (SELECT 3 AS n_order,
      |         unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                 for i in range(1, len(ws) - 1)]) AS gram
      |       FROM tok),
      |counted AS (
      |  SELECT n_order, gram, count(*) AS n
      |  FROM (SELECT * FROM g2 UNION ALL SELECT * FROM g3)
      |  GROUP BY n_order, gram),
      |ranked AS (
      |  SELECT CAST(n_order AS BIGINT) AS n_order, gram, n,
      |    CAST(row_number() OVER (PARTITION BY n_order ORDER BY n DESC, gram)
      |      AS BIGINT) AS rank
      |  FROM counted)
      |SELECT n_order, gram, n, rank FROM ranked
      |WHERE rank <= 25 ORDER BY n_order, rank""".stripMargin

  /** TF-IDF top-5 terms per document, with the idf weighting kept in
    * INTEGER space: score = tf·1e6 div df — order-equivalent to tf/df
    * for ranking within a document (where tf·N/df ∝ tf·idf up to the
    * shared log shape), and bit-identical across engines where a
    * float log() would not be. Inverted-index shape: one shuffle for
    * per-doc term counts, one for document frequencies (vocab-sized —
    * the join back is a vocab-table join AQE can broadcast), then a
    * per-doc top-5 window. At 100 TB nothing here is corpus²: every
    * intermediate is corpus-linear or vocab-sized. */
  def docTfidfTopk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val terms = documents(s, d)
      .select($"doc_id", explode(toks($"text")).as("token"))
    val tf = terms.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df = terms.distinct().groupBy($"token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id")
      .orderBy(col("score").desc, $"token")
    tf.join(df, "token")
      .withColumn("score", expr("(1000000L * tf) div df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"doc_id", $"rank", $"token", $"tf", $"df", $"score")
      .orderBy($"doc_id", $"rank")
  }
  val docTfidfTopkSql: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM terms GROUP BY 1, 2),
      |df AS (SELECT token, count(*) AS df
      |       FROM (SELECT DISTINCT doc_id, token FROM terms) GROUP BY token),
      |scored AS (
      |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
      |    (1000000 * tf.tf) // df.df AS score
      |  FROM tf JOIN df USING (token)),
      |ranked AS (
      |  SELECT doc_id, token, tf, df, score,
      |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token)
      |      AS BIGINT) AS rank
      |  FROM scored)
      |SELECT doc_id, rank, token, tf, df, score FROM ranked
      |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin

  def textGopherRules(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = toks($"text")
    val flag = (c: org.apache.spark.sql.Column) => when(c, 1L).otherwise(0L)
    documents(s, d)
      .filter($"text".isNotNull) // family-wide NULL-text guard, see textStats
      .select($"doc_id",
        size(t).cast("long").as("n_words"),
        length(regexp_replace($"text", " ", "")).cast("long").as("word_chars"),
        size(filter(t, c => c.rlike("[A-Za-z]"))).cast("long").as("n_alpha"),
        size(filter(t, c => c.endsWith("..."))).cast("long").as("n_ellipsis"),
        (length($"text") - length(regexp_replace($"text", "#", "")))
          .cast("long").as("n_hash"),
        size(filter(t, c => c.isInCollection(stopwords))).cast("long").as("n_stop"))
      .select($"doc_id", $"n_words",
        flag($"n_words" >= 50L && $"n_words" <= 100000L).as("f_wordcount"),
        flag($"word_chars" >= lit(3L) * $"n_words" &&
          $"word_chars" <= lit(10L) * $"n_words").as("f_meanlen"),
        flag(lit(5L) * $"n_alpha" >= lit(4L) * $"n_words").as("f_alpha"),
        flag(lit(10L) * $"n_ellipsis" <= lit(3L) * $"n_words").as("f_ellipsis"),
        flag(lit(10L) * $"n_hash" <= $"n_words").as("f_symbol"),
        flag($"n_stop" >= 2L).as("f_stop"))
      .withColumn("keep",
        flag($"f_wordcount" + $"f_meanlen" + $"f_alpha" + $"f_ellipsis" +
          $"f_symbol" + $"f_stop" === 6L))
      .orderBy($"doc_id")
  }
  val textGopherRulesSql: String = {
    val sw = stopwords.map("'" + _ + "'").mkString(", ")
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
       |    CAST(length(replace(text,' ','')) AS BIGINT) AS word_chars,
       |    CAST(len(list_filter(string_split(text,' '),
       |      w -> regexp_matches(w,'[A-Za-z]'))) AS BIGINT) AS n_alpha,
       |    CAST(len(list_filter(string_split(text,' '),
       |      w -> suffix(w,'...'))) AS BIGINT) AS n_ellipsis,
       |    CAST(length(text) - length(replace(text,'#','')) AS BIGINT) AS n_hash,
       |    CAST(len(list_filter(string_split(text,' '),
       |      w -> w IN ($sw))) AS BIGINT) AS n_stop
       |  FROM documents WHERE text IS NOT NULL),
       |f AS (
       |  SELECT doc_id, n_words,
       |    CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS f_wordcount,
       |    CAST(CASE WHEN word_chars BETWEEN 3*n_words AND 10*n_words THEN 1 ELSE 0 END AS BIGINT) AS f_meanlen,
       |    CAST(CASE WHEN 5*n_alpha >= 4*n_words THEN 1 ELSE 0 END AS BIGINT) AS f_alpha,
       |    CAST(CASE WHEN 10*n_ellipsis <= 3*n_words THEN 1 ELSE 0 END AS BIGINT) AS f_ellipsis,
       |    CAST(CASE WHEN 10*n_hash <= n_words THEN 1 ELSE 0 END AS BIGINT) AS f_symbol,
       |    CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS f_stop
       |  FROM m)
       |SELECT doc_id, n_words, f_wordcount, f_meanlen, f_alpha, f_ellipsis,
       |  f_symbol, f_stop,
       |  CAST(CASE WHEN f_wordcount + f_meanlen + f_alpha + f_ellipsis +
       |    f_symbol + f_stop = 6 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** In-domain LM coverage score: the fraction (integer ppm — the
    * repo's float-free contract after the `text_dup_ratio` lesson) of
    * each document's bigram OCCURRENCES that fall inside the corpus's
    * top-100 bigram table — the cheap KenLM-perplexity proxy used to
    * score how "in-domain" a document is against a reference corpus
    * LM before a float log-prob model exists.
    *
    * Shape: one count shuffle induces the LM (distinct-bigram-sized,
    * never corpus-sized), a global sort-LIMIT takes the top-100
    * (TakeOrderedAndProject — per-partition top-k then a 100-row
    * driver merge, no full sort), and the scoring join is doc-bigrams
    * × a 100-row table, which AQE broadcasts at any corpus size. The
    * top-k tie-break is total (count DESC, gram) so both engines cut
    * the same 100 rows. Docs with < 2 tokens have no bigrams and are
    * excluded — mirrored by the SQL's len(ws) >= 2 guard. */
  def textLmCoverage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bi = documents(s, d)
      .select($"doc_id", toks($"text").as("ws"))
      .filter(size($"ws") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> concat_ws(' ', ws[i], ws[i+1]))"))
        .as("g"))
    val lm = bi.groupBy($"g").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"g").limit(100)
      .select($"g", lit(1L).as("hit"))
    bi.join(lm, Seq("g"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        coalesce(sum($"hit"), lit(0L)).as("n_in_lm"))
      .withColumn("coverage_ppm", expr("(1000000L * n_in_lm) div n_bigrams"))
      .orderBy($"doc_id")
  }
  val textLmCoverageSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |bi AS (SELECT doc_id,
      |         unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS g
      |       FROM tok WHERE len(ws) >= 2),
      |lm AS (SELECT g FROM (SELECT g, count(*) AS n FROM bi GROUP BY g)
      |       ORDER BY n DESC, g LIMIT 100),
      |sc AS (SELECT b.doc_id, count(*) AS n_bigrams,
      |         CAST(count(lm.g) AS BIGINT) AS n_in_lm
      |       FROM bi b LEFT JOIN lm ON lm.g = b.g GROUP BY 1)
      |SELECT doc_id, n_bigrams, n_in_lm,
      |  (1000000 * n_in_lm) // n_bigrams AS coverage_ppm
      |FROM sc ORDER BY doc_id""".stripMargin

  /** Vocabulary size for [[textEncodeIds]] — the induced id space a
    * trainer's embedding table would be sized to. */
  val EncodeVocab = 64

  /** Tokenizer APPLY — the step after vocab induction
    * ([[textBpePairs]] counts the merges, this encodes with the
    * result): map every document to its id sequence under the corpus's
    * top-[[EncodeVocab]] token vocabulary (ids 1..V by count-DESC,
    * token-ASC rank; out-of-vocabulary → 0), the preprocessing that
    * feeds [[CurationOps.docPackManifest]]-style packing. Ids are
    * emitted as a space-joined STRING: engines render list columns
    * differently, while a string is comparator-proof (the repo's
    * float-free-contract logic applied to arrays).
    *
    * Shape: the vocab is distinct-token-sized → top-V via
    * TakeOrderedAndProject (per-partition top-k, V-row driver merge);
    * encoding is posexplode → broadcast-sized join against the V-row
    * vocab → one groupBy(doc_id) re-assembly whose sort_array puts
    * positions back in order — two shuffles over token rows,
    * corpus-linear. (Both engines split "" to [""], so even an empty
    * doc encodes — to the single id of the empty-string token.) */
  def textEncodeIds(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tok = documents(s, d)
      .select($"doc_id", posexplode(toks($"text")).as(Seq("pos", "t")))
    val vocab = tok
      .groupBy($"t").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"t").limit(EncodeVocab)
      .select($"t", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"n".desc, $"t"))
        .cast("long").as("id"))
    val agg = tok.join(vocab, Seq("t"), "left")
      .select($"doc_id", $"pos", coalesce($"id", lit(0L)).as("id"))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when($"id" === 0L, 1L).otherwise(0L)).cast("long").as("n_oov"),
        concat_ws(" ", expr(
          "transform(sort_array(collect_list(struct(pos, id))), x -> CAST(x.id AS STRING))"))
          .as("ids_str"))
    // Defensive left join back to documents on BOTH sides (the oracle
    // always had it): a doc whose tokenization is empty (NULL text —
    // posexplode emits no row) must surface as (0, 0, '') rather than
    // be dropped on exactly one engine.
    documents(s, d).select($"doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_tokens", lit(0L)).as("n_tokens"),
        coalesce($"n_oov", lit(0L)).as("n_oov"),
        coalesce($"ids_str", lit("")).as("ids_str"))
      .orderBy($"doc_id")
  }
  val textEncodeIdsSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t,
       |    generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents),
       |vocab AS (
       |  SELECT t, CAST(row_number() OVER (ORDER BY n DESC, t) AS BIGINT) AS id
       |  FROM (SELECT t, count(*) AS n FROM tok GROUP BY t
       |        ORDER BY n DESC, t LIMIT $EncodeVocab) z),
       |enc AS (
       |  SELECT tok.doc_id, tok.pos, COALESCE(vocab.id, 0) AS id
       |  FROM tok LEFT JOIN vocab USING (t)),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |    string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos) AS ids_str
       |  FROM enc GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(a.n_tokens, 0) AS n_tokens,
       |  COALESCE(a.n_oov, 0) AS n_oov,
       |  COALESCE(a.ids_str, '') AS ids_str
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Feature-hashed linear quality score — the fastText-style
    * classifier shape (hash token → bucket, score = Σ weight[bucket])
    * in pure integer arithmetic: bucket = the first md5 BYTE of the
    * token (0..255, cross-engine via nibble decode), weight =
    * (bucket % 7) − 3, a deterministic stand-in for trained weights
    * (the container has no model artifacts; the PLUMBING — hashing,
    * bucketing, map-side scoring — is the part that must be right at
    * 100 TB). Pure map-side over exploded tokens + one doc_id rollup;
    * no vocabulary table at all, which is the point of the hashing
    * trick: memory is O(buckets), not O(vocab). NULL-text docs surface
    * as (0, 0) through the defensive documents join, same contract as
    * [[textEncodeIds]]. */
  def textHashFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tok = documents(s, d)
      .select($"doc_id", explode(toks($"text")).as("t"))
      .withColumn("bucket", conv(substring(md5($"t"), 1, 2), 16, 10).cast("long"))
      .withColumn("wt", $"bucket" % 7L - 3L)
    val agg = tok.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"wt").as("score"))
    documents(s, d).select($"doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_tokens", lit(0L)).as("n_tokens"),
        coalesce($"score", lit(0L)).as("score"))
      .orderBy($"doc_id")
  }
  val textHashFeaturesSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |sc AS (
      |  SELECT doc_id,
      |    (16 * (strpos('0123456789abcdef', substr(md5(t), 1, 1)) - 1)
      |        + (strpos('0123456789abcdef', substr(md5(t), 2, 1)) - 1)) AS bucket
      |  FROM tok),
      |agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(sum(bucket % 7 - 3) AS BIGINT) AS score
      |  FROM sc GROUP BY doc_id)
      |SELECT d.doc_id,
      |  COALESCE(a.n_tokens, 0) AS n_tokens,
      |  COALESCE(a.score, 0) AS score
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** Per-eval-document contamination measurement — the inverse view of
    * [[CurationOps.dedupDecontaminate]]: instead of dropping dirty
    * TRAINING docs, report for each held-out doc (doc_id % 50 = 0, the
    * same stand-in benchmark) what fraction (integer ppm) of its
    * distinct word-5-grams appear anywhere in the training side. This
    * is the eval-integrity report a lab publishes next to benchmark
    * numbers. Shape: the eval shingle stream (benchmark-sized, small
    * by construction) left-joins the distinct training-gram index on
    * the gram — one shuffle on g, corpus-linear to build the index;
    * everything after is eval-sized. Docs too short for a 5-gram are
    * absent identically on both engines (built from the same shingle
    * stream). */
  def textEvalOverlap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    val sh = documents(s, d)
      .select($"doc_id", explode(expr("word_shingles(split(text, ' '), 5)")).as("g"))
    val train = sh.filter($"doc_id" % 50 =!= 0)
      .select($"g").distinct().withColumn("hit", lit(1L))
    sh.filter($"doc_id" % 50 === 0)
      .join(train, Seq("g"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce($"hit", lit(0L))).as("n_hit"))
      .select($"doc_id", $"n_grams", $"n_hit",
        expr("(1000000L * n_hit) div n_grams").as("overlap_ppm"))
      .orderBy($"doc_id")
  }
  val textEvalOverlapSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]
      |          for i in range(1, len(ws)-3)])) AS g
      |       FROM tok),
      |train AS (SELECT DISTINCT g FROM sh WHERE doc_id % 50 <> 0),
      |ev AS (SELECT doc_id, g FROM sh WHERE doc_id % 50 = 0)
      |SELECT e.doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN t.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  CAST((1000000 * sum(CASE WHEN t.g IS NOT NULL THEN 1 ELSE 0 END))
      |    // count(*) AS BIGINT) AS overlap_ppm
      |FROM ev e LEFT JOIN train t ON t.g = e.g
      |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin

  /** Per-document n-gram NOVELTY against everything that came before
    * it (doc_id order = ingest order in this corpus): the ppm of a
    * doc's distinct 3-grams whose FIRST occurrence is this doc. The
    * streaming-ingest health metric — novelty collapsing toward zero
    * means the crawl is re-reading the same web. Shape: the inverted
    * first-seen index (gram → min doc_id) is one map-side-combined
    * shuffle on the gram; the join back runs on the same key and the
    * rollup shuffles doc-sized rows — corpus-linear, no doc×doc
    * anywhere, same family as [[textDupRatio]]. */
  def textNgramNovelty(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    val sh = documents(s, d)
      .select($"doc_id", explode(expr("word_shingles(split(text, ' '))")).as("g"))
    val firstSeen = sh.groupBy($"g").agg(min($"doc_id").as("first_doc"))
    sh.join(firstSeen, "g")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .select($"doc_id", $"n_grams", $"n_novel",
        expr("(1000000L * n_novel) div n_grams").as("novelty_ppm"))
      .orderBy($"doc_id")
  }
  val textNgramNoveltySql: String =
    """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)])) AS g
      |       FROM tok),
      |fs AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g)
      |SELECT sh.doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN fs.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  CAST((1000000 * sum(CASE WHEN fs.first_doc = sh.doc_id THEN 1 ELSE 0 END))
      |    // count(*) AS BIGINT) AS novelty_ppm
      |FROM sh JOIN fs ON fs.g = sh.g
      |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin

  /** Vocabulary-growth thresholds for [[textVocabGrowth]] (doc_id
    * prefix sizes): fixed literals so the curve is comparable across
    * corpora; thresholds beyond the corpus simply report the full
    * vocabulary. */
  val VocabGrowthThresholds: Seq[Long] = Seq(25L, 50L, 100L, 200L, 400L, 800L)

  /** Vocabulary growth curve (the Heaps'-law measurement): for each
    * doc_id prefix threshold, the distinct-token vocabulary size and
    * total token occurrences within that prefix — the plot that tells
    * a tokenizer team when vocab growth flattens and a crawl team when
    * new data stops adding words. Shape: one shuffle builds the
    * token → first-doc index (map-side combined); one more builds the
    * doc → token-count table; both collapse to CATALOG-sized frames
    * (distinct tokens, docs) before the tiny threshold cross join, so
    * the curve costs two aggregates regardless of corpus size. */
  def textVocabGrowth(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val thr = VocabGrowthThresholds.toDF("threshold")
    val tok = documents(s, d)
      .select($"doc_id", explode(toks($"text")).as("t"))
    val firstSeen = tok.groupBy($"t").agg(min($"doc_id").as("fd"))
    val vocab = firstSeen.join(broadcast(thr), $"fd" <= $"threshold")
      .groupBy($"threshold").agg(count(lit(1)).as("vocab_size"))
    val occ = tok.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .join(broadcast(thr), $"doc_id" <= $"threshold")
      .groupBy($"threshold").agg(sum($"n").as("n_occurrences"))
    vocab.join(occ, Seq("threshold"), "left")
      .select($"threshold", $"vocab_size",
        coalesce($"n_occurrences", lit(0L)).as("n_occurrences"))
      .orderBy($"threshold")
  }
  /** Winnowing window for [[textWinnowing]], in gram positions. */
  val WinnowW = 4

  /** Winnowing document fingerprints (Schleimer et al. 2003 — the MOSS
    * plagiarism-detection selector): hash every positional 3-gram,
    * slide a [[WinnowW]]-gram window, keep each window's MINIMUM hash.
    * Winnowing guarantees any shared run of ≥ W+2 tokens between two
    * documents shares a fingerprint, while storing only ~2/(W+1) of
    * the hashes — the density/recall tradeoff that makes fingerprint
    * indexes feasible at 100 TB. The "hash" is the md5 HEX STRING and
    * the minimum is lexicographic: a total order both engines
    * implement identically, so the selection is cross-engine exact
    * with no integer-decode step. Shape: map-side gram hashing, ONE
    * per-doc window pass (shuffle on doc_id), and a rollup reusing the
    * same partitioning. Emitted as per-doc fingerprint counts (the
    * index build's size estimate); docs too short for a full window
    * are absent identically on both sides. */
  /** The winnowing fingerprint stream — (doc_id, n_grams, pos, fp)
    * rows for full windows only; shared by [[textWinnowing]] and
    * [[DedupOps.dedupWinnow]] so the two can never drift. */
  private[operators] def winnowFps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // spread before the per-trigram md5 kernel: the single-file scan
    // is 1 partition and would run it serially (identity at scale —
    // see Tables.spreadKernel)
    winnowFpsOf(s, graft.Tables.spreadKernel(s, d, "documents")(
      documents(s, d).select($"doc_id", split($"text", " ").as("ws"))))
  }

  /** [[winnowFps]] over a pre-tokenized (doc_id, ws) frame — lets
    * [[graft.operators.DedupOps.dedupReport]] feed its shared cached
    * token base instead of re-splitting raw text. */
  private[operators] def winnowFpsOf(s: SparkSession, toks: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.currentRow, WinnowW - 1)
    toks
      // size(NULL) is NULL (or legacy -1) — either way the predicate
      // excludes NULL-text docs, the same set as the previous
      // text IS NOT NULL + len filter pair
      .filter(size($"ws") >= 3)
      .select($"doc_id", size($"ws").cast("long").as("n_toks"),
        posexplode(expr(
          "transform(sequence(0, size(ws) - 3), i -> md5(concat_ws(' ', ws[i], ws[i+1], ws[i+2])))"))
          .as(Seq("pos", "h")))
      .withColumn("n_grams", $"n_toks" - 2)
      .withColumn("fp", min($"h").over(w))
      .filter($"pos" <= $"n_grams" - WinnowW) // full windows only
  }
  /** The matching oracle CTE chain (ends with the `fps`/full-window
    * `wfp` views) — one definition used by both ops' SQL. */
  private[operators] val winnowFpCtesSql: String = {
    val W = WinnowW
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
       |           FROM documents WHERE text IS NOT NULL),
       |ix AS (SELECT doc_id, ws, CAST(len(ws) - 2 AS BIGINT) AS n_grams,
       |         unnest([i for i in range(1, len(ws) - 1)]) AS i
       |       FROM t WHERE len(ws) >= 3),
       |g AS (SELECT doc_id, n_grams, i AS pos,
       |        md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS h
       |      FROM ix),
       |fps AS (SELECT doc_id, n_grams, pos,
       |          min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |            ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS fp
       |        FROM g),
       |wfp AS (SELECT doc_id, n_grams, pos, fp FROM fps
       |        WHERE pos <= n_grams - $W + 1)""".stripMargin
  }

  def textWinnowing(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    winnowFps(s, d)
      .groupBy($"doc_id")
      .agg(max($"n_grams").as("n_grams"),
        (max($"n_grams") - (WinnowW - 1)).as("n_windows"),
        countDistinct($"fp").as("n_fingerprints"))
      .orderBy($"doc_id")
  }
  val textWinnowingSql: String =
    s"""$winnowFpCtesSql
       |SELECT doc_id, max(n_grams) AS n_grams,
       |  max(n_grams) - ${WinnowW - 1} AS n_windows,
       |  CAST(count(DISTINCT fp) AS BIGINT) AS n_fingerprints
       |FROM wfp
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Language-mix matrix: per (source, predicted language), document
    * count and the language's integer-ppm share OF THAT SOURCE — the
    * corpus-composition table a multilingual data team reads next to
    * [[CurationOps.docMixWeights]]. Composed from [[textLangId]]'s own
    * predictions on both engine sides (the oracle embeds its SQL), so
    * the mix can never disagree with the classifier. Shape: map-side
    * language ID, one (source, lang) rollup, and a source-sized totals
    * join — catalog-scale after the first aggregate. */
  def textLangMix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lang = textLangId(s, d)
    val tagged = documents(s, d).select($"doc_id", $"source")
      .join(lang, "doc_id")
    val per = tagged.groupBy($"source", $"pred_lang")
      .agg(count(lit(1)).as("n_docs"))
    val tot = per.groupBy($"source").agg(sum($"n_docs").as("n_src"))
    per.join(tot, "source")
      .select($"source", $"pred_lang", $"n_docs",
        expr("(1000000L * n_docs) div n_src").as("share_ppm"))
      .orderBy($"source", $"pred_lang")
  }
  val textLangMixSql: String =
    s"""WITH lang AS (SELECT * FROM (
       |$textLangIdSql
       |) z),
       |per AS (
       |  SELECT d.source, l.pred_lang, count(*) AS n_docs
       |  FROM documents d JOIN lang l USING (doc_id)
       |  GROUP BY 1, 2),
       |tot AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_src
       |        FROM per GROUP BY source)
       |SELECT p.source, p.pred_lang, p.n_docs,
       |  CAST((1000000 * p.n_docs) // t.n_src AS BIGINT) AS share_ppm
       |FROM per p JOIN tot t ON t.source = p.source
       |ORDER BY p.source, p.pred_lang""".stripMargin

  val textVocabGrowthSql: String = {
    val thrRows = VocabGrowthThresholds.map(t => s"($t)").mkString(", ")
    s"""WITH thr(threshold) AS (VALUES $thrRows),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |fs AS (SELECT t, min(doc_id) AS fd FROM tok GROUP BY t),
       |vocab AS (SELECT threshold, count(*) AS vocab_size
       |          FROM fs, thr WHERE fd <= threshold GROUP BY threshold),
       |occ AS (SELECT threshold, CAST(sum(n) AS BIGINT) AS n_occurrences
       |        FROM (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) dn, thr
       |        WHERE doc_id <= threshold GROUP BY threshold)
       |SELECT v.threshold, v.vocab_size, COALESCE(o.n_occurrences, 0) AS n_occurrences
       |FROM vocab v LEFT JOIN occ o USING (threshold)
       |ORDER BY v.threshold""".stripMargin
  }
}
