package graft.verify

import graft.textops.{Dedup, PortableHash, Similarity, TextAnalysis}

/** DuckDB oracle SQL for the training-data operators (dedup, similarity,
  * text analysis, media features). Every constant mirrors the frozen
  * constants in graft.textops; hashes are the portable md5-prefix ints
  * ([[PortableHash]]).
  */
object TextOracles {

  import PortableHash.{duckHexint32 => h32, duckHexint60 => h60}

  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** DuckDB twin of [[graft.textops.TextAnalysis.chunkWords]]: ceil(n/k)
    * k-word chunks of a word-array column (`range()` is the 0-based
    * index list; DuckDB slices are 1-based inclusive and clamp like
    * Spark's `slice`; `range(0)` is `[]`, covering the empty case).
    */
  private def chunkSql(ws: String, k: Int): String =
    s"list_transform(range((len($ws) + ${k - 1}) // $k), i -> " +
      s"array_to_string($ws[i*$k+1:(i+1)*$k], ' '))"
  private val enStop = inList(TextAnalysis.EnStop)
  private val ptStop = inList(TextAnalysis.PtStop)

  val dedupExact: String =
    s"""SELECT doc_id, text_hash, row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) > 1 AS is_duplicate
FROM (SELECT doc_id, ${h60("text")} AS text_hash FROM documents)
ORDER BY doc_id"""

  val langId: String =
    s"""WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents
), r AS (
  SELECT doc_id,
    round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
      CAST(len(list_filter(ws, x -> x IN ($enStop))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) END, 6) AS en_ratio,
    round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
      CAST(len(list_filter(ws, x -> x IN ($ptStop))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) END, 6) AS pt_ratio
  FROM w)
SELECT doc_id, en_ratio, pt_ratio,
  CASE WHEN en_ratio > pt_ratio THEN 'en'
       WHEN pt_ratio > en_ratio THEN 'pt' ELSE 'und' END AS lang_guess
FROM r ORDER BY doc_id"""

  val quality: String =
    s"""WITH w AS (
  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents
), m AS (
  SELECT doc_id, text, len(ws) AS n_words,
    CASE WHEN len(ws) = 0 THEN 0.0
         ELSE CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) END AS awl,
    CASE WHEN len(ws) = 0 THEN 0.0
         ELSE CAST(len(list_filter(ws, x -> x IN ($enStop))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) END AS sr
  FROM w)
SELECT doc_id, n_words, len(text) AS n_chars, round(awl, 6) AS avg_word_len,
  round(sr, 6) AS stopword_ratio,
  round(0.5 * least(1.0, CAST(n_words AS DOUBLE) / 100.0) + 0.3 * sr + 0.2 * least(1.0, awl / 8.0), 6) AS quality
FROM m ORDER BY doc_id"""

  /** Gopher quality rules (mirrors [[graft.textops.TextAnalysis.gopherRules]]);
    * the keep flag compares the rounded projections, like the Spark side.
    */
  val gopherRules: String = {
    import graft.textops.TextAnalysis._
    s"""WITH w AS (
  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents
), m AS (
  SELECT doc_id, len(ws) AS n_words,
    round(CASE WHEN len(ws) = 0 THEN 0.0
      ELSE CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) END, 6) AS mean_word_len,
    CASE WHEN len(ws) = 0 THEN 0.0
      ELSE round((CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE)
        + CAST(len(text) - len(replace(text, '...', '')) AS DOUBLE) / 3.0)
        / CAST(len(ws) AS DOUBLE), 6) END AS symbol_ratio,
    CASE WHEN len(ws) = 0 THEN 0.0
      ELSE round(CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        / CAST(len(ws) AS DOUBLE), 6) END AS alpha_word_frac,
    len(list_filter(ws, x -> x IN ($enStop))) AS n_stop
  FROM w)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac, n_stop,
  (mean_word_len >= $MeanWordLenMin AND mean_word_len <= $MeanWordLenMax
   AND symbol_ratio <= $SymbolRatioMax AND alpha_word_frac >= $AlphaWordFracMin
   AND n_stop >= $MinStopwords) AS keep
FROM m ORDER BY doc_id"""
  }

  /** Stratified sample (mirrors [[graft.textops.Corpus.sampleStratified]]). */
  val sampleStratified: String = {
    import graft.textops.Corpus
    val cases = Corpus.SampleThresholds
      .map { case (l, t) => s"WHEN lang = '$l' THEN $t" }.mkString(" ")
    s"""WITH h AS (
  SELECT doc_id, lang,
    ${h32("'sample-' || CAST(doc_id AS VARCHAR)")} % 1000 AS h,
    CASE $cases ELSE ${Corpus.SampleDefaultThreshold} END AS threshold
  FROM documents)
SELECT doc_id, lang, h FROM h WHERE h < threshold ORDER BY doc_id"""
  }

  /** Concat-and-chunk packing (mirrors [[graft.textops.Corpus.packSequences]]). */
  val packSequences: String = {
    import graft.textops.Corpus
    s"""WITH t AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM t)
SELECT doc_id, n_tokens, start_tok,
  start_tok // ${Corpus.PackCapacity} AS bin_id,
  start_tok % ${Corpus.PackCapacity} AS offset_in_bin
FROM c ORDER BY doc_id"""
  }

  /** Per-shard packing (mirrors [[graft.textops.Corpus.packSequencesSharded]]). */
  val packSequencesSharded: String = {
    import graft.textops.{Corpus, PortableHash}
    val shard = s"${PortableHash.duckHexint32("'shard-' || CAST(doc_id AS VARCHAR)")} % ${Corpus.PackShards}"
    s"""WITH t AS (
  SELECT doc_id,
    $shard AS shard,
    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, shard, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM t)
SELECT doc_id, shard, n_tokens, start_tok,
  start_tok // ${Corpus.PackCapacity} AS bin_id,
  start_tok % ${Corpus.PackCapacity} AS offset_in_bin
FROM c ORDER BY doc_id"""
  }

  /** Near-dup clustering (mirrors [[graft.textops.Dedup.nearDupClusters]]):
    * connected components over the MinHash+LSH verified pairs via a
    * recursive transitive-closure CTE (fine at oracle scale; the Spark
    * side uses distributed label propagation), cluster label = min
    * reachable doc_id.
    */
  lazy val nearDupClusters: String = // lazy: embeds minhashLsh, defined below
    s"""WITH RECURSIVE p AS ($minhashLsh),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM p),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
SELECT src AS doc_id,
  least(src, min(dst)) AS cluster_id,
  src = least(src, min(dst)) AS is_keeper
FROM reach GROUP BY src ORDER BY doc_id"""

  /** Shuffled packing (mirrors [[graft.textops.Corpus.packSequencesShuffled]]). */
  val packSequencesShuffled: String = {
    import graft.textops.{Corpus, PortableHash}
    val shard = s"${PortableHash.duckHexint32("'shard-' || CAST(doc_id AS VARCHAR)")} % ${Corpus.PackShards}"
    val shuf = PortableHash.duckHexint60("'shuf-' || CAST(doc_id AS VARCHAR)")
    s"""WITH t AS (
  SELECT doc_id,
    $shard AS shard,
    $shuf AS shuf_key,
    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, shard, shuf_key, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY shuf_key, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM t)
SELECT doc_id, shard, shuf_key, n_tokens, start_tok,
  start_tok // ${Corpus.PackCapacity} AS bin_id,
  start_tok % ${Corpus.PackCapacity} AS offset_in_bin
FROM c ORDER BY doc_id"""
  }

  /** End-to-end corpus build (mirrors [[graft.textops.Corpus.buildCorpus]]):
    * tag (lang guess + Gopher verdict + content hash) -> exact dedup ->
    * stratified sample on the DETECTED language -> per-shard pack. The
    * per-stage expressions are copies of the single-op oracles above with
    * the same constants interpolated from the Scala definitions.
    */
  val buildCorpus: String = {
    import graft.textops.{Corpus, PortableHash, TextAnalysis}
    import TextAnalysis._
    val sampleCases = Corpus.SampleThresholds
      .map { case (l, t) => s"WHEN lang_guess = '$l' THEN $t" }.mkString(" ")
    val shard = s"${PortableHash.duckHexint32("'shard-' || CAST(doc_id AS VARCHAR)")} % ${Corpus.PackShards}"
    s"""WITH w AS (
  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents),
m AS (
  SELECT doc_id, ws,
    round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
      CAST(len(list_filter(ws, x -> x IN ($enStop))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) END, 6) AS en_ratio,
    round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
      CAST(len(list_filter(ws, x -> x IN ($ptStop))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) END, 6) AS pt_ratio,
    round(CASE WHEN len(ws) = 0 THEN 0.0
      ELSE CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) END, 6) AS mean_word_len,
    CASE WHEN len(ws) = 0 THEN 0.0
      ELSE round((CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE)
        + CAST(len(text) - len(replace(text, '...', '')) AS DOUBLE) / 3.0)
        / CAST(len(ws) AS DOUBLE), 6) END AS symbol_ratio,
    CASE WHEN len(ws) = 0 THEN 0.0
      ELSE round(CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        / CAST(len(ws) AS DOUBLE), 6) END AS alpha_word_frac,
    len(list_filter(ws, x -> x IN ($enStop))) AS n_stop,
    ${h60("text")} AS text_hash
  FROM w),
q AS (
  SELECT doc_id, ws, text_hash,
    CASE WHEN en_ratio > pt_ratio THEN 'en'
         WHEN pt_ratio > en_ratio THEN 'pt' ELSE 'und' END AS lang_guess,
    (mean_word_len >= $MeanWordLenMin AND mean_word_len <= $MeanWordLenMax
     AND symbol_ratio <= $SymbolRatioMax AND alpha_word_frac >= $AlphaWordFracMin
     AND n_stop >= $MinStopwords) AS quality_keep
  FROM m),
d AS (
  SELECT *, row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) > 1 AS is_duplicate FROM q),
s AS (
  SELECT doc_id, ws, lang_guess FROM d
  WHERE quality_keep AND NOT is_duplicate
    AND ${h32("'sample-' || CAST(doc_id AS VARCHAR)")} % 1000 <
      CASE $sampleCases ELSE ${Corpus.SampleDefaultThreshold} END),
p AS (
  SELECT doc_id, lang_guess, $shard AS shard,
    CAST(len(ws) AS BIGINT) AS n_tokens
  FROM s),
c AS (
  SELECT doc_id, lang_guess, shard, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM p)
SELECT doc_id, shard, n_tokens, start_tok,
  start_tok // ${Corpus.PackCapacity} AS bin_id,
  start_tok % ${Corpus.PackCapacity} AS offset_in_bin,
  lang_guess
FROM c ORDER BY doc_id"""
  }

  val tokenCounts: String =
    s"""SELECT doc_id,
  len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
  len(regexp_extract_all(text, '${TextAnalysis.BpeishTokenPattern}')) AS bpe_tokens
FROM documents ORDER BY doc_id"""

  val repetition: String = {
    def dupFrac(n: Int): String =
      s"""CASE WHEN len(ws) < $n THEN 0.0 ELSE
      round(1.0 - CAST(len(list_distinct(list_transform(range(len(ws) - ${n - 1}),
        i -> array_to_string(ws[i+1:i+$n], ' ')))) AS DOUBLE)
        / CAST(len(ws) - ${n - 1} AS DOUBLE), 6) END"""
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
r AS (
  SELECT doc_id,
    ${dupFrac(2)} AS dup_2gram_frac,
    ${dupFrac(3)} AS dup_3gram_frac
  FROM w)
SELECT doc_id, dup_2gram_frac, dup_3gram_frac,
  dup_2gram_frac <= ${TextAnalysis.Dup2Max} AND dup_3gram_frac <= ${TextAnalysis.Dup3Max} AS keep
FROM r ORDER BY doc_id"""
  }

  val fingerprint: String =
    s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id,
  CASE WHEN len(ws) >= 5 THEN
    list_min(list_transform(range(len(ws) - 4),
      i -> ${h60("array_to_string(ws[i+1:i+5], ' ')")}))
  ELSE ${h60("text")} END AS fingerprint
FROM w ORDER BY doc_id"""

  /** PII scrubbing (mirrors [[graft.textops.TextAnalysis.piiScrub]]):
    * plant deterministic PII per doc_id, then redact email → ip → phone
    * in that fixed order, each count taken on the text state its
    * replacement sees. Pattern strings interpolate from the Scala
    * constants (RE2-compatible by construction).
    */
  val piiScrub: String = {
    import graft.textops.TextAnalysis._
    s"""WITH p AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN text || ' contact user.' || CAST(doc_id AS VARCHAR) || '@example.com now'
         WHEN doc_id % 3 = 1 THEN text || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 at 555-867-5309'
         ELSE text END AS t0
  FROM documents),
s1 AS (
  SELECT doc_id, len(regexp_extract_all(t0, '$PiiEmailPattern')) AS n_emails,
    regexp_replace(t0, '$PiiEmailPattern', '<EMAIL>', 'g') AS t1
  FROM p),
s2 AS (
  SELECT doc_id, n_emails, len(regexp_extract_all(t1, '$PiiIpPattern')) AS n_ips,
    regexp_replace(t1, '$PiiIpPattern', '<IP>', 'g') AS t2
  FROM s1),
s3 AS (
  SELECT doc_id, n_emails, n_ips,
    len(regexp_extract_all(t2, '$PiiPhonePattern')) AS n_phones,
    regexp_replace(t2, '$PiiPhonePattern', '<PHONE>', 'g') AS t3
  FROM s2)
SELECT doc_id, t3 AS clean_text, n_emails, n_ips, n_phones,
  n_emails + n_ips + n_phones AS n_redactions
FROM s3 ORDER BY doc_id"""
  }

  /** Unicode fixing (mirrors [[graft.textops.TextAnalysis.fixUnicode]]):
    * plant the decomposed sequences / control char per doc_id (chr() is
    * the portable carrier — the codepoints match the Scala \\u escapes),
    * strip C0 controls with the byte-identical pattern, then DuckDB's
    * own `nfc_normalize` (utf8proc) against the kernel's
    * `java.text.Normalizer` — the oracle pins the two Unicode
    * implementations' agreement per row.
    */
  val fixUnicode: String = {
    import graft.textops.TextAnalysis.ControlCharPattern
    s"""WITH p AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN text || ' cafe' || chr(769) || ' menu'
         WHEN doc_id % 3 = 1 THEN text || ' nin' || chr(771) || 'o' || chr(7) || ' data'
         ELSE text END AS planted
  FROM documents),
c AS (
  SELECT doc_id, planted,
    nfc_normalize(regexp_replace(planted, '$ControlCharPattern', '', 'g')) AS clean_text
  FROM p)
SELECT doc_id, clean_text,
  CAST(length(planted) AS BIGINT) AS len_before,
  CAST(length(clean_text) AS BIGINT) AS len_after,
  clean_text <> planted AS changed
FROM c ORDER BY doc_id"""
  }

  /** The paragraph-dedup tail over any `paras`-holding CTE — mirrors
    * [[graft.textops.Dedup.dedupParaCore]]. DuckDB indexed list lambdas
    * are 1-BASED (Spark's are 0-based): positions are normalized to
    * 0-based on both sides.
    */
  private def paraDedupSql(parasCte: String): String =
    s"""ex AS (
  SELECT doc_id, CAST(u.pos - 1 AS INTEGER) AS pos, ${h60("u.para")} AS ph
  FROM (SELECT doc_id,
          unnest(list_transform(paras, (x,i) -> {'pos': i, 'para': x})) AS u
        FROM $parasCte)),
f AS (
  SELECT ph, min(doc_id) AS keeper_doc
  FROM ex GROUP BY ph HAVING count(DISTINCT doc_id) >= 2),
dr AS (
  SELECT ex.doc_id, list(DISTINCT ex.pos) AS drop_pos
  FROM ex JOIN f ON ex.ph = f.ph
  WHERE ex.doc_id <> f.keeper_doc
  GROUP BY ex.doc_id)
SELECT $parasCte.doc_id,
  CAST(len(paras) AS BIGINT) AS n_paras,
  CAST(coalesce(len(drop_pos), 0) AS BIGINT) AS n_dropped,
  coalesce(array_to_string(
    list_filter(paras, (x,i) -> NOT list_contains(coalesce(drop_pos, []), i - 1)),
    chr(10)), '') AS clean_text
FROM $parasCte LEFT JOIN dr ON $parasCte.doc_id = dr.doc_id
ORDER BY $parasCte.doc_id"""

  /** Cross-document paragraph dedup (mirrors
    * [[graft.textops.Dedup.dedupParagraphs]]): replant the 7-word
    * paragraph chunks, find paragraphs held by >= 2 docs, drop every
    * occurrence outside the min-doc_id keeper, re-join the survivors.
    * DuckDB indexed list lambdas are 1-BASED (Spark's are 0-based):
    * positions are normalized to 0-based on both sides.
    */
  val dedupParagraphs: String = {
    import graft.textops.Dedup
    s"""WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents),
ch AS (
  SELECT doc_id, ${chunkSql("ws", Dedup.ParaChunkWords)} AS paras FROM w),
${paraDedupSql("ch")}"""
  }

  /** CTE block planting the C4 line table from a words CTE
    * `(doc_id, ws)` — mirrors
    * [[graft.textops.TextAnalysis.c4PlantedLines]] (chunk + suffix +
    * footer/javascript/lorem/brace plants). Ends with `pl(doc_id, lines)`.
    */
  private def c4PlantCtes(from: String): String = {
    import graft.textops.TextAnalysis._
    s"""ck AS (SELECT doc_id, ${chunkSql("ws", C4PlantLineWords)} AS chunks FROM $from),
b AS (
  SELECT doc_id,
    list_transform(chunks, (x, i) -> x ||
      CASE WHEN (doc_id + i - 1) % 3 = 0 THEN ' .'
           WHEN (doc_id + i - 1) % 3 = 1 THEN ' !'
           ELSE '' END) AS base
  FROM ck),
p0 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0
    THEN list_concat(base, ['$C4FooterLine'])
    ELSE base END AS lf FROM b),
p1 AS (SELECT doc_id, CASE WHEN doc_id % 11 = 0
    THEN list_concat(lf, ['please enable javascript to view this page .'])
    ELSE lf END AS l1 FROM p0),
p2 AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0
    THEN list_concat(l1, ['lorem ipsum dolor sit amet consectetur .'])
    ELSE l1 END AS l2 FROM p1),
pl AS (SELECT doc_id, CASE WHEN doc_id % 17 = 0
    THEN list_concat(l2, ['function main ( ) { return 0 }'])
    ELSE l2 END AS lines FROM p2)"""
  }

  /** The C4 kept-line filter over a lines column — mirrors
    * [[graft.textops.TextAnalysis.c4KeptCol]] (content words exclude
    * standalone punctuation tokens).
    */
  private def c4KeptSql(lines: String): String = {
    import graft.textops.TextAnalysis._
    s"""list_filter($lines, l ->
      right(l, 1) IN ('.', '!', '?', '"')
      AND len(list_filter(string_split(l, ' '),
        x -> x <> '' AND x NOT IN ('.', '!', '?', '"'))) >= $C4LineMinWords
      AND NOT list_contains(string_split(l, ' '), 'javascript'))"""
  }

  /** C4 line-level cleaning (mirrors
    * [[graft.textops.TextAnalysis.c4Clean]]): replant the deterministic
    * line structure (7-word chunks, `(doc_id + i) % 3` punctuation
    * suffix, sparse javascript / lorem-ipsum / brace poison lines), then
    * apply the frozen C4 line and page rules. `range()` here yields the
    * 0-based index list, matching Spark's `sequence(0, n-1)`; DuckDB
    * list slices are 1-based inclusive and clamp like Spark's `slice`.
    */
  val c4Clean: String = {
    import graft.textops.TextAnalysis._
    s"""WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents),
${c4PlantCtes("w")},
c AS (
  SELECT doc_id, lines,
    ${c4KeptSql("lines")} AS kept,
    -- array_to_string([]) is NULL in DuckDB but '' in Spark: coalesce
    coalesce(array_to_string(lines, chr(10)), '') AS page_text
  FROM pl)
SELECT doc_id,
  CAST(len(lines) AS BIGINT) AS n_lines,
  CAST(len(kept) AS BIGINT) AS n_kept,
  (len(kept) >= $C4PageMinLines
    AND NOT contains(page_text, 'lorem ipsum')
    AND NOT contains(page_text, '{')) AS page_keep,
  coalesce(array_to_string(kept, chr(10)), '') AS clean_text
FROM c ORDER BY doc_id"""
  }

  /** The cleanup capstone (mirrors
    * [[graft.textops.TextAnalysis.cleanPipeline]]): unicode repair →
    * C4 line cleanup on the repaired text → page verdict → cross-doc
    * line dedup over surviving pages' kept lines — each stage the same
    * fragment its standalone oracle uses.
    */
  val corpusClean: String = {
    import graft.textops.TextAnalysis._
    s"""WITH pn AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN text || ' cafe' || chr(769) || ' menu'
         WHEN doc_id % 3 = 1 THEN text || ' nin' || chr(771) || 'o' || chr(7) || ' data'
         ELSE text END AS planted
  FROM documents),
u AS (
  SELECT doc_id,
    nfc_normalize(regexp_replace(planted, '$ControlCharPattern', '', 'g')) AS clean
  FROM pn),
w AS (
  SELECT doc_id, list_filter(string_split(clean, ' '), x -> x <> '') AS ws FROM u),
${c4PlantCtes("w")},
c AS (
  SELECT doc_id,
    ${c4KeptSql("lines")} AS kept,
    coalesce(array_to_string(lines, chr(10)), '') AS page_text
  FROM pl),
pages AS (
  SELECT doc_id, kept AS paras FROM c
  WHERE len(kept) >= $C4PageMinLines
    AND NOT contains(page_text, 'lorem ipsum')
    AND NOT contains(page_text, '{')),
${paraDedupSql("pages")}"""
  }

  /** Benchmark decontamination (mirrors
    * [[graft.textops.Decontam.decontaminate]]): the same 5-gram hash
    * family as the fingerprint oracle, benchmark = hash-threshold doc
    * subset, contaminated = any gram overlap with the benchmark set.
    */
  val decontaminate: String = {
    import graft.textops.Decontam
    s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
    ${h32("'bench-' || CAST(doc_id AS VARCHAR)")} % 1000 < ${Decontam.BenchmarkThreshold} AS is_benchmark,
    CASE WHEN len(ws) >= 5 THEN
      list_transform(range(len(ws) - 4),
        i -> ${h60("array_to_string(ws[i+1:i+5], ' ')")})
    ELSE [${h60("text")}] END AS grams
  FROM w),
bench AS (
  SELECT DISTINCT u.gg AS g FROM g, UNNEST(grams) u(gg) WHERE is_benchmark),
cont AS (
  SELECT DISTINCT d.doc_id FROM (
    SELECT doc_id, u.gg AS g FROM g, UNNEST(grams) u(gg) WHERE NOT is_benchmark) d
  JOIN bench b ON d.g = b.g)
SELECT g.doc_id, g.is_benchmark, len(grams) AS n_grams,
  COALESCE(c.hit, false) AS contaminated
FROM g LEFT JOIN (SELECT doc_id, true AS hit FROM cont) c USING (doc_id)
ORDER BY doc_id"""
  }

  /** Cross-document duplicate passages (mirrors
    * [[graft.textops.Dedup.dupPassages]]): per-doc DISTINCT 5-gram
    * hashes, corpus-wide frequency, dup = gram held by >= 2 docs.
    */
  /** Shared per-doc distinct-5-gram CTE chain (`w` → `g(doc_id, grams)`
    * → exploded `dg(doc_id, g)`), the [[graft.textops.TextAnalysis
    * .gramHashesScala]] contract: word 5-gram hashes, whole-text hash
    * below 5 words. One definition for [[dupPassages]] and
    * [[containment]] so the gram unit cannot silently diverge.
    */
  private def docGramCtes: String =
    s"""w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(ws) >= 5 THEN
      list_transform(range(len(ws) - 4),
        i -> ${h60("array_to_string(ws[i+1:i+5], ' ')")})
    ELSE [${h60("text")}] END) AS grams
  FROM w),
dg AS (SELECT doc_id, u.gg AS g FROM g, UNNEST(grams) u(gg))"""

  val dupPassages: String = {
    import graft.textops.Dedup
    s"""WITH $docGramCtes,
freq AS (SELECT g FROM dg GROUP BY g HAVING count(*) >= 2),
dup AS (SELECT dg.doc_id, CAST(count(*) AS BIGINT) AS dup_grams
        FROM dg JOIN freq USING (g) GROUP BY dg.doc_id),
r AS (
  SELECT g.doc_id, len(grams) AS n_distinct_grams,
    CAST(COALESCE(d.dup_grams, 0) AS BIGINT) AS dup_grams
  FROM g LEFT JOIN dup d USING (doc_id))
SELECT doc_id, n_distinct_grams, dup_grams,
  round(CAST(dup_grams AS DOUBLE) / CAST(n_distinct_grams AS DOUBLE), 6) AS dup_frac,
  round(CAST(dup_grams AS DOUBLE) / CAST(n_distinct_grams AS DOUBLE), 6)
    <= ${Dedup.DupPassageFracMax} AS keep
FROM r ORDER BY doc_id"""
  }

  /** Domain-mix plan (mirrors [[graft.textops.Corpus.mixPlan]]): sqrt
    * temperature weights, integer per-mille rates, hash-threshold keeps.
    */
  val mixPlan: String = {
    import graft.textops.Corpus
    s"""WITH t AS (
  SELECT doc_id, source,
    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
    ${h32("'mix-' || CAST(doc_id AS VARCHAR)")} % 1000 AS mix_h
  FROM documents),
ps AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS src_tokens
  FROM t GROUP BY source),
pw AS (SELECT ps.*,
    CAST(floor(sqrt(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS temp_weight
  FROM ps),
tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
    CAST(sum(temp_weight) AS BIGINT) AS total_w FROM pw),
r AS (
  SELECT source, n_docs, src_tokens, temp_weight,
    CAST(CASE WHEN src_tokens = 0 THEN 0
      ELSE least(1000, (CAST(total_tokens // ${Corpus.MixBudgetDiv} AS HUGEINT) * temp_weight * 1000)
        // (CAST(total_w AS HUGEINT) * src_tokens)) END AS BIGINT) AS rate_permille
  FROM pw, tot),
k AS (
  SELECT t.source, CAST(count(*) AS BIGINT) AS kept_docs,
    CAST(sum(t.n_tokens) AS BIGINT) AS kept_tokens
  FROM t JOIN r ON t.source = r.source WHERE t.mix_h < r.rate_permille
  GROUP BY t.source)
SELECT r.source, r.n_docs, r.src_tokens, r.temp_weight, r.rate_permille,
  CAST(COALESCE(k.kept_docs, 0) AS BIGINT) AS kept_docs,
  CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM r LEFT JOIN k USING (source)
ORDER BY source"""
  }

  /** Curated corpus build (mirrors [[graft.textops.Corpus.curate]]):
    * tag + classifier margin → exact dedup (keeper over ALL rows) →
    * score filter + benchmark exclusion + contamination drop →
    * survivor-based sqrt-temperature mix sampling → per-shard packing.
    * Every fragment is the single-op oracle's, composed in one CTE chain.
    */
  val corpusCurate: String = {
    import graft.textops.{Corpus, Decontam, TextAnalysis}
    import TextAnalysis._
    def u6(f: String): String = s"CAST(round($f * 1000000, 0) AS BIGINT)"
    val dup2 =
      s"""CASE WHEN len(wsf) < 2 THEN 0.0 ELSE
      round(1.0 - CAST(len(list_distinct(list_transform(range(len(wsf) - 1),
        i -> array_to_string(wsf[i+1:i+2], ' ')))) AS DOUBLE)
        / CAST(len(wsf) - 1 AS DOUBLE), 6) END"""
    val shard = s"${PortableHash.duckHexint32("'shard-' || CAST(doc_id AS VARCHAR)")} % ${Corpus.PackShards}"
    s"""WITH w AS (
  SELECT doc_id, source, text, string_split(text, ' ') AS wsf,
    list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents),
f AS (
  SELECT doc_id, source, text, ws, wsf,
    round(least(1.0, CAST(len(ws) AS DOUBLE) / 100.0), 6) AS f_len,
    round(CASE WHEN len(ws) = 0 THEN 0.0
      ELSE CAST(len(list_filter(ws, x -> x IN ($enStop))) AS DOUBLE)
        / CAST(len(ws) AS DOUBLE) END, 6) AS f_stop,
    round(least(1.0, (CASE WHEN len(ws) = 0 THEN 0.0
      ELSE CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE)
        / CAST(len(ws) AS DOUBLE) END) / 8.0), 6) AS f_awl,
    round(CASE WHEN len(ws) = 0 THEN 0.0
      ELSE CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        / CAST(len(ws) AS DOUBLE) END, 6) AS f_alpha,
    $dup2 AS f_rep,
    round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
      CAST(len(list_filter(ws, x -> x IN ($enStop))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) END, 6) AS en_ratio,
    round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
      CAST(len(list_filter(ws, x -> x IN ($ptStop))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) END, 6) AS pt_ratio
  FROM w),
t AS (
  SELECT doc_id, source,
    CAST(len(ws) AS BIGINT) AS n_tokens,
    CASE WHEN en_ratio > pt_ratio THEN 'en'
         WHEN pt_ratio > en_ratio THEN 'pt' ELSE 'und' END AS lang_guess,
    ${h60("text")} AS text_hash,
    $ClfBiasC * 1000000 + $ClfWLenC * ${u6("f_len")}
      + $ClfWStopC * ${u6("f_stop")} + $ClfWAwlC * ${u6("f_awl")}
      + $ClfWAlphaC * ${u6("f_alpha")} - $ClfWRepC * ${u6("f_rep")} AS score_u8,
    ${h32("'bench-' || CAST(doc_id AS VARCHAR)")} % 1000 < ${Decontam.BenchmarkThreshold} AS is_benchmark,
    ${h32("'mix-' || CAST(doc_id AS VARCHAR)")} % 1000 AS mix_h
  FROM f),
g AS (
  SELECT doc_id,
    ${h32("'bench-' || CAST(doc_id AS VARCHAR)")} % 1000 < ${Decontam.BenchmarkThreshold} AS is_benchmark,
    CASE WHEN len(wsf) >= 5 THEN
      list_transform(range(len(wsf) - 4),
        i -> ${h60("array_to_string(wsf[i+1:i+5], ' ')")})
    ELSE [${h60("text")}] END AS grams
  FROM w),
bench AS (
  SELECT DISTINCT u.gg AS g FROM g, UNNEST(grams) u(gg) WHERE is_benchmark),
cont AS (
  SELECT DISTINCT d.doc_id FROM (
    SELECT doc_id, u.gg AS g FROM g, UNNEST(grams) u(gg) WHERE NOT is_benchmark) d
  JOIN bench b ON d.g = b.g),
k AS (SELECT text_hash, min(doc_id) AS keeper_id FROM t GROUP BY text_hash),
surv AS (
  SELECT t.doc_id, t.source, t.n_tokens, t.lang_guess, t.mix_h
  FROM t JOIN k USING (text_hash)
  WHERE t.score_u8 >= $ClfCutC * 1000000 AND NOT t.is_benchmark
    AND t.doc_id = k.keeper_id
    AND t.doc_id NOT IN (SELECT doc_id FROM cont)),
ps AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
  FROM surv GROUP BY source),
pw AS (SELECT ps.*,
    CAST(floor(sqrt(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS temp_weight
  FROM ps),
tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
    CAST(sum(temp_weight) AS BIGINT) AS total_w FROM pw),
r AS (
  SELECT source,
    CAST(CASE WHEN src_tokens = 0 THEN 0
      ELSE least(1000, (CAST(total_tokens // ${Corpus.MixBudgetDiv} AS HUGEINT) * temp_weight * 1000)
        // (CAST(total_w AS HUGEINT) * src_tokens)) END AS BIGINT) AS rate_permille
  FROM pw, tot),
samp AS (
  SELECT surv.* FROM surv JOIN r USING (source) WHERE surv.mix_h < r.rate_permille),
p AS (
  SELECT doc_id, source, lang_guess, $shard AS shard, n_tokens FROM samp),
c AS (
  SELECT doc_id, source, lang_guess, shard, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM p)
SELECT doc_id, shard, n_tokens, start_tok,
  start_tok // ${Corpus.PackCapacity} AS bin_id,
  start_tok % ${Corpus.PackCapacity} AS offset_in_bin,
  source, lang_guess
FROM c ORDER BY doc_id"""
  }

  /** Linear quality classifier (mirrors
    * [[graft.textops.TextAnalysis.qualityClassifier]]): features rounded
    * to 6 decimals, then an exact INTEGER dot product in 1e-8 units
    * (float dot products land on decimal ties where Spark and DuckDB
    * round() disagree — rationale in the Spark twin's doc).
    */
  val qualityClassifier: String = {
    import graft.textops.TextAnalysis._
    def u6(f: String): String = s"CAST(round($f * 1000000, 0) AS BIGINT)"
    def dup2: String =
      s"""CASE WHEN len(wsf) < 2 THEN 0.0 ELSE
      round(1.0 - CAST(len(list_distinct(list_transform(range(len(wsf) - 1),
        i -> array_to_string(wsf[i+1:i+2], ' ')))) AS DOUBLE)
        / CAST(len(wsf) - 1 AS DOUBLE), 6) END"""
    s"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS wsf,
    list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents),
f AS (
  SELECT doc_id,
    round(least(1.0, CAST(len(ws) AS DOUBLE) / 100.0), 6) AS f_len,
    round(CASE WHEN len(ws) = 0 THEN 0.0
      ELSE CAST(len(list_filter(ws, x -> x IN ($enStop))) AS DOUBLE)
        / CAST(len(ws) AS DOUBLE) END, 6) AS f_stop,
    round(least(1.0, (CASE WHEN len(ws) = 0 THEN 0.0
      ELSE CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE)
        / CAST(len(ws) AS DOUBLE) END) / 8.0), 6) AS f_awl,
    round(CASE WHEN len(ws) = 0 THEN 0.0
      ELSE CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        / CAST(len(ws) AS DOUBLE) END, 6) AS f_alpha,
    $dup2 AS f_rep
  FROM w),
s AS (
  SELECT *, $ClfBiasC * 1000000 + $ClfWLenC * ${u6("f_len")}
    + $ClfWStopC * ${u6("f_stop")} + $ClfWAwlC * ${u6("f_awl")}
    + $ClfWAlphaC * ${u6("f_alpha")} - $ClfWRepC * ${u6("f_rep")} AS score_u8
  FROM f)
SELECT doc_id, f_len, f_stop, f_awl, f_alpha, f_rep,
  CAST(score_u8 AS DOUBLE) / 100000000.0 AS score,
  score_u8 >= $ClfCutC * 1000000 AS keep
FROM s ORDER BY doc_id"""
  }

  private val S = Dedup.ShingleSize
  private def shinglesCte: String =
    s"""base AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= $S
), sh AS (
  SELECT doc_id, array_to_string(ws[1:${Dedup.BlockWords}], ' ') AS block,
    list_distinct(list_transform(range(len(ws) - ${S - 1}),
      i -> array_to_string(ws[i+1:i+$S], ' '))) AS sh
  FROM base)"""

  val ngramJaccard: String =
    s"""WITH $shinglesCte,
lbd AS (SELECT doc_id, block, sh, CAST(len(bin(len(sh))) - 1 AS INT) AS lb FROM sh),
keyed AS (
  SELECT doc_id, block, lb + CAST(u.k AS INT) AS lb
  FROM lbd, UNNEST(range(3)) u(k)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM keyed a JOIN keyed b
    ON a.block = b.block AND a.lb = b.lb AND a.doc_id < b.doc_id)
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b,
    round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6) AS jaccard
  FROM cand JOIN lbd sa ON sa.doc_id = id_a JOIN lbd sb ON sb.doc_id = id_b)
WHERE jaccard >= 0.4 ORDER BY id_a, id_b"""

  val minhashLsh: String = {
    val K = Dedup.MinHashK
    val bands = Dedup.Bands
    val rows = K / bands
    val P = Dedup.MinHashP
    val sigCols = (0 until K).map { i =>
      val (a, b) = Dedup.MinHashCoef(i)
      s"list_min(list_transform(shh, h -> ($a * h + $b) % $P)) AS sig$i"
    }.mkString(",\n    ")
    val bandKeys = (0 until bands).map { b =>
      val cols = (0 until rows).map(r => s"CAST(sig${b * rows + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"WHEN ${b} THEN md5($cols)"
    }.mkString(" ")
    s"""WITH $shinglesCte,
sig AS (
  SELECT doc_id, sh,
    $sigCols
  FROM (SELECT doc_id, sh, list_transform(sh, s -> ${h32("s")} % $P) AS shh FROM sh)),
bands AS (
  SELECT doc_id, CAST(u.b AS INT) AS band,
    CASE CAST(u.b AS INT) $bandKeys END AS key
  FROM sig, UNNEST(range($bands)) u(b)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b,
    round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6) AS jaccard
  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b)
WHERE jaccard >= ${Dedup.JaccardThreshold} ORDER BY id_a, id_b"""
  }

  private val simhashCte: String = {
    import graft.textops.SimHash
    s"""wh AS (
  SELECT doc_id, list_transform(string_split(text, ' '), w -> ${h60("w")}) AS wh
  FROM documents
), fp AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(range(${SimHash.Bits}), b ->
      CASE WHEN list_sum(list_transform(wh, h -> ((h >> b) & 1) * 2 - 1)) > 0
           THEN CAST(1 AS BIGINT) << b ELSE 0 END)) AS BIGINT) AS simhash
  FROM wh)"""
  }

  val simhash: String =
    s"""WITH $simhashCte
SELECT doc_id, simhash FROM fp ORDER BY doc_id"""

  val simhashPairs: String = {
    import graft.textops.SimHash
    s"""WITH $simhashCte,
bands AS (
  SELECT doc_id, simhash, CAST(u.j AS INT) AS band,
    (simhash >> (CAST(u.j AS INT) * ${SimHash.BandBits})) & ${SimHash.BandMask} AS bkey
  FROM fp, UNNEST(range(${SimHash.Bands})) u(j)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, a.simhash AS fp_a, b.doc_id AS id_b, b.simhash AS fp_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
SELECT id_a, id_b, hamming FROM (
  SELECT id_a, id_b, CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming FROM cand)
WHERE hamming <= ${Dedup.SimHashMaxHamming} ORDER BY id_a, id_b"""
  }

  private val embCte: String =
    """e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings)"""

  private def duckCos(a: String, b: String): String =
    s"""list_sum(list_transform(range(len($a)), i -> $a[i+1] * $b[i+1])) /
 (sqrt(list_sum(list_transform(range(len($a)), i -> $a[i+1] * $a[i+1]))) *
  sqrt(list_sum(list_transform(range(len($b)), i -> $b[i+1] * $b[i+1]))))"""

  /** Dot of `v` against pool plane `t*bits + j` (literal list-of-lists
    * `ps`, 1-indexed), summed left-to-right like the Spark fold.
    */
  private def duckPlaneDot(v: String, tExpr: String, j: String, bits: Int): String =
    s"list_sum(list_transform(range(${Similarity.Dim}), i -> $v[i+1] * ps[$tExpr*$bits + $j + 1][i+1]))"

  /** B-bit sign signature of `v` for table `tExpr` (mirrors
    * [[graft.textops.Similarity.tableSignature]]).
    */
  private def duckSignature(v: String, tExpr: String, bits: Int): String =
    s"""CAST(list_sum(list_transform(range($bits), j ->
      CASE WHEN ${duckPlaneDot(v, tExpr, "CAST(j AS INT)", bits)} > 0.0
           THEN CAST(1 AS BIGINT) << CAST(j AS INT) ELSE 0 END)) AS BIGINT)"""

  private def duckNorm(v: String): String =
    s"sqrt(list_sum(list_transform(range(${Similarity.Dim}), i -> $v[i+1] * $v[i+1])))"

  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(${Similarity.Dim}), i -> $a[i+1] * $b[i+1]))"

  val bruteForceTopK: String =
    s"""WITH $embCte,
q AS (SELECT v AS qv FROM e WHERE vec_id = ${Similarity.QueryVecId})
SELECT vec_id, label, round(${duckCos("v", "qv")}, 6) AS sim
FROM e, q WHERE vec_id <> ${Similarity.QueryVecId}
ORDER BY sim DESC, vec_id LIMIT ${Similarity.TopK}"""

  val lshTopK: String = {
    val T = Similarity.TopKTables
    val B = Similarity.TopKBits
    s"""WITH $embCte,
pl AS (SELECT ${Similarity.duckPlanes(T * B)} AS ps),
nv AS (SELECT vec_id, label, v, ${duckNorm("v")} AS nrm FROM e),
buckets AS (
  SELECT vec_id, CAST(u.t AS INT) AS tbl, ${duckSignature("v", "CAST(u.t AS INT)", B)} AS bucket
  FROM e, pl, UNNEST(range($T)) u(t)),
qprobes AS (
  SELECT tbl, CASE WHEN CAST(u.j AS INT) = $B THEN bucket
              ELSE xor(bucket, CAST(1 AS BIGINT) << CAST(u.j AS INT)) END AS bucket
  FROM buckets, UNNEST(range(${B + 1})) u(j)
  WHERE vec_id = ${Similarity.QueryVecId}),
cand AS (
  SELECT DISTINCT b.vec_id FROM buckets b JOIN qprobes p
    ON b.tbl = p.tbl AND b.bucket = p.bucket
  WHERE b.vec_id <> ${Similarity.QueryVecId}),
q AS (SELECT v AS qv, nrm AS qnrm FROM nv WHERE vec_id = ${Similarity.QueryVecId})
SELECT n.vec_id, n.label, round(${duckDot("n.v", "qv")} / (n.nrm * qnrm), 6) AS sim
FROM cand c JOIN nv n ON n.vec_id = c.vec_id, q
ORDER BY sim DESC, n.vec_id LIMIT ${Similarity.TopK}"""
  }

  /** The k-means training chain (seed codebook → deterministic sample →
    * assign to nearest seed centroid — ORDER BY dist, cid == the
    * kernel's strict-less first-wins argmin — → quantized means: integer
    * sums → one IEEE division, bit-exact vs Spark's distributed
    * aggregation; empty lists keep their seed → `trained(cid, vec)`),
    * shared by [[ivfTopK]] and [[semDedup]]. Expects an
    * `e(vec_id, v, ...)` CTE in scope.
    */
  private def ivfTrainedCte: String = {
    import graft.textops.Ivf
    val C = Ivf.NumLists
    val D = graft.textops.Similarity.Dim
    val Q = Ivf.QuantScale
    s"""cb AS (SELECT ${Ivf.duckCentroids} AS cs),
samp AS (
  SELECT vec_id, v FROM e
  WHERE ${h32("'ivfs-' || CAST(vec_id AS VARCHAR)")} % 1000 < ${Ivf.TrainSampleThreshold}),
sdist AS (
  SELECT vec_id, CAST(u.c AS INT) AS cid,
    list_sum(list_transform(range($D), i ->
      (v[i+1] - cs[CAST(u.c AS INT)+1][i+1]) * (v[i+1] - cs[CAST(u.c AS INT)+1][i+1]))) AS d
  FROM samp, cb, UNNEST(range($C)) u(c)),
sassign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM sdist)
  WHERE rn = 1),
expl AS (
  SELECT a.cid, CAST(u.i AS INT) AS i,
    CAST(round(s.v[CAST(u.i AS INT)+1] * $Q) AS BIGINT) AS qq
  FROM sassign a JOIN samp s ON s.vec_id = a.vec_id, UNNEST(range($D)) u(i)),
sums AS (SELECT cid, i, SUM(qq) AS sq, COUNT(*) AS n FROM expl GROUP BY cid, i),
tvec AS (
  SELECT cid, list(CAST(sq AS DOUBLE) / ($Q.0 * n) ORDER BY i) AS vec
  FROM sums GROUP BY cid),
allc AS (SELECT CAST(u.c AS INT) AS cid FROM UNNEST(range($C)) u(c)),
trained AS (
  SELECT a.cid, COALESCE(t.vec, cs[a.cid + 1]) AS vec
  FROM allc a CROSS JOIN cb LEFT JOIN tvec t ON t.cid = a.cid)"""
  }

  /** IVF top-k (mirrors [[graft.textops.Ivf.topK]]), INCLUDING the
    * k-means training pass ([[ivfTrainedCte]]): assign the full corpus
    * against the TRAINED codebook, probe the query's NProbe nearest
    * lists, exact-cosine rank the survivors.
    */
  val ivfTopK: String = {
    import graft.textops.Ivf
    val D = graft.textops.Similarity.Dim
    s"""WITH $embCte,
nv AS (SELECT vec_id, label, v, ${duckNorm("v")} AS nrm FROM e),
$ivfTrainedCte,
dist AS (
  SELECT e.vec_id, t.cid,
    list_sum(list_transform(range($D), i ->
      (v[i+1] - t.vec[i+1]) * (v[i+1] - t.vec[i+1]))) AS d
  FROM e, trained t),
assign AS (
  SELECT vec_id, cid AS list_id FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM dist)
  WHERE rn = 1),
probes AS (
  SELECT cid AS list_id FROM dist WHERE vec_id = ${Ivf.QueryVecId}
  ORDER BY d, cid LIMIT ${Ivf.NProbe}),
q AS (SELECT v AS qv, nrm AS qnrm FROM nv WHERE vec_id = ${Ivf.QueryVecId})
SELECT n.vec_id, n.label, round(${duckDot("n.v", "qv")} / (n.nrm * qnrm), 6) AS sim
FROM assign a JOIN nv n ON n.vec_id = a.vec_id, q
WHERE a.list_id IN (SELECT list_id FROM probes) AND a.vec_id <> ${Ivf.QueryVecId}
ORDER BY sim DESC, n.vec_id LIMIT ${Ivf.TopK}"""
  }

  /** Corpus + planted near-duplicates (mirrors
    * [[graft.textops.Similarity.plantedCorpus]]): every PlantEvery-th
    * vector re-appears with coordinates scaled by 1 + (h%101 - 50)/1000.
    */
  private val plantedCorpusCte: String =
    s"""corpus AS (
  SELECT vec_id, v FROM e
  UNION ALL
  SELECT vid + ${Similarity.PlantIdOffset} AS vec_id,
    list_transform(range(${Similarity.Dim}), i -> v[CAST(i AS INT)+1] * (1.0 +
      CAST(${h32("'pert-' || CAST(vid AS VARCHAR) || '-' || CAST(i AS VARCHAR)")} % 101 - 50 AS DOUBLE) / 1000.0)) AS v
  FROM (SELECT vec_id AS vid, v FROM e WHERE vec_id % ${Similarity.PlantEvery} = 0))"""

  val embeddingNearDup: String = {
    val T = Similarity.NearDupTables
    val B = Similarity.NearDupBits
    s"""WITH $embCte,
pl AS (SELECT ${Similarity.duckPlanes(T * B)} AS ps),
$plantedCorpusCte,
nv AS (SELECT vec_id, v, ${duckNorm("v")} AS nrm FROM corpus),
buckets AS (
  SELECT vec_id, CAST(u.t AS INT) AS tbl, ${duckSignature("v", "CAST(u.t AS INT)", B)} AS bucket
  FROM corpus, pl, UNNEST(range($T)) u(t)),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT id_a, id_b, sim FROM (
  SELECT id_a, id_b,
    round(${duckDot("na.v", "nb.v")} / (na.nrm * nb.nrm), 6) AS sim
  FROM cand JOIN nv na ON na.vec_id = id_a JOIN nv nb ON nb.vec_id = id_b)
WHERE sim >= ${Similarity.NearDupCosine} ORDER BY id_a, id_b"""
  }

  // ---- L-stage oracles (graft.textops.LlmFormat) ----

  import graft.textops.LlmFormat

  /** The L1 prompt expression over `documents` columns (shared by the
    * prompt-build oracle and the serve-debug oracle).
    */
  private val promptExprSql: String = {
    val q = LlmFormat.Question
    val fmtIns = s"""chr(10) || chr(10) || 'Return the answer as JSON matching this format: ' || '${LlmFormat.AnswerTemplate}'"""
    val exIns = s"""chr(10) || 'Example: ' || '${LlmFormat.AnswerExample}'"""
    s"""'Context: ' ||
  (CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = ''
        THEN '${LlmFormat.EmptyContextSentinel}' ELSE text END) ||
  chr(10) || chr(10) || 'Question: ' || '$q' ||
  (CASE doc_id % 3
     WHEN 0 THEN $fmtIns || $exIns
     WHEN 1 THEN $fmtIns
     ELSE '' END) ||
  chr(10) || chr(10) || 'Based on the context above, answer directly and objectively.'"""
  }

  val promptBuild: String =
    s"""SELECT doc_id, $promptExprSql AS full_prompt
FROM documents ORDER BY doc_id"""

  /** DuckDB mirror of the L5 battery for one key over column `resp`. */
  private def duckBattery(key: String): String = {
    val pats = LlmFormat.keyPatterns(key)
    val tries = pats.map(p => s"nullif(regexp_extract(resp, '$p', 1), '')")
    s"regexp_replace(coalesce(${tries.mkString(", ")}, NULL), '[,;.]+$$', '')"
  }

  private val syntheticKvSql: String =
    """'name: ' || coalesce(nullif(string_split(text, ' ')[1], ''), 'empty') ||
 ', total: ' || CAST(doc_id % 100 AS VARCHAR) || '.5' ||
 chr(10) || 'date: 12/03/2024' || chr(10) || 'cnpj: 12.345.678/0001-99'"""

  val extractValues: String =
    s"""WITH r AS (SELECT doc_id, $syntheticKvSql AS resp FROM documents)
SELECT doc_id,
  ${duckBattery("name")} AS name,
  ${duckBattery("total")} AS total,
  ${duckBattery("date")} AS date,
  ${duckBattery("cnpj")} AS cnpj
FROM r ORDER BY doc_id"""

  /** Expected L4 outputs derived analytically from the synthetic reply
    * construction (method 1 / 2 / 3 / 5 of the cascade respectively).
    */
  val formatResponse: String =
    s"""WITH w AS (
  SELECT doc_id,
    coalesce(nullif(string_split(text, ' ')[1], ''), 'empty') AS w1,
    CAST(doc_id % 100 AS VARCHAR) AS n
  FROM documents)
SELECT doc_id,
  CASE doc_id % 4
    WHEN 0 THEN '{"name": "' || w1 || '", "total": ' || n || '}'
    WHEN 1 THEN '{"name": "' || w1 || '"}'
    WHEN 2 THEN '{"name": "' || w1 || '", "total": "' || n || '.5"}'
    ELSE 'no structured data about ' || w1 END AS formatted
FROM w ORDER BY doc_id"""

  /** The synthetic raw LLM reply (mirrors
    * [[graft.textops.LlmFormat.syntheticReply]]) over `documents` columns.
    */
  private val rawReplyExprSql: String =
    """CASE doc_id % 4
    WHEN 0 THEN '{"name": "' || w1 || '", "total": ' || n || '}'
    WHEN 1 THEN 'Result follows: {"name": "' || w1 || '"} -- end'
    WHEN 2 THEN 'name: ' || w1 || ', total: ' || n || '.5' || chr(10) || 'date: 12/03/2024'
    ELSE '   no structured data about ' || w1 || '   ' END"""

  /** Expected L4 output for the synthetic reply, analytically (same CASE as
    * [[formatResponse]]).
    */
  private val formattedExprSql: String =
    """CASE doc_id % 4
    WHEN 0 THEN '{"name": "' || w1 || '", "total": ' || n || '}'
    WHEN 1 THEN '{"name": "' || w1 || '"}'
    WHEN 2 THEN '{"name": "' || w1 || '", "total": "' || n || '.5"}'
    ELSE 'no structured data about ' || w1 END"""

  /** Q3 debug projection oracle ([[graft.serve.Queries.debug]]): extracted
    * content + V5 tool label, full prompt, raw vs formatted response, with
    * lengths.
    */
  val serveDebug: String =
    s"""WITH ex AS (
  SELECT doc_id, CAST(substr(doc_id, 5) AS BIGINT) AS did,
    coalesce(string_agg(text, chr(10) ORDER BY "offset") FILTER (WHERE kind = 'text'), '') AS extracted_content
  FROM (${ExtractOracle.sql(None)})
  GROUP BY doc_id),
llm AS (
  SELECT doc_id AS did,
    $promptExprSql AS full_prompt,
    $rawReplyExprSql AS raw_response,
    $formattedExprSql AS formatted_response
  FROM (SELECT doc_id, text,
          coalesce(nullif(string_split(text, ' ')[1], ''), 'empty') AS w1,
          CAST(doc_id % 100 AS VARCHAR) AS n
        FROM documents))
SELECT ex.doc_id,
  CASE ex.did % 5 WHEN 0 THEN 'python-docx' WHEN 1 THEN 'openpyxl'
    WHEN 2 THEN 'PyMuPDF + Tesseract OCR' WHEN 3 THEN 'Tesseract OCR'
    WHEN 4 THEN 'HTML boilerplate strip' ELSE 'Unknown' END AS tool,
  extracted_content, len(extracted_content) AS content_chars,
  full_prompt, len(full_prompt) AS prompt_chars,
  raw_response, len(raw_response) AS response_chars,
  formatted_response, len(formatted_response) AS formatted_chars
FROM ex JOIN llm ON ex.did = llm.did
ORDER BY ex.doc_id"""

  /** Q8 catalog filter-project-sort oracle
    * ([[graft.serve.Catalog.generateContentModels]]).
    */
  val catalogModels: String = {
    import graft.serve.Catalog
    val vts = Catalog.VersionTokens.map(v => s"'$v'").mkString("[", ", ", "]")
    s"""WITH cat AS (
  SELECT 'models/' || source || '-' || vt AS name,
    'Serves ' || lang || ' corpora from ' || source || ' with seed ' ||
      CAST(did AS VARCHAR) || '. Suited for extraction pipelines. Snapshot v' || vt AS description,
    list_concat(list_concat(['countTokens'],
      CASE WHEN did % 3 <> 0 THEN ['generateContent'] ELSE CAST([] AS VARCHAR[]) END),
      CASE WHEN did % 4 = 0 THEN ['embedContent'] ELSE CAST([] AS VARCHAR[]) END) AS methods
  FROM (SELECT doc_id AS did, source, lang,
          ($vts)[CAST(${h32("'model-' || CAST(doc_id AS VARCHAR)")} % ${Catalog.VersionTokens.size} AS INT) + 1] AS vt
        FROM documents WHERE doc_id < ${Catalog.NumModels})),
proj AS (
  SELECT regexp_replace(name, '^models/', '') AS model,
    string_split(description, '.')[1] AS summary
  FROM cat WHERE list_contains(methods, 'generateContent'))
SELECT model, summary,
  contains(model, '2.5') AS pref_25, contains(model, '2.0') AS pref_20,
  contains(model, '1.5') AS pref_15, contains(model, 'flash') AS pref_flash
FROM proj
ORDER BY pref_25 DESC, pref_20 DESC, pref_15 DESC, pref_flash DESC, model, summary"""
  }

  /** P2 LLM-stage oracle ([[graft.llm.LlmStage.stageQuery]]): prompt (L1,
    * no-instructions variant) → deterministic echo transport reply →
    * L4-formatted. The echo reply is `name: {ascii-letters of context's
    * first word}, ref: {h32(full_prompt)}`.
    */
  /** The echo-transport P2→P3 chain over any `(doc_id, text)` source
    * subquery — ONE definition shared by [[llmStage]] (raw documents) and
    * [[llmPipeline]] (extracted text), mirroring the shared
    * promptFromSpans/formattedCol expressions on the Spark side.
    */
  private def echoChainSql(src: String): String = {
    val q = LlmFormat.Question
    val tail = "chr(10) || chr(10) || 'Based on the context above, answer directly and objectively.'"
    s"""WITH src AS ($src),
p AS (
  SELECT doc_id,
    CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = ''
         THEN '${LlmFormat.EmptyContextSentinel}' ELSE text END AS ctx
  FROM src),
fp AS (
  SELECT doc_id, ctx,
    'Context: ' || ctx || chr(10) || chr(10) || 'Question: ' || '$q' || $tail AS full_prompt
  FROM p),
r AS (
  SELECT doc_id,
    coalesce(nullif(regexp_replace(regexp_extract(ctx, '^[^ \\n]*'), '[^A-Za-z]', '', 'g'), ''), 'empty') AS w1,
    CAST(${h32("full_prompt")} AS VARCHAR) AS h
  FROM fp)
SELECT doc_id,
  'name: ' || w1 || ', ref: ' || h AS llm_response,
  '{"name": "' || w1 || '", "ref": "' || h || '"}' AS formatted_response
FROM r ORDER BY doc_id"""
  }

  val llmStage: String = echoChainSql("SELECT doc_id, text FROM documents")

  /** The chained P1→P2→P3 pipeline (mirrors
    * [[graft.llm.LlmStage.pipelineQuery]]): the llmStage construction with
    * the context coming from the EXTRACTED text of each doc instead of the
    * raw documents table.
    */
  val llmPipeline: String = echoChainSql(
    s"""SELECT doc_id,
    coalesce(string_agg(text, chr(10) ORDER BY "offset")
               FILTER (WHERE kind = 'text'), '') AS text
  FROM (${ExtractOracle.sql(None)}) GROUP BY doc_id""")

  /** Media features over the extracted output's image spans — mirrors the
    * deterministic stub decode in graft.media.MediaFeatures.
    */
  val mediaFeatures: String =
    s"""SELECT doc_id, media_ref, "offset",
  CAST(64 + ${h32("media_ref || '#w'")} % 1857 AS INT) AS width,
  CAST(64 + ${h32("media_ref || '#h'")} % 1017 AS INT) AS height,
  CASE ${h32("media_ref || '#f'")} % 3
    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
  1024 + ${h32("media_ref || '#b'")} % 4194304 AS byte_size
FROM (${ExtractOracle.sql(None)})
WHERE kind = 'image'
ORDER BY doc_id, "offset""""

  /** Expected metadata of the media_decode round trip: the Spark side
    * PNG-encodes an image of these closed-form dimensions and emits what
    * `javax.imageio` DECODES back — a hash match proves the real decode
    * chain agrees with the encoder bit-for-bit on every ref.
    */
  val mediaDecode: String =
    s"""SELECT doc_id, media_ref, "offset",
  CAST(1 + ${h32("media_ref || '#w'")} % 48 AS INT) AS width,
  CAST(1 + ${h32("media_ref || '#h'")} % 48 AS INT) AS height,
  'png' AS format
FROM (${ExtractOracle.sql(None)})
WHERE kind = 'image'
ORDER BY doc_id, "offset""""

  // ---- CCNet-style bigram-LM scoring (graft.textops.LmScore) ----

  /** Shared CTE chain: words → exploded bigram hashes → counts → per-doc
    * score. Mirrors [[graft.textops.LmScore.scoreCore]] exactly:
    * per-term nll micro-quantized to BIGINT before the
    * (order-independent) sum. `trainCond` restricts which docs TRAIN
    * the counts + vocabulary (every doc is scored); unseen grams LEFT-
    * join to c12 = c1 = 0 — the full add-one penalty (for the
    * self-trained `TRUE` slice the LEFT joins bind every row, so the
    * values are identical to the original inner-join form).
    */
  private def lmScoreCtes(trainCond: String = "TRUE"): String = {
    import graft.textops.LmScore._
    s"""w AS (
  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents
), g0 AS (
  SELECT doc_id, unnest(list_transform(range(greatest(len(ws)-1, 0)),
    i -> struct_pack(p := ws[i+1], n := ws[i+2]))) AS pr FROM w
), g AS (
  SELECT doc_id, ${h60("pr.p || ' ' || pr.n")} AS bg_h, ${h60("pr.p")} AS u_h FROM g0
), tw AS (SELECT doc_id FROM documents WHERE $trainCond),
gt AS (SELECT g.* FROM g JOIN tw USING (doc_id)),
bc AS (SELECT bg_h, count(*) AS c12 FROM gt GROUP BY 1),
uc AS (SELECT u_h, count(*) AS c1 FROM gt GROUP BY 1),
v AS (SELECT count(DISTINCT ${h60("x")}) AS vv
      FROM (SELECT unnest(ws) AS x FROM w JOIN tw USING (doc_id))),
t AS (
  SELECT g.doc_id, CAST(round(1000000.0 *
    ln(CAST(COALESCE(c1, 0) + vv AS DOUBLE) / CAST(COALESCE(c12, 0) + $Smoothing AS DOUBLE)), 0) AS BIGINT) AS nll_micro
  FROM g LEFT JOIN bc USING (bg_h) LEFT JOIN uc USING (u_h) CROSS JOIN v
), d AS (
  SELECT doc_id, count(*) AS n_bigrams,
         CAST(sum(nll_micro) AS BIGINT) AS nll_micro_sum FROM t GROUP BY 1
), sc AS (
  SELECT w.doc_id, w.lang, len(ws) AS n_words,
    COALESCE(n_bigrams, 0) AS n_bigrams, nll_micro_sum,
    CASE WHEN n_bigrams IS NULL THEN NULL
         ELSE CAST(round(CAST(nll_micro_sum AS DOUBLE) / n_bigrams, 0) AS BIGINT)
    END AS avg_nll_micro
  FROM w LEFT JOIN d USING (doc_id))"""
  }

  /** Mirrors [[graft.textops.LmScore.score]]. */
  val lmScore: String = {
    import graft.textops.LmScore._
    s"""WITH ${lmScoreCtes()}
SELECT doc_id, lang, n_words, n_bigrams, nll_micro_sum, avg_nll_micro,
  COALESCE(avg_nll_micro <= $LmNllMaxMicro, false) AS keep
FROM sc ORDER BY doc_id"""
  }

  /** Mirrors [[graft.textops.LmScore.scoreCross]]: the LM trains on the
    * TrainLang slice only; every doc scores against the frozen counts.
    */
  val lmScoreCross: String = {
    import graft.textops.LmScore._
    s"""WITH ${lmScoreCtes(s"lang = '$TrainLang'")}
SELECT doc_id, lang, n_words, n_bigrams, nll_micro_sum, avg_nll_micro,
  COALESCE(avg_nll_micro <= $LmNllMaxMicro, false) AS keep
FROM sc ORDER BY doc_id"""
  }

  /** Mirrors [[graft.textops.LmScore.buckets]]: histogram-derived CCNet
    * head/middle/tail tertiles per language.
    */
  val pplBuckets: String = {
    import graft.textops.LmScore._
    s"""WITH ${lmScoreCtes()},
binned AS (
  SELECT doc_id, lang, avg_nll_micro, avg_nll_micro // $BinMicro AS bin
  FROM sc WHERE avg_nll_micro IS NOT NULL
), hist AS (
  SELECT lang, bin, count(*) AS cnt FROM binned GROUP BY 1, 2
), cum AS (
  SELECT lang, bin, sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY lang) AS total FROM hist
), cuts AS (
  SELECT lang, min(CASE WHEN cum * 3 >= total THEN bin END) AS head_cut,
         min(CASE WHEN cum * 3 >= total * 2 THEN bin END) AS mid_cut
  FROM cum GROUP BY 1
), b AS (
  SELECT sc.doc_id, sc.lang, sc.avg_nll_micro,
    sc.avg_nll_micro // $BinMicro AS bin,
    CASE WHEN sc.avg_nll_micro IS NULL THEN 'tail'
         WHEN sc.avg_nll_micro // $BinMicro <= head_cut THEN 'head'
         WHEN sc.avg_nll_micro // $BinMicro <= mid_cut THEN 'middle'
         ELSE 'tail' END AS bucket
  FROM sc LEFT JOIN cuts USING (lang))
SELECT doc_id, lang, avg_nll_micro, bin, bucket, bucket <> 'tail' AS keep
FROM b ORDER BY doc_id"""
  }

  /** DSIR importance resampling (mirrors [[graft.textops.Dsir.select]]). */
  val dsir: String = {
    import graft.textops.Dsir._
    s"""WITH w AS (
  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents
), f0 AS (
  SELECT doc_id, lang, unnest(list_concat(ws,
    list_transform(range(greatest(len(ws)-1, 0)), i -> ws[i+1] || ' ' || ws[i+2]))) AS gram
  FROM w
), f AS (
  SELECT doc_id, lang, ${h32("gram")} % $Buckets AS b FROM f0
), rawc AS (SELECT b, count(*) AS c_raw FROM f GROUP BY 1),
tgtc AS (SELECT b, count(*) AS c_tgt FROM f WHERE lang = '$TargetLang' GROUP BY 1),
tot AS (SELECT (SELECT count(*) FROM f) AS t_raw,
               (SELECT count(*) FROM f WHERE lang = '$TargetLang') AS t_tgt),
lam AS (
  SELECT b, CAST(round(1000000.0 * (
      ln(CAST(COALESCE(c_tgt, 0) + 1 AS DOUBLE) / CAST(t_tgt + $Buckets AS DOUBLE))
    - ln(CAST(COALESCE(c_raw, 0) + 1 AS DOUBLE) / CAST(t_raw + $Buckets AS DOUBLE))), 0) AS BIGINT) AS lam_micro
  FROM (SELECT unnest(range($Buckets)) AS b) bs
  LEFT JOIN rawc USING (b) LEFT JOIN tgtc USING (b) CROSS JOIN tot
), d AS (
  SELECT f.doc_id, count(*) AS n_grams,
         CAST(sum(lam_micro) AS BIGINT) AS w_micro_sum
  FROM f JOIN lam USING (b) GROUP BY 1
), sc AS (
  SELECT w.doc_id, w.lang, COALESCE(n_grams, 0) AS n_grams, w_micro_sum,
    CASE WHEN n_grams IS NULL THEN NULL
         ELSE CAST(round(CAST(w_micro_sum AS DOUBLE) / n_grams, 0) AS BIGINT)
    END AS avg_w_micro,
    CAST(round(-1000000.0 * ln(-ln(
      (CAST(${h32(s"'dsir:' || CAST(w.doc_id AS VARCHAR)")} % 1000000 AS DOUBLE) + 0.5)
      / 1000000.0)), 0) AS BIGINT) AS gumbel_micro
  FROM w LEFT JOIN d USING (doc_id))
SELECT doc_id, lang, n_grams, w_micro_sum, avg_w_micro, gumbel_micro,
  avg_w_micro + gumbel_micro AS score_micro,
  COALESCE(avg_w_micro + gumbel_micro >= $ThresholdMicro, false) AS keep
FROM sc ORDER BY doc_id"""
  }

  /** Asymmetric containment pairs (mirrors
    * [[graft.textops.Dedup.containment]]): rare-gram coverage of the
    * contained doc by the container. Gram CTE identical to
    * [[dupPassages]].
    */
  val containment: String = {
    import graft.textops.Dedup._
    s"""WITH $docGramCtes,
rare AS (
  SELECT dg.doc_id, dg.g FROM dg
  JOIN (SELECT g FROM dg GROUP BY g HAVING count(*) <= $ContainmentGramDfMax) f USING (g)),
nr AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rare FROM rare GROUP BY 1),
p AS (
  SELECT a.doc_id AS id_contained, b.doc_id AS id_container,
    CAST(count(*) AS BIGINT) AS n_shared
  FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY 1, 2),
r AS (
  SELECT id_contained, id_container, n_rare, n_shared,
    round(CAST(n_shared AS DOUBLE) / CAST(n_rare AS DOUBLE), 6) AS containment
  FROM p JOIN nr ON nr.doc_id = p.id_contained)
SELECT id_contained, id_container, n_rare, n_shared, containment
FROM r
WHERE containment >= $ContainmentThreshold AND n_rare >= $ContainmentMinGrams
ORDER BY id_contained, id_container"""
  }

  /** Incremental delta-vs-base dedup (mirrors
    * [[graft.textops.Dedup.incremental]]).
    */
  val incremental: String = {
    import graft.textops.Dedup._
    s"""WITH t AS (
  SELECT doc_id, ${h60("text")} AS text_hash,
    ${h32("'incr:' || CAST(doc_id AS VARCHAR)")} % 100 < $IncrementalBasePct AS in_base
  FROM documents),
base AS (SELECT DISTINCT text_hash FROM t WHERE in_base),
delta AS (SELECT doc_id, text_hash FROM t WHERE NOT in_base),
k AS (SELECT text_hash, min(doc_id) AS first_delta FROM delta GROUP BY 1)
SELECT d.doc_id, d.text_hash,
  b.text_hash IS NOT NULL AS dup_of_base,
  d.doc_id <> k.first_delta AS dup_in_delta,
  b.text_hash IS NULL AND d.doc_id = k.first_delta AS keep
FROM delta d
LEFT JOIN base b ON d.text_hash = b.text_hash
JOIN k ON d.text_hash = k.text_hash
ORDER BY d.doc_id"""
  }

  /** Corpus card (mirrors [[graft.textops.Corpus.stats]]): CUBE over
    * (lang, source) with explicit grouping id and null-free roll-up
    * sentinels.
    */
  val corpusStats: String = {
    import graft.textops.Corpus
    s"""WITH t AS (
  SELECT COALESCE(lang, '${Corpus.StatsNull}') AS lang,
    COALESCE(source, '${Corpus.StatsNull}') AS source,
    CAST(len(list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
    COALESCE(n_chars, 0) AS n_chars
  FROM documents)
SELECT CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT) AS gid,
  COALESCE(lang, '${Corpus.StatsAll}') AS lang,
  COALESCE(source, '${Corpus.StatsAll}') AS source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS tokens,
  CAST(sum(n_chars) AS BIGINT) AS chars
FROM t GROUP BY CUBE (lang, source)
ORDER BY gid, lang, source"""
  }

  /** Quality-gate ensemble (mirrors
    * [[graft.textops.Corpus.filterEnsemble]]): the audited single-signal
    * oracles embedded VERBATIM as derived tables — gopher ∧ classifier ∧
    * LM cut ∧ exact-dedup keeper — so the composition cannot drift from
    * the standalone definitions.
    */
  val filterEnsemble: String =
    s"""WITH g AS (SELECT doc_id, keep FROM ($gopherRules)),
c AS (SELECT doc_id, keep FROM ($qualityClassifier)),
l AS (SELECT doc_id, keep FROM ($lmScore)),
e AS (SELECT doc_id, is_duplicate FROM ($dedupExact))
SELECT g.doc_id, g.keep AS gopher_keep, c.keep AS clf_keep,
  NOT e.is_duplicate AS dedup_keep, l.keep AS lm_keep,
  g.keep AND c.keep AND NOT e.is_duplicate AND l.keep AS keep
FROM g JOIN c USING (doc_id) JOIN l USING (doc_id) JOIN e USING (doc_id)
ORDER BY doc_id"""

  /** Shared CTE chain for the SemDeDup family ([[semDedup]],
    * [[d4Diversity]]): trained-IVF assignment of the planted corpus
    * (`assign`: vec_id, cid, d) and the dropped near-dup set (`dropped`).
    */
  private lazy val semDedupCtes: String = {
    import graft.textops.Ivf
    val D = graft.textops.Similarity.Dim
    s"""$embCte,
$ivfTrainedCte,
$plantedCorpusCte,
nv AS (SELECT vec_id, v, ${duckNorm("v")} AS nrm FROM corpus),
cdist AS (
  SELECT c.vec_id, t.cid,
    list_sum(list_transform(range($D), i ->
      (c.v[i+1] - t.vec[i+1]) * (c.v[i+1] - t.vec[i+1]))) AS d
  FROM corpus c, trained t),
assign AS (
  SELECT vec_id, cid, d FROM (
    SELECT vec_id, cid, d, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM cdist)
  WHERE rn = 1),
dropped AS (
  SELECT DISTINCT x.vec_id
  FROM assign x JOIN assign y ON x.cid = y.cid AND x.vec_id <> y.vec_id
  JOIN nv nx ON nx.vec_id = x.vec_id
  JOIN nv ny ON ny.vec_id = y.vec_id
  WHERE (y.d > x.d OR (y.d = x.d AND y.vec_id < x.vec_id))
    AND round(${duckDot("nx.v", "ny.v")} / (nx.nrm * ny.nrm), 6) >= ${Ivf.SemDedupCosine})"""
  }

  /** SemDeDup (mirrors [[graft.textops.Ivf.semDedup]]): trained-IVF
    * cluster assignment of the planted corpus, within-cluster pairwise
    * cosine, drop when a near-identical neighbor is farther from the
    * centroid (id tiebreak).
    */
  val semDedup: String =
    s"""WITH $semDedupCtes
SELECT a.vec_id, a.cid AS cluster_id,
  d.vec_id IS NOT NULL AS is_dup, d.vec_id IS NULL AS keep
FROM assign a LEFT JOIN dropped d ON d.vec_id = a.vec_id
ORDER BY a.vec_id"""

  /** D4 diversification (mirrors [[graft.textops.Ivf.d4Diversity]]):
    * SemDeDup survivors ranked per cluster by (centroid distance, id);
    * keep iff rank > floor(survivors × ProtoFrac).
    */
  val d4Diversity: String = {
    import graft.textops.Ivf
    s"""WITH $semDedupCtes,
surv AS (
  SELECT a.vec_id, a.cid, a.d
  FROM assign a LEFT JOIN dropped dr ON dr.vec_id = a.vec_id
  WHERE dr.vec_id IS NULL),
r AS (
  SELECT vec_id, cid,
    CAST(row_number() OVER (PARTITION BY cid ORDER BY d, vec_id) AS BIGINT) AS proto_rank,
    count(*) OVER (PARTITION BY cid) AS n_surv
  FROM surv)
SELECT vec_id, cid AS cluster_id, proto_rank, n_surv,
  proto_rank > CAST(floor(n_surv * ${Ivf.ProtoFrac}) AS BIGINT) AS keep
FROM r ORDER BY vec_id"""
  }

  /** Top-k TF-IDF keywords (mirrors
    * [[graft.textops.TextAnalysis.tfidfKeywords]]): tf from the exploded
    * word table, df from the distinct (doc, word) table, smoothed
    * `ln((N+1)/(df+1))` idf in micro units, per-doc (score desc, word)
    * rank. Operand order matches the Spark side exactly
    * (1e6 · tf · ln(...), left-associative).
    */
  /** Shared w/tf/df/n/s CTE chain for [[tfidfKeywords]] and
    * [[searchRank]] — ONE definition of the frozen micro-unit score
    * (the twin of `TextAnalysis.scoredPostings`). `termFilter` is an
    * optional `WHERE` predicate over `word` applied before the tf
    * aggregate (empty string = the full vocabulary).
    */
  private def tfidfCtes(termFilter: String): String =
    s"""w AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM documents
), tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM w $termFilter GROUP BY doc_id, word
), df AS (
  SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word
), n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.word, tf.tf, df.df,
    CAST(round(1000000.0 * CAST(tf.tf AS DOUBLE)
      * ln((n.n + 1.0) / (CAST(df.df AS DOUBLE) + 1.0))) AS BIGINT) AS score_micro
  FROM tf JOIN df USING (word) CROSS JOIN n)"""

  val tfidfKeywords: String =
    s"""WITH ${tfidfCtes("")},
r AS (
  SELECT doc_id, word, tf, df, score_micro,
    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, word) AS BIGINT) AS kw_rank
  FROM s)
SELECT doc_id, kw_rank, word, tf, df, score_micro
FROM r WHERE kw_rank <= ${graft.textops.TextAnalysis.TfidfTopK}
ORDER BY doc_id, kw_rank"""

  /** Ranked conjunctive search (mirrors
    * [[graft.textops.TextAnalysis.searchRank]]): docs containing ALL
    * query terms, ranked by summed micro-unit TF-IDF (integer sum —
    * order-independent), (score desc, doc_id) top-k.
    */
  val searchRank: String = {
    import graft.textops.TextAnalysis
    val terms = inList(TextAnalysis.SearchTerms)
    s"""WITH ${tfidfCtes(s"WHERE word IN ($terms)")},
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
    CAST(sum(score_micro) AS BIGINT) AS score_micro
  FROM s GROUP BY doc_id)
SELECT doc_id, score_micro
FROM agg WHERE n_terms = ${TextAnalysis.SearchTerms.size}
ORDER BY score_micro DESC, doc_id LIMIT ${TextAnalysis.SearchTopK}"""
  }

  /** BM25-ranked conjunctive search (mirrors
    * [[graft.textops.TextAnalysis.bm25Search]]): same posting CTEs,
    * per-doc length table, exact-integer-sum/count avgdl, the Lucene
    * non-negative idf, micro-unit per-term scores summed per doc.
    * Every constant is the frozen literal from TextAnalysis (K1Plus1
    * and OneMinusB are literals, never derived arithmetic) and every
    * float expression mirrors the Spark operand order exactly.
    */
  val bm25Search: String = {
    import graft.textops.TextAnalysis
    val terms = inList(TextAnalysis.SearchTerms)
    s"""WITH ${tfidfCtes(s"WHERE word IN ($terms)")},
dl AS (
  SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS dl
  FROM documents
), a AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
b AS (
  SELECT tf.doc_id,
    CAST(round(1000000.0
      * ln((n.n - CAST(df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
      * ((CAST(tf.tf AS DOUBLE) * ${TextAnalysis.Bm25K1Plus1})
         / (CAST(tf.tf AS DOUBLE) + ${TextAnalysis.Bm25K1}
            * (${TextAnalysis.Bm25OneMinusB} + ${TextAnalysis.Bm25B}
               * (CAST(dl.dl AS DOUBLE) / a.avgdl))))) AS BIGINT) AS term_score
  FROM tf JOIN df USING (word) JOIN dl USING (doc_id) CROSS JOIN n CROSS JOIN a
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
    CAST(sum(term_score) AS BIGINT) AS score_micro
  FROM b GROUP BY doc_id)
SELECT doc_id, score_micro
FROM agg WHERE n_terms = ${TextAnalysis.SearchTerms.size}
ORDER BY score_micro DESC, doc_id LIMIT ${TextAnalysis.SearchTopK}"""
  }
}
