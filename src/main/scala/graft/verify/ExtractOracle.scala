package graft.verify

import graft.synth.SpanSynth

/** DuckDB SQL reproducing the full extraction kernel's output
  * ([[graft.extract.ExtractKernel]]) over the synthesized span table, for
  * the driver's oracle compare. Mirrors, rule for rule:
  *  - run segmentation on (kind, sheet-ness) changes in offset order
  *  - paragraph join (blanks kept) + python-strip        (reference utils.py:147-156)
  *  - OCR normalization chain per span                    (reference utils.py:61-65)
  *  - PDF reading order (page, x-cluster, y, offset)      (reference utils.py:92-122)
  *  - Excel sheet serialization w/ blank-row skip         (reference utils.py:183-200)
  *  - HTML main-content blocks + in-position image spans  (north_rule; synth
  *    construction is known analytically, so the oracle regenerates the kept
  *    paragraph blocks from the source words instead of parsing HTML)
  *  - empty-extraction sentinel                           (reference workers.py:70-75)
  *  - unknown-kind dead-letter (dropped)                  (reference utils.py:226-228)
  */
object ExtractOracle {

  private def pystrip(x: String): String =
    s"regexp_replace($x, '^\\s+|\\s+$$', '', 'g')"

  private def ocrnorm(x: String): String = {
    val lig = s"replace(replace($x, 'ﬁ', 'fi'), 'ﬂ', 'fl')"
    val dehyph = s"regexp_replace($lig, '­\\s*', '', 'g')"
    val ctrl = s"regexp_replace($dehyph, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')"
    val crlf = s"regexp_replace($ctrl, '\\r\\n?', chr(10), 'g')"
    val sp = s"regexp_replace($crlf, '[ \\t]+', ' ', 'g')"
    pystrip(sp)
  }

  private val P = SpanSynth.ParaWords

  /** Full oracle SQL; `cls` filters to one document class (doc_id % 5). */
  def sql(cls: Option[Int]): String = {
    val clsFilterSynth = cls.map(c => s"WHERE cls = $c").getOrElse("")
    val clsFilterD = cls.map(c => s"WHERE did % 5 = $c").getOrElse("")
    val para = s"coalesce(array_to_string(d.words[(u.j*$P+1):(u.j*$P+$P)], ' '), '')"
    s"""WITH ${SpanSynth.duckdbFlatCte},
seg0 AS (
  SELECT * , CASE WHEN kind='text' AND media_ref LIKE 'sheet:%' THEN kind || '#s' ELSE kind END AS rk
  FROM synth $clsFilterSynth
),
seg1 AS (
  SELECT *, CASE WHEN rk = lag(rk) OVER (PARTITION BY did ORDER BY "offset") THEN 0 ELSE 1 END AS chg
  FROM seg0
),
seg AS (
  SELECT *, SUM(chg) OVER (PARTITION BY did ORDER BY "offset" ROWS UNBOUNDED PRECEDING) AS run_id
  FROM seg1
),
pdfp AS (
  SELECT *, CAST(regexp_extract(media_ref, '^p(\\d+):', 1) AS INT) AS page,
         CAST(regexp_extract(media_ref, ':x(\\d+):', 1) AS INT) // 300 AS colx,
         CAST(regexp_extract(media_ref, ':y(\\d+)$$', 1) AS INT) AS y
  FROM seg WHERE rk='pdf'
),
run_out AS (
  SELECT did, run_id, CAST("offset" AS BIGINT) AS sub, 'image' AS kind,
         CAST(NULL AS VARCHAR) AS text, media_ref
  FROM seg WHERE rk='image'
  UNION ALL
  SELECT did, run_id, 0, 'text', txt, NULL FROM (
    SELECT did, run_id, ${pystrip(s"string_agg(coalesce(text,''), chr(10) ORDER BY \"offset\")")} AS txt
    FROM seg WHERE rk='text' GROUP BY did, run_id) WHERE txt <> ''
  UNION ALL
  SELECT did, run_id, 0, 'text', txt, NULL FROM (
    SELECT did, run_id, ${pystrip(s"string_agg(${ocrnorm("coalesce(text,'')")}, chr(10) ORDER BY \"offset\")")} AS txt
    FROM seg WHERE rk='ocr' GROUP BY did, run_id) WHERE txt <> ''
  UNION ALL
  SELECT did, run_id, 0, 'text', txt, NULL FROM (
    SELECT did, run_id, ${pystrip(s"string_agg(coalesce(text,''), chr(10) ORDER BY page, colx, y, \"offset\")")} AS txt
    FROM pdfp GROUP BY did, run_id) WHERE txt <> ''
  UNION ALL
  SELECT did, run_id, 0, 'text', txt, NULL FROM (
    SELECT did, run_id, ${pystrip("string_agg(block, '' ORDER BY first_off)")} AS txt FROM (
      SELECT did, run_id, media_ref, min("offset") AS first_off,
        'Sheet: ' || media_ref[7:] || chr(10) ||
        coalesce(string_agg(text, chr(10) ORDER BY "offset")
                   FILTER (WHERE ${pystrip("coalesce(text,'')")} <> '') || chr(10), '')
        || chr(10) AS block
      FROM seg WHERE rk='text#s' GROUP BY did, run_id, media_ref)
    GROUP BY did, run_id) WHERE txt <> ''
  UNION ALL
  SELECT s.did, s.run_id, CAST(u.j AS BIGINT), 'text', $para, NULL
  FROM seg s JOIN d ON s.did = d.did, UNNEST(range(d.np)) u(j)
  WHERE s.rk='html' AND NOT d.all_blank AND len($para) >= 3
  UNION ALL
  SELECT s.did, s.run_id, 1000000000, 'image', NULL, 'media://' || d.doc_id || '/0'
  FROM seg s JOIN d ON s.did = d.did
  WHERE s.rk='html' AND NOT d.all_blank AND d.did % 3 = 0
),
sentineld AS (
  SELECT d.did, d.doc_id FROM (SELECT * FROM d $clsFilterD) d
  LEFT JOIN (SELECT DISTINCT did FROM run_out) r ON d.did = r.did
  WHERE r.did IS NULL
),
outs AS (
  SELECT did, run_id, sub, kind, text, media_ref FROM run_out
  UNION ALL
  SELECT did, 0, 0, 'error',
         '[ERRO: Não foi possível extrair texto do arquivo ' || doc_id || ']', NULL
  FROM sentineld
),
final AS (
  SELECT o.did, 'doc-' || lpad(CAST(o.did AS VARCHAR), 8, '0') AS doc_id,
         o.kind, o.text, o.media_ref,
         CAST(row_number() OVER (PARTITION BY o.did ORDER BY o.run_id, o.sub) - 1 AS INT) AS "offset"
  FROM outs o
)
SELECT doc_id, kind, text, media_ref, "offset" FROM final ORDER BY doc_id, "offset""""
  }

  /** Per-doc status rows derived from the extracted output (serve Q1).
    * Sums are CAST to BIGINT: DuckDB `sum(BIGINT)` yields HUGEINT, while
    * Spark emits BIGINT, and the driver's value hash is type-sensitive.
    */
  def queueSql: String =
    s"""SELECT doc_id, cls, n_spans, n_images, n_errors, text_chars,
       CASE WHEN n_errors > 0 THEN 'ERROR' ELSE 'COMPLETED' END AS status
FROM (
  SELECT doc_id, CAST(substr(doc_id, 5) AS BIGINT) % 5 AS cls,
         count(*) AS n_spans,
         count(*) FILTER (WHERE kind = 'image') AS n_images,
         count(*) FILTER (WHERE kind = 'error') AS n_errors,
         CAST(sum(coalesce(len(text), 0)) AS BIGINT) AS text_chars
  FROM (${sql(None)})
  GROUP BY doc_id)
ORDER BY doc_id"""

  /** Point lookup with status-dependent projection (serve Q2). */
  def lookupSql(docId: String): String =
    s"""SELECT doc_id, count(*) AS n_spans,
       CASE WHEN count(*) FILTER (WHERE kind = 'error') > 0
            THEN 'ERROR' ELSE 'COMPLETED' END AS status,
       coalesce(string_agg(text, chr(10) ORDER BY "offset")
                  FILTER (WHERE kind = 'text'), '') AS extracted_text
FROM (${sql(None)})
WHERE doc_id = '$docId'
GROUP BY doc_id"""

  /** Per-class aggregate metrics (the VERBOSE counters as one aggregate).
    * Every sum is CAST to BIGINT (DuckDB sum→HUGEINT vs Spark BIGINT).
    */
  def metricsSql: String =
    s"""SELECT cls, count(*) AS n_docs, CAST(sum(n_spans) AS BIGINT) AS n_spans,
       CAST(sum(n_images) AS BIGINT) AS n_images,
       CAST(sum(n_errors) AS BIGINT) AS n_errors,
       CAST(sum(text_chars) AS BIGINT) AS text_chars
FROM (
  SELECT doc_id, CAST(substr(doc_id, 5) AS BIGINT) % 5 AS cls,
         count(*) AS n_spans,
         count(*) FILTER (WHERE kind = 'image') AS n_images,
         count(*) FILTER (WHERE kind = 'error') AS n_errors,
         CAST(sum(coalesce(len(text), 0)) AS BIGINT) AS text_chars
  FROM (${sql(None)})
  GROUP BY doc_id)
GROUP BY cls ORDER BY cls"""

  /** Unknown-kind dead-letter scan over the input spans. */
  def deadLetterSql: String =
    s"""WITH ${SpanSynth.duckdbFlatCte}
SELECT doc_id, kind, "offset" FROM synth
WHERE kind NOT IN ('text', 'pdf', 'ocr', 'html', 'image')
ORDER BY doc_id, "offset""""

  /** V2 oversize dead-letter scan (serve
    * [[graft.serve.Queries.oversizeDeadLetters]]).
    */
  def oversizeSql(capChars: Long): String =
    s"""WITH ${SpanSynth.duckdbFlatCte}
SELECT doc_id, span_chars, 'oversize' AS reason FROM (
  SELECT doc_id, CAST(sum(coalesce(len(text), 0)) AS BIGINT) AS span_chars
  FROM synth GROUP BY doc_id)
WHERE span_chars > $capChars ORDER BY doc_id"""
}
