package graft.synth

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesis of the interleaved-span input table from the flat
  * driver-generated `documents.parquet` (doc_id:int64, text, lang, source,
  * n_chars). Seeded purely by `doc_id` arithmetic — identical output across
  * runs, partition counts, and engines (the DuckDB oracle reproduces the
  * exact construction in SQL, see [[SpanSynth.duckdbFlatCte]]).
  *
  * Document classes (doc_id % 5):
  *   0 = plain paragraphs  (kind="text")             — exercises E3 (reference utils.py:130-162)
  *   1 = tabular sheet rows (kind="text", media_ref="sheet:Sx") — E4 (utils.py:164-206)
  *   2 = pdf layout blocks (kind="pdf", media_ref="p{page}:x{x}:y{y}", shuffled order) — E2 (utils.py:73-128)
  *   3 = ocr noise          (kind="ocr")             — E1 (utils.py:45-71)
  *   4 = html page          (kind="html")            — E7 (north_rule; no reference HTML path)
  * Plus: doc_id%3==0 → an image span interleaved after the first span
  * (classes 0-3) or an <img> inside the html (class 4); doc_id%25==5 →
  * all-blank text (sentinel path, reference workers.py:70-75);
  * doc_id%89==88 → one unknown-kind span appended (dead-letter path,
  * reference utils.py:226-228).
  */
object SpanSynth {

  val ParaWords = 12 // words per paragraph / pdf block / sheet row
  val CellWords = 3 // words per sheet cell
  val CellsPerRow = 4

  def loadDocuments(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** `(doc_id string, spans array<struct<kind,text,media_ref,offset>>)`. */
  def docsInput(spark: SparkSession, sfDir: String): DataFrame =
    synth(loadDocuments(spark, sfDir))

  /** Flat one-row-per-span view, ordered (doc_id, offset). */
  def flatSpans(spark: SparkSession, sfDir: String): DataFrame = {
    val df = docsInput(spark, sfDir)
    df.select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "s")))
      .select(col("doc_id"), col("s.kind").as("kind"), col("s.text").as("text"),
        col("s.media_ref").as("media_ref"), col("s.offset").as("offset"))
  }

  /** Build the nested span table from the flat documents table — fast path
    * via the native [[SynthKernel]] expression (equivalence-tested against
    * [[synthColumnar]]). One output row per input row, no explode, no
    * shuffle: at 100 TB each document's spans are assembled inside its own
    * row.
    */
  def synth(docs: DataFrame): DataFrame =
    docs.select(
      concat(lit("doc-"), lpad(docs("doc_id").cast("string"), 8, "0")).as("doc_id"),
      SynthKernel.synth_spans(docs("doc_id"), docs("text")).as("spans"))

  /** Same semantics, pure Catalyst column ops (higher-order functions
    * only) — the UDF-free reference implementation the equivalence spec
    * pins the kernel against.
    */
  def synthColumnar(docs: DataFrame): DataFrame = {
    // docs("...") pins resolution to the child plan — with an unresolved
    // col("doc_id"), lateral-column-alias resolution would capture the
    // aliased STRING doc_id output of this very select.
    val did = docs("doc_id") // int64
    val docKey = concat(lit("doc-"), lpad(did.cast("string"), 8, "0"))
    val words = split(docs("text"), " ")
    val nw = size(words)
    val np = floor((nw + lit(ParaWords - 1)) / lit(ParaWords.toDouble)).cast("int")
    val cls = pmod(did, lit(5L))
    val allBlank = pmod(did, lit(25L)) === 5

    def para(i: Column): Column =
      array_join(slice(words, i * ParaWords + 1, lit(ParaWords)), " ")

    def cell(i: Column, j: Int): Column =
      array_join(slice(words, i * ParaWords + j * CellWords + 1, lit(CellWords)), " ")

    def rowText(i: Column): Column =
      concat_ws("\t", (0 until CellsPerRow).map(j => cell(i, j)): _*)

    // pdf block geometry: 4 blocks per page in 2 columns x 2 rows
    def pdfMedia(i: Column): Column = {
      val page = floor(i / 4).cast("int")
      val k = pmod(i, lit(4))
      val x = pmod(k, lit(2)) * 300
      val y = floor(k / 2).cast("int") * 100
      concat(lit("p"), page.cast("string"), lit(":x"), x.cast("string"),
        lit(":y"), y.cast("string"))
    }

    def ocrNoise(t: Column): Column =
      concat(lit(" "),
        replace(replace(t, lit("fi"), lit("ﬁ")), lit("or"), lit("o\u00AD r")),
        lit("  "))

    val htmlParas = array_join(
      transform(sequence(lit(0), np - 1), j => concat(lit("<p>"), para(j), lit("</p>"))), "")
    val htmlImg = when(pmod(did, lit(3L)) === 0,
      concat(lit("<img src=\"media://"), docKey, lit("/0\">"))).otherwise(lit(""))
    val htmlText = concat(
      lit("<html><head><title>Doc "), docKey, lit("</title></head><body>"),
      lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></nav>"),
      lit("<div id=\"main\">"), htmlParas, htmlImg, lit("</div>"),
      lit("<div class=\"links\"><a href=\"/l1\">more stuff here</a> <a href=\"/l2\">other links page</a></div>"),
      lit("<footer><a href=\"/privacy\">Privacy</a> (c) 2025 Example Corp</footer>"),
      lit("</body></html>"))

    // base spans: struct(kind, text, media_ref, sk1, sk2); sk = input-order
    // sort keys (pdf blocks are deterministically shuffled via (i*7+3)%np)
    val baseText = transform(sequence(lit(0), np - 1), i =>
      struct(
        lit("text").as("kind"),
        when(allBlank, lit("")).when(pmod(did + i, lit(7L)) === 0, lit(""))
          .otherwise(para(i)).as("text"),
        lit(null).cast("string").as("media_ref"),
        i.as("sk1"), i.as("sk2")))

    val baseTab = transform(sequence(lit(0), np - 1), i =>
      struct(
        lit("text").as("kind"),
        when(allBlank, lit("")).when(pmod(did + i, lit(5L)) === 0, lit(""))
          .otherwise(rowText(i)).as("text"),
        concat(lit("sheet:S"), when(i * 2 < np, lit("0")).otherwise(lit("1"))).as("media_ref"),
        i.as("sk1"), i.as("sk2")))

    val basePdf = transform(sequence(lit(0), np - 1), i =>
      struct(
        lit("pdf").as("kind"),
        when(allBlank, lit("")).otherwise(para(i)).as("text"),
        pdfMedia(i).as("media_ref"),
        pmod(i * 7 + 3, np).as("sk1"), i.as("sk2")))

    val baseOcr = transform(sequence(lit(0), np - 1), i =>
      struct(
        lit("ocr").as("kind"),
        when(allBlank, lit("")).otherwise(ocrNoise(para(i))).as("text"),
        lit(null).cast("string").as("media_ref"),
        i.as("sk1"), i.as("sk2")))

    val baseHtml = array(struct(
      lit("html").as("kind"),
      when(allBlank, lit("")).otherwise(htmlText).as("text"),
      lit(null).cast("string").as("media_ref"),
      lit(0).as("sk1"), lit(0).as("sk2")))

    val base0 = when(cls === 4, baseHtml)
      .when(cls === 2, basePdf)
      .when(cls === 3, baseOcr)
      .when(cls === 1, baseTab)
      .otherwise(baseText)

    // pdf blocks arrive in shuffled input order: sort by (sk1, sk2)
    val sorted = array_sort(base0, (l, r) =>
      when(l.getField("sk1") < r.getField("sk1"), -1)
        .when(l.getField("sk1") > r.getField("sk1"), 1)
        .when(l.getField("sk2") < r.getField("sk2"), -1)
        .when(l.getField("sk2") > r.getField("sk2"), 1)
        .otherwise(0))

    val imgSpan = struct(lit("image").as("kind"),
      lit(null).cast("string").as("text"),
      concat(lit("media://"), docKey, lit("/0")).as("media_ref"),
      lit(0).as("sk1"), lit(0).as("sk2"))
    val withImg = when(cls < 4 && pmod(did, lit(3L)) === 0,
      concat(slice(sorted, lit(1), lit(1)), array(imgSpan),
        slice(sorted, lit(2), size(sorted) - 1)))
      .otherwise(sorted)

    val unkSpan = struct(lit("wingdings").as("kind"), lit("???").as("text"),
      lit(null).cast("string").as("media_ref"), lit(0).as("sk1"), lit(0).as("sk2"))
    val withUnk = when(pmod(did, lit(89L)) === 88, concat(withImg, array(unkSpan)))
      .otherwise(withImg)

    val spans = transform(withUnk, (s, i) => struct(
      s.getField("kind").as("kind"),
      s.getField("text").as("text"),
      s.getField("media_ref").as("media_ref"),
      i.cast("int").as("offset")))

    docs.select(docKey.as("doc_id"), spans.as("spans"))
  }

  /** DuckDB CTE reproducing the exact same flat span table, for the driver
    * oracle (the driver registers each parquet as a bare table name, e.g.
    * `documents`). Yields `synth(did, doc_id, kind, text, media_ref, offset,
    * cls)`; callers add ordering.
    */
  def duckdbFlatCte: String = {
    val p = ParaWords; val c = CellWords
    s"""
d AS (
  SELECT doc_id AS did,
         'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id,
         string_split(text, ' ') AS words,
         CAST(floor((len(string_split(text, ' ')) + ${p - 1}) / $p.0) AS INT) AS np,
         doc_id % 5 AS cls,
         (doc_id % 25 = 5) AS all_blank
  FROM documents
),
base AS (
  SELECT d.*, CAST(u.i AS INT) AS i,
    CASE WHEN cls=4 THEN 'html' WHEN cls=2 THEN 'pdf' WHEN cls=3 THEN 'ocr' ELSE 'text' END AS kind,
    coalesce(array_to_string(words[(u.i*$p+1):(u.i*$p+$p)], ' '), '') AS para
  FROM d, UNNEST(CASE WHEN cls=4 THEN [0] ELSE range(np) END) AS u(i)
),
base2 AS (
  SELECT did, doc_id, np, cls, i, kind,
    CASE
      WHEN all_blank THEN ''
      WHEN cls=0 AND (did + i) % 7 = 0 THEN ''
      WHEN cls=0 THEN para
      WHEN cls=1 AND (did + i) % 5 = 0 THEN ''
      WHEN cls=1 THEN
        coalesce(array_to_string(words[(i*$p+1):(i*$p+$c)], ' '), '') || chr(9) ||
        coalesce(array_to_string(words[(i*$p+${c + 1}):(i*$p+${2 * c})], ' '), '') || chr(9) ||
        coalesce(array_to_string(words[(i*$p+${2 * c + 1}):(i*$p+${3 * c})], ' '), '') || chr(9) ||
        coalesce(array_to_string(words[(i*$p+${3 * c + 1}):(i*$p+${4 * c})], ' '), '')
      WHEN cls=2 THEN para
      WHEN cls=3 THEN ' ' || replace(replace(para, 'fi', chr(64257)), 'or', 'o' || chr(173) || ' r') || '  '
      WHEN cls=4 THEN
        '<html><head><title>Doc ' || doc_id || '</title></head><body>' ||
        '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>' ||
        '<div id="main">' ||
        array_to_string(list_transform(range(np), j -> '<p>' || coalesce(array_to_string(words[(j*$p+1):(j*$p+$p)], ' '), '') || '</p>'), '') ||
        CASE WHEN did % 3 = 0 THEN '<img src="media://' || doc_id || '/0">' ELSE '' END ||
        '</div>' ||
        '<div class="links"><a href="/l1">more stuff here</a> <a href="/l2">other links page</a></div>' ||
        '<footer><a href="/privacy">Privacy</a> (c) 2025 Example Corp</footer>' ||
        '</body></html>'
    END AS text,
    CASE
      WHEN cls=1 THEN 'sheet:S' || (CASE WHEN i*2 < np THEN '0' ELSE '1' END)
      WHEN cls=2 THEN 'p' || CAST(CAST(floor(i/4) AS INT) AS VARCHAR)
                  || ':x' || CAST((i%4)%2*300 AS VARCHAR)
                  || ':y' || CAST(CAST(floor((i%4)/2) AS INT)*100 AS VARCHAR)
      ELSE NULL
    END AS media_ref,
    CASE WHEN cls=2 THEN (i*7+3) % np ELSE i END AS sk1,
    i AS sk2
  FROM base
),
ranked AS (
  SELECT *, 10 * (row_number() OVER (PARTITION BY did ORDER BY sk1, sk2)) AS ord
  FROM base2
),
allspans AS (
  SELECT did, doc_id, kind, text, media_ref, ord FROM ranked
  UNION ALL
  SELECT did, doc_id, 'image', NULL, 'media://' || doc_id || '/0', 15
  FROM d WHERE cls < 4 AND did % 3 = 0
  UNION ALL
  SELECT did, doc_id, 'wingdings', '???', NULL, 1000000000
  FROM d WHERE did % 89 = 88
),
synth AS (
  SELECT did, doc_id, kind, text, media_ref,
         CAST(row_number() OVER (PARTITION BY did ORDER BY ord) - 1 AS INT) AS "offset",
         did % 5 AS cls
  FROM allspans
)"""
  }
}
