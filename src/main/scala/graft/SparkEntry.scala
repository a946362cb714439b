package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.synth.SpanSynth
import graft.extract.Extractor

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: full extraction pipeline (synth → dispatch → extract) on
    * sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Extractor.extract(SpanSynth.docsInput(spark, "/root/testdata/sf0.001"))

  /** Exploded (flat) extracted output ordered deterministically. */
  private def extractFlat(spark: SparkSession, dir: String, cls: Option[Int]): DataFrame = {
    val in = SpanSynth.docsInput(spark, dir)
    val filtered = cls match {
      case Some(c) => in.where(
        pmod(substring(col("doc_id"), 5, 8).cast("long"), lit(5L)) === c)
      case None => in
    }
    Extractor.extract(filtered)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.kind").as("kind"), col("s.text").as("text"),
        col("s.media_ref").as("media_ref"), col("s.offset").as("offset"))
      .orderBy(col("doc_id"), col("offset"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "synth_spans" -> ((s, dir) =>
      SpanSynth.flatSpans(s, dir).orderBy(col("doc_id"), col("offset"))),
    "extract_full" -> ((s, dir) => extractFlat(s, dir, None)),
    // per-extractor slices (doc class = doc_id % 5): E3, E4, E2, E1, E7
    "extract_paragraphs" -> ((s, dir) => extractFlat(s, dir, Some(0))),
    "extract_tabular" -> ((s, dir) => extractFlat(s, dir, Some(1))),
    "extract_pdf_layout" -> ((s, dir) => extractFlat(s, dir, Some(2))),
    "extract_ocr" -> ((s, dir) => extractFlat(s, dir, Some(3))),
    "extract_html" -> ((s, dir) => extractFlat(s, dir, Some(4))),
    // serving surface (SURVEY.md §2.6): queue scan, point lookup, metrics,
    // dead-letter scan
    "serve_queue" -> ((s, dir) => graft.serve.Queries.queue(s, dir)),
    "serve_lookup" -> ((s, dir) => graft.serve.Queries.lookup(s, dir, "doc-00000042")),
    "serve_debug" -> ((s, dir) => graft.serve.Queries.debug(s, dir)),
    "extract_metrics" -> ((s, dir) => graft.serve.Queries.metricsByClass(s, dir)),
    "dead_letter_scan" -> ((s, dir) => graft.serve.Queries.deadLetters(s, dir)),
    "dead_letter_oversize" -> ((s, dir) => graft.serve.Queries.oversizeDeadLetters(s, dir)),
    "catalog_models" -> ((s, dir) => graft.serve.Catalog.generateContentModels(s, dir)),
    // training-data ops: dedup family
    "dedup_exact" -> ((s, dir) => graft.textops.Dedup.exact(s, dir)),
    "dedup_clusters" -> ((s, dir) => graft.textops.Dedup.nearDupClusters(s, dir)),
    "dedup_ngram_jaccard" -> ((s, dir) => graft.textops.Dedup.ngramJaccard(s, dir)),
    // exact-substring (passage-level) dedup: cross-doc duplicate 5-grams
    "dedup_passages" -> ((s, dir) => graft.textops.Dedup.dupPassages(s, dir)),
    // RefinedWeb-style paragraph removal: edits docs, drops boilerplate
    "dedup_paragraphs" -> ((s, dir) => graft.textops.Dedup.dedupParagraphs(s, dir)),
    "dedup_minhash_lsh" -> ((s, dir) => graft.textops.Dedup.minhashLsh(s, dir)),
    "dedup_simhash" -> ((s, dir) => graft.textops.Dedup.simhashFingerprints(s, dir)),
    "dedup_simhash_pairs" -> ((s, dir) => graft.textops.Dedup.simhashPairs(s, dir)),
    // similarity search over embeddings
    "sim_topk_brute" -> ((s, dir) => graft.textops.Similarity.bruteForceTopK(s, dir)),
    "sim_topk_lsh" -> ((s, dir) => graft.textops.Similarity.lshTopK(s, dir)),
    "sim_topk_ivf" -> ((s, dir) => graft.textops.Ivf.topK(s, dir)),
    "embed_near_dup" -> ((s, dir) => graft.textops.Similarity.embeddingNearDup(s, dir)),
    // text analysis
    "text_lang_id" -> ((s, dir) => graft.textops.TextAnalysis.langId(s, dir)),
    "text_quality" -> ((s, dir) => graft.textops.TextAnalysis.quality(s, dir)),
    "text_tokens" -> ((s, dir) => graft.textops.TextAnalysis.tokenCounts(s, dir)),
    "text_fingerprint" -> ((s, dir) => graft.textops.TextAnalysis.fingerprint(s, dir)),
    "text_repetition" -> ((s, dir) => graft.textops.TextAnalysis.repetition(s, dir)),
    "text_gopher" -> ((s, dir) => graft.textops.TextAnalysis.gopherRules(s, dir)),
    // frozen-weight linear quality classifier (CCNet-style scored filter)
    "text_quality_clf" -> ((s, dir) => graft.textops.TextAnalysis.qualityClassifier(s, dir)),
    // PII redaction (planted fixture PII; email -> ip -> phone order)
    "text_pii_scrub" -> ((s, dir) => graft.textops.TextAnalysis.piiScrub(s, dir)),
    // C4 line-level cleaning (planted line structure; Raffel et al. 2020)
    "text_c4_clean" -> ((s, dir) => graft.textops.TextAnalysis.c4Clean(s, dir)),
    // Unicode fixing: C0 strip + NFC normalize (planted decomposed marks)
    "text_fix_unicode" -> ((s, dir) => graft.textops.TextAnalysis.fixUnicode(s, dir)),
    // the text-REPAIR capstone: unicode fix -> C4 line/page rules ->
    // cross-doc line dedup, composed from the audited definitions
    "corpus_clean" -> ((s, dir) => graft.textops.TextAnalysis.cleanPipeline(s, dir)),
    // benchmark decontamination: 5-gram overlap vs the benchmark subset
    "corpus_decontam" -> ((s, dir) => graft.textops.Decontam.decontaminate(s, dir)),
    // SemDeDup: k-means-clustered embedding dedup, centroid-distance keeper
    "dedup_semantic" -> ((s, dir) => graft.textops.Ivf.semDedup(s, dir)),
    "embed_diversity" -> ((s, dir) => graft.textops.Ivf.d4Diversity(s, dir)),
    "text_tfidf_keywords" -> ((s, dir) => graft.textops.TextAnalysis.tfidfKeywords(s, dir)),
    "text_search" -> ((s, dir) => graft.textops.TextAnalysis.searchRank(s, dir)),
    "text_search_bm25" -> ((s, dir) => graft.textops.TextAnalysis.bm25Search(s, dir)),
    // asymmetric containment dedup (quote-inclusion / aggregator pages)
    "dedup_containment" -> ((s, dir) => graft.textops.Dedup.containment(s, dir)),
    // delta-vs-base incremental exact dedup (the daily-crawl shape)
    "dedup_incremental" -> ((s, dir) => graft.textops.Dedup.incremental(s, dir)),
    // corpus card: CUBE roll-up of doc/token/char totals
    "corpus_stats" -> ((s, dir) => graft.textops.Corpus.stats(s, dir)),
    // Dolma-style gate stack: gopher AND clf AND lm AND dedup-keeper
    "corpus_filter_ensemble" -> ((s, dir) => graft.textops.Corpus.filterEnsemble(s, dir)),
    // CCNet-style bigram-LM scoring + per-lang perplexity tertiles
    "text_lm_score" -> ((s, dir) => graft.textops.LmScore.score(s, dir)),
    // CCNet deployment shape: train on the clean slice, score everything
    "text_lm_score_cross" -> ((s, dir) => graft.textops.LmScore.scoreCross(s, dir)),
    "corpus_ppl_buckets" -> ((s, dir) => graft.textops.LmScore.buckets(s, dir)),
    // DSIR hashed-ngram importance resampling
    "corpus_dsir" -> ((s, dir) => graft.textops.Dsir.select(s, dir)),
    // corpus construction: deterministic training-mix sampling + packing
    "corpus_sample" -> ((s, dir) => graft.textops.Corpus.sampleStratified(s, dir)),
    // domain-mix planning: sqrt-temperature source weights -> keep rates
    "corpus_mix_plan" -> ((s, dir) => graft.textops.Corpus.mixPlan(s, dir)),
    "corpus_pack" -> ((s, dir) => graft.textops.Corpus.packSequences(s, dir)),
    "corpus_pack_sharded" -> ((s, dir) => graft.textops.Corpus.packSequencesSharded(s, dir)),
    "corpus_pack_shuffled" -> ((s, dir) => graft.textops.Corpus.packSequencesShuffled(s, dir)),
    // the composed end-to-end corpus build: tag -> dedup -> sample -> pack
    "corpus_build" -> ((s, dir) => graft.textops.Corpus.buildCorpus(s, dir)),
    // the CURATED build: classifier filter + benchmark exclusion +
    // decontamination + survivor-based mix rates + per-shard pack
    "corpus_curate" -> ((s, dir) => graft.textops.Corpus.curate(s, dir)),
    // multimodal plumbing (stubbed decode, real schema/batching)
    "media_features" -> ((s, dir) => graft.media.MediaFeatures.features(s, dir)),
    // REAL javax.imageio decode: PNG encode->decode round trip per image
    // span, oracle-checked against the closed-form dimensions
    "media_decode" -> ((s, dir) => graft.media.MediaFeatures.decodeRoundTrip(s, dir)),
    // LLM-stage string/JSON ops (L1 / L5 / L4)
    "llm_prompt_build" -> ((s, dir) => graft.textops.LlmFormat.promptBuildQuery(s, dir)),
    "llm_extract_values" -> ((s, dir) => graft.textops.LlmFormat.extractValuesQuery(s, dir)),
    "llm_format_response" -> ((s, dir) => graft.textops.LlmFormat.formatResponseQuery(s, dir)),
    // P2/L2/L3 plumbing with the deterministic echo transport (stubbed
    // network call; mapPartitions pooling shape is real)
    "llm_stage" -> ((s, dir) => graft.llm.LlmStage.stageQuery(s, dir)),
    // the full P1->P2->P3 chain over EXTRACTED text (the dataflow of
    // ExtractPipeline.runLlmStage, oracle-verified end to end)
    "llm_pipeline" -> ((s, dir) => graft.llm.LlmStage.pipelineQuery(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "synth_spans" ->
      s"""WITH ${SpanSynth.duckdbFlatCte}
SELECT doc_id, kind, text, media_ref, "offset" FROM synth ORDER BY doc_id, "offset"""",
    "extract_full" -> graft.verify.ExtractOracle.sql(None),
    "extract_paragraphs" -> graft.verify.ExtractOracle.sql(Some(0)),
    "extract_tabular" -> graft.verify.ExtractOracle.sql(Some(1)),
    "extract_pdf_layout" -> graft.verify.ExtractOracle.sql(Some(2)),
    "extract_ocr" -> graft.verify.ExtractOracle.sql(Some(3)),
    "extract_html" -> graft.verify.ExtractOracle.sql(Some(4)),
    "serve_queue" -> graft.verify.ExtractOracle.queueSql,
    "serve_lookup" -> graft.verify.ExtractOracle.lookupSql("doc-00000042"),
    "serve_debug" -> graft.verify.TextOracles.serveDebug,
    "extract_metrics" -> graft.verify.ExtractOracle.metricsSql,
    "dead_letter_scan" -> graft.verify.ExtractOracle.deadLetterSql,
    "dead_letter_oversize" -> graft.verify.ExtractOracle.oversizeSql(
      graft.serve.Queries.OversizeCapChars),
    "catalog_models" -> graft.verify.TextOracles.catalogModels,
    "dedup_exact" -> graft.verify.TextOracles.dedupExact,
    "dedup_clusters" -> graft.verify.TextOracles.nearDupClusters,
    "dedup_ngram_jaccard" -> graft.verify.TextOracles.ngramJaccard,
    "dedup_passages" -> graft.verify.TextOracles.dupPassages,
    "dedup_paragraphs" -> graft.verify.TextOracles.dedupParagraphs,
    "dedup_minhash_lsh" -> graft.verify.TextOracles.minhashLsh,
    "dedup_simhash" -> graft.verify.TextOracles.simhash,
    "dedup_simhash_pairs" -> graft.verify.TextOracles.simhashPairs,
    "sim_topk_brute" -> graft.verify.TextOracles.bruteForceTopK,
    "sim_topk_lsh" -> graft.verify.TextOracles.lshTopK,
    "sim_topk_ivf" -> graft.verify.TextOracles.ivfTopK,
    "embed_near_dup" -> graft.verify.TextOracles.embeddingNearDup,
    "text_lang_id" -> graft.verify.TextOracles.langId,
    "text_quality" -> graft.verify.TextOracles.quality,
    "text_tokens" -> graft.verify.TextOracles.tokenCounts,
    "text_fingerprint" -> graft.verify.TextOracles.fingerprint,
    "text_pii_scrub" -> graft.verify.TextOracles.piiScrub,
    "text_c4_clean" -> graft.verify.TextOracles.c4Clean,
    "text_fix_unicode" -> graft.verify.TextOracles.fixUnicode,
    "corpus_clean" -> graft.verify.TextOracles.corpusClean,
    "corpus_decontam" -> graft.verify.TextOracles.decontaminate,
    "dedup_semantic" -> graft.verify.TextOracles.semDedup,
    "embed_diversity" -> graft.verify.TextOracles.d4Diversity,
    "text_tfidf_keywords" -> graft.verify.TextOracles.tfidfKeywords,
    "text_search" -> graft.verify.TextOracles.searchRank,
    "text_search_bm25" -> graft.verify.TextOracles.bm25Search,
    "dedup_containment" -> graft.verify.TextOracles.containment,
    "dedup_incremental" -> graft.verify.TextOracles.incremental,
    "corpus_stats" -> graft.verify.TextOracles.corpusStats,
    "corpus_filter_ensemble" -> graft.verify.TextOracles.filterEnsemble,
    "text_lm_score" -> graft.verify.TextOracles.lmScore,
    "text_lm_score_cross" -> graft.verify.TextOracles.lmScoreCross,
    "corpus_ppl_buckets" -> graft.verify.TextOracles.pplBuckets,
    "corpus_dsir" -> graft.verify.TextOracles.dsir,
    "text_repetition" -> graft.verify.TextOracles.repetition,
    "text_gopher" -> graft.verify.TextOracles.gopherRules,
    "text_quality_clf" -> graft.verify.TextOracles.qualityClassifier,
    "corpus_sample" -> graft.verify.TextOracles.sampleStratified,
    "corpus_mix_plan" -> graft.verify.TextOracles.mixPlan,
    "corpus_pack" -> graft.verify.TextOracles.packSequences,
    "corpus_pack_sharded" -> graft.verify.TextOracles.packSequencesSharded,
    "corpus_pack_shuffled" -> graft.verify.TextOracles.packSequencesShuffled,
    "corpus_build" -> graft.verify.TextOracles.buildCorpus,
    "corpus_curate" -> graft.verify.TextOracles.corpusCurate,
    "media_features" -> graft.verify.TextOracles.mediaFeatures,
    "media_decode" -> graft.verify.TextOracles.mediaDecode,
    "llm_prompt_build" -> graft.verify.TextOracles.promptBuild,
    "llm_extract_values" -> graft.verify.TextOracles.extractValues,
    "llm_format_response" -> graft.verify.TextOracles.formatResponse,
    "llm_stage" -> graft.verify.TextOracles.llmStage,
    "llm_pipeline" -> graft.verify.TextOracles.llmPipeline
  )
}
