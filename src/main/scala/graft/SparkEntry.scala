package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) + §7 (plan). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Round 20: per-row-compute-heavy entries wrap their input in
    * [[Tables.spread]] — a conditional repartition that fires only when
    * the scan arrives in fewer splits than cores (guide §2.5 input
    * skew; a no-op on a real multi-split corpus). Placed here, at the
    * binding, so each operator's own plan shape stays unchanged and the
    * spread is visible per key. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational anchors (§2 rows 20-22) ---
    "q1_pricing" -> ((s, dir) =>
      Relational.pricingSummary(Tables.lineitem(s, dir))),
    "q_revenue_nation" -> ((s, dir) =>
      Relational.revenueByNation(Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.nation(s, dir), Tables.region(s, dir))),
    "q_top_customers" -> ((s, dir) =>
      Relational.topCustomers(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir))),
    "q_order_priority" -> ((s, dir) =>
      Relational.orderPriority(Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q_promo_share" -> ((s, dir) =>
      Relational.promoShare(Tables.lineitem(s, dir), Tables.part(s, dir))),
    "q_shipping_priority" -> ((s, dir) =>
      Relational.shippingPriority(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir))),
    "q_forecast_revenue" -> ((s, dir) =>
      Relational.forecastRevenue(Tables.lineitem(s, dir))),
    "q_regional_revenue" -> ((s, dir) =>
      Relational.regionalRevenue(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir), Tables.supplier(s, dir),
        Tables.nation(s, dir), Tables.region(s, dir))),
    "q_returns_by_customer" -> ((s, dir) =>
      Relational.returnsByCustomer(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir), Tables.nation(s, dir))),
    // --- event analytics (§2 rows 1-4, 10, 14, 23) ---
    "q_event_scan" -> ((s, dir) => EventOps.eventScan(Tables.events(s, dir))),
    "q_match_stats" -> ((s, dir) => EventOps.matchStats(Tables.events(s, dir))),
    "q_summary" -> ((s, dir) => EventOps.summary(Tables.events(s, dir))),
    "q_per90" -> ((s, dir) => EventOps.per90(Tables.events(s, dir))),
    "q_weighted_ratio" -> ((s, dir) => EventOps.weightedRatio(Tables.events(s, dir))),
    "q_direction" -> ((s, dir) => EventOps.direction(Tables.events(s, dir))),
    "q_tumbling" -> ((s, dir) => EventOps.tumbling(Tables.events(s, dir))),
    "q_range_join" -> ((s, dir) => EventOps.rangeJoin(Tables.events(s, dir))),
    "q_pivot" -> ((s, dir) => EventOps.pivotCounts(Tables.events(s, dir))),
    "q_sliding" -> ((s, dir) => EventOps.sliding(Tables.events(s, dir))),
    "q_skew_join" -> ((s, dir) => Skew.skewJoinQuery(Tables.events(s, dir))),
    // --- stats / viz-feeding (§2 rows 5-9, 16, 19) ---
    "q_percentile" -> ((s, dir) => StatsOps.percentile(Tables.events(s, dir))),
    "q_topn" -> ((s, dir) => StatsOps.topN(Tables.events(s, dir))),
    "q_hist1d" -> ((s, dir) => StatsOps.hist1d(Tables.events(s, dir))),
    "q_heatmap2d" -> ((s, dir) => StatsOps.heatmap2d(Tables.events(s, dir))),
    "q_trend" -> ((s, dir) => StatsOps.trend(Tables.events(s, dir))),
    "q_position_counts" -> ((s, dir) => StatsOps.positionCounts(Tables.events(s, dir))),
    "q_radar_norm" -> ((s, dir) => StatsOps.radarNorm(Tables.events(s, dir))),
    "q_topk_per_group" -> ((s, dir) => StatsOps.topKPerGroup(Tables.events(s, dir))),
    "q_ntile" -> ((s, dir) => StatsOps.ntileDeciles(Tables.events(s, dir))),
    "q_anomaly" -> ((s, dir) => StatsOps.anomaly(Tables.events(s, dir))),
    // --- temporal (§2 rows 11-13) ---
    "q_sessionize" -> ((s, dir) => SessionOps.sessionize(Tables.events(s, dir))),
    "q_window_after" -> ((s, dir) => SessionOps.windowAfter(Tables.events(s, dir))),
    "q_key_join" -> ((s, dir) => SessionOps.keyJoin(Tables.events(s, dir))),
    "q_asof_join" -> ((s, dir) => SessionOps.asofJoin(Tables.events(s, dir))),
    "q_lag_delta" -> ((s, dir) => SessionOps.lagDelta(Tables.events(s, dir))),
    "q_journey" -> ((s, dir) => SessionOps.journey(Tables.events(s, dir))),
    "q_funnel" -> ((s, dir) => SessionOps.funnel(Tables.events(s, dir))),
    "q_funnel_latency" -> ((s, dir) => SessionOps.funnelLatency(Tables.events(s, dir))),
    "q_retention" -> ((s, dir) => SessionOps.retention(Tables.events(s, dir))),
    "q_session_window" -> ((s, dir) => SessionOps.sessionWindow(Tables.events(s, dir))),
    // --- geometry (§2 rows 15, 17, 18) ---
    "q_pitch_geometry" -> ((s, dir) => GeometryOps.pitchGeometry(Tables.events(s, dir))),
    "q_pass_segments" -> ((s, dir) => GeometryOps.passSegments(Tables.events(s, dir))),
    "q_receptions" -> ((s, dir) => GeometryOps.receptions(Tables.events(s, dir))),
    // --- dedup family (§2 rows 24-28) ---
    "q_dedup_exact" -> ((s, dir) => DedupOps.dedupExact(Tables.documents(s, dir))),
    "q_dedup_lines" -> ((s, dir) => DedupOps.dedupLines(Tables.documents(s, dir))),
    "q_boilerplate" -> ((s, dir) => DedupOps.boilerplate(Tables.documents(s, dir))),
    "q_dedup_canonical" -> ((s, dir) => DedupOps.dedupCanonical(Tables.documents(s, dir))),
    "q_dedup_minhash" -> ((s, dir) => DedupOps.dedupMinhash(Tables.documents(s, dir))),
    "q_dedup_minhash_wide" -> ((s, dir) => DedupOps.dedupMinhashWide(Tables.documents(s, dir))),
    "q_dedup_incremental" -> ((s, dir) => DedupOps.dedupIncremental(Tables.documents(s, dir))),
    "q_dedup_simhash" -> ((s, dir) => DedupOps.dedupSimhash(Tables.documents(s, dir))),
    "q_dedup_simhash_pairs" -> ((s, dir) => DedupOps.dedupSimhashPairs(Tables.documents(s, dir))),
    "q_dedup_ngram" -> ((s, dir) => DedupOps.dedupNgram(Tables.documents(s, dir))),
    "q_dedup_substring" -> ((s, dir) => DedupOps.dedupSubstring(Tables.documents(s, dir))),
    "q_dedup_substring_incremental" -> ((s, dir) =>
      DedupOps.dedupSubstringIncremental(Tables.documents(s, dir))),
    "q_substring_excise_incremental" -> ((s, dir) =>
      DedupOps.substringExciseIncremental(Tables.documents(s, dir))),
    "q_substring_excise_incremental_text" -> ((s, dir) =>
      DedupOps.substringExciseIncrementalText(Tables.documents(s, dir))),
    "q_substring_excise" -> ((s, dir) => DedupOps.substringExcise(Tables.documents(s, dir))),
    "q_substring_excise_text" -> ((s, dir) => DedupOps.substringExciseText(Tables.documents(s, dir))),
    "q_dedup_clusters" -> ((s, dir) => DedupOps.dedupClusters(Tables.documents(s, dir))),
    "q_dup_inflation" -> ((s, dir) => DedupOps.dupInflation(Tables.documents(s, dir))),
    "q_dedup_representative" -> ((s, dir) => DedupOps.dedupRepresentative(Tables.documents(s, dir))),
    "q_dedup_embedding" -> ((s, dir) => DedupOps.dedupEmbedding(Tables.spread(Tables.embeddings(s, dir), "vec_id"))),
    // NOT spread (round 21, VERDICT r20 item 1): the first phase is cheap
    // column slices straight into the band self-join's shuffle — the added
    // exchange was measured pure cost (0.83x in the r20 matched-band sweep).
    "q_dedup_embedding_lsh" -> ((s, dir) => DedupOps.dedupEmbeddingLsh(Tables.embeddings(s, dir))),
    "q_dedup_embedding_rp" -> ((s, dir) => DedupOps.dedupEmbeddingRp(Tables.embeddings(s, dir))),
    "q_dedup_embedding_clusters" -> ((s, dir) => DedupOps.dedupEmbeddingClusters(Tables.spread(Tables.embeddings(s, dir), "vec_id"))),
    "q_dedup_embedding_representative" -> ((s, dir) => DedupOps.dedupEmbeddingRepresentative(Tables.spread(Tables.embeddings(s, dir), "vec_id"))),
    "q_dedup_embedding_incremental" -> ((s, dir) => DedupOps.dedupEmbeddingIncremental(Tables.spread(Tables.embeddings(s, dir), "vec_id"))),
    // --- ANN (§2 rows 29-30) ---
    "q_ann_topk" -> ((s, dir) => AnnOps.annTopK(Tables.embeddings(s, dir))),
    "q_knn_graph" -> ((s, dir) => AnnOps.knnGraph(Tables.embeddings(s, dir))),
    "q_knn_graph_rp" -> ((s, dir) => AnnOps.knnGraphRp(Tables.spread(Tables.embeddings(s, dir), "vec_id"))),
    "q_quantize" -> ((s, dir) => AnnOps.quantize(Tables.spread(Tables.embeddings(s, dir), "vec_id"))),
    "q_ann_lsh" -> ((s, dir) => AnnOps.annLsh(Tables.embeddings(s, dir))),
    "q_ann_ivf_q8" -> ((s, dir) =>
      AnnOps.annIvfQ8(AnnOps.quantizedVectors(Tables.spread(Tables.embeddings(s, dir), "vec_id")))),
    // (oracle-checked since round 4 — quantized-integer centroids made
    // the probe order exact)
    "q_ann_ivf" -> ((s, dir) => AnnOps.annIvf(Tables.embeddings(s, dir))),
    "q_centroid" -> ((s, dir) => AnnOps.centroid(Tables.embeddings(s, dir))),
    "q_kmeans" -> ((s, dir) => AnnOps.kmeans(Tables.spread(Tables.embeddings(s, dir), "vec_id"))),
    "q_pq" -> ((s, dir) => AnnOps.pqEncode(Tables.spread(Tables.embeddings(s, dir), "vec_id"))),
    "q_pq_search" -> ((s, dir) => AnnOps.pqSearch(Tables.spread(Tables.embeddings(s, dir), "vec_id"))),
    // --- text analysis (§2 rows 31-34) ---
    "q_lang_id" -> ((s, dir) => TextOps.langId(Tables.documents(s, dir))),
    "q_quality" -> ((s, dir) => TextOps.quality(Tables.documents(s, dir))),
    "q_gopher" -> ((s, dir) => TextOps.gopher(Tables.documents(s, dir))),
    "q_gopher_rep" -> ((s, dir) => TextOps.gopherRep(Tables.spread(Tables.documents(s, dir)))),
    "q_dedup_lines_within" -> ((s, dir) =>
      TextOps.dedupLinesWithin(Tables.documents(s, dir))),
    "q_c4_clean" -> ((s, dir) => TextOps.c4Clean(Tables.documents(s, dir))),
    "q_c4_badwords" -> ((s, dir) => TextOps.c4Badwords(Tables.documents(s, dir))),
    "q_tokens" -> ((s, dir) => TextOps.tokenCounts(Tables.documents(s, dir))),
    "q_seqlen_hist" -> ((s, dir) => TextOps.seqlenHist(Tables.documents(s, dir))),
    "q_fingerprint" -> ((s, dir) => TextOps.fingerprint(Tables.documents(s, dir))),
    "q_redact" -> ((s, dir) => TextOps.redact(Tables.spread(Tables.documents(s, dir)))),
    "q_hash_embed" -> ((s, dir) => TextOps.hashEmbed(Tables.spread(Tables.documents(s, dir)))),
    "q_script_mix" -> ((s, dir) => TextOps.scriptMix(Tables.spread(Tables.documents(s, dir)))),
    "q_normalize" -> ((s, dir) => TextOps.normalize(Tables.documents(s, dir))),
    // --- crawl-ingest string cores + link graph (§2 rows 119-120, 123-124) ---
    "q_html_extract" -> ((s, dir) => HtmlOps.htmlExtract(Tables.documents(s, dir))),
    "q_url_dedup" -> ((s, dir) => UrlOps.urlDedup(Tables.documents(s, dir))),
    "q_link_extract" -> ((s, dir) => HtmlOps.linkExtract(Tables.documents(s, dir))),
    "q_anchor_text" -> ((s, dir) => HtmlOps.anchorText(Tables.documents(s, dir))),
    "q_meta_og" -> ((s, dir) => HtmlOps.metaOg(Tables.documents(s, dir))),
    "q_noindex" -> ((s, dir) => HtmlOps.noindexFlags(Tables.documents(s, dir))),
    "q_hreflang" -> ((s, dir) => HtmlOps.hreflang(Tables.documents(s, dir))),
    "q_jsonld" -> ((s, dir) => HtmlOps.jsonLd(Tables.documents(s, dir))),
    "q_pagination" -> ((s, dir) => HtmlOps.pagination(Tables.documents(s, dir))),
    // NOT spread (round 21): pagerank/frontier/sitemap are agg/shuffle-first
    // (link extraction is ~3 small regexes per doc; the downstream
    // distinct/groupBy already parallelizes) — the r20 wrap measured
    // 0.54x/0.57x/0.71x in the builder's own matched-band sweep.
    "q_pagerank" -> ((s, dir) => GraphOps.pagerank(Tables.documents(s, dir))),
    "q_robots_filter" -> ((s, dir) => CrawlOps.robotsFilter(Tables.documents(s, dir))),
    "q_robots_parse" -> ((s, dir) => CrawlOps.robotsParse(Tables.documents(s, dir))),
    "q_frontier" -> ((s, dir) => CrawlOps.frontier(Tables.documents(s, dir))),
    "q_crawl_schedule" -> ((s, dir) => CrawlOps.crawlSchedule(Tables.documents(s, dir))),
    "q_sitemap" -> ((s, dir) => CrawlOps.sitemapSeeds(Tables.documents(s, dir))),
    "q_feeds" -> ((s, dir) => CrawlOps.feeds(Tables.documents(s, dir))),
    "q_redirects" -> ((s, dir) => CrawlOps.redirects(Tables.documents(s, dir))),
    "q_recrawl" -> ((s, dir) => CrawlOps.recrawl(Tables.documents(s, dir))),
    "q_link_resolve" -> ((s, dir) => UrlOps.linkResolve(Tables.documents(s, dir))),
    "q_extract_clean" -> ((s, dir) => HtmlOps.extractClean(Tables.documents(s, dir))),
    "q_main_content" -> ((s, dir) => HtmlOps.mainContent(Tables.documents(s, dir))),
    "q_image_pairs" -> ((s, dir) => HtmlOps.imagePairs(Tables.documents(s, dir))),
    "q_media_pairs" -> ((s, dir) => HtmlOps.mediaPairs(Tables.documents(s, dir))),
    "q_image_dataset" -> ((s, dir) => HtmlOps.imageDataset(Tables.documents(s, dir))),
    "q_media_dataset" -> ((s, dir) => HtmlOps.mediaDataset(Tables.documents(s, dir))),
    "q_video_dataset" -> ((s, dir) => HtmlOps.videoDataset(Tables.documents(s, dir))),
    "q_crawl_traps" -> ((s, dir) => CrawlOps.crawlTraps(Tables.documents(s, dir))),
    // --- trained classifiers (§2 rows 101-103) ---
    "q_classifier_train" -> ((s, dir) =>
      ClassifierOps.nbTrain(Tables.documents(s, dir))),
    "q_classifier_score" -> ((s, dir) =>
      ClassifierOps.nbScore(Tables.documents(s, dir))),
    "q_classifier_filter" -> ((s, dir) =>
      ClassifierOps.nbFilter(Tables.documents(s, dir))),
    "q_embed_classify" -> ((s, dir) =>
      ClassifierOps.centroidClassify(Tables.spread(Tables.embeddings(s, dir), "vec_id"))),
    // --- corpus-pipeline composites (§2 rows 36-40) ---
    "q_sample" -> ((s, dir) => CorpusOps.sample(Tables.documents(s, dir))),
    "q_profile" -> ((s, dir) => CorpusOps.profile(Tables.documents(s, dir))),
    "q_drop_diff" -> ((s, dir) => CorpusOps.dropDiff(Tables.documents(s, dir))),
    "q_profile_by_source" -> ((s, dir) => CorpusOps.profileBySource(Tables.documents(s, dir))),
    "q_mixture" -> ((s, dir) => CorpusOps.mixture(Tables.documents(s, dir))),
    "q_source_divergence" -> ((s, dir) =>
      CorpusOps.sourceDivergence(Tables.documents(s, dir))),
    "q_split_divergence" -> ((s, dir) =>
      CorpusOps.splitDivergence(Tables.documents(s, dir))),
    "q_cooccurrence" -> ((s, dir) =>
      CorpusOps.cooccurrence(Tables.spread(Tables.documents(s, dir)))),
    "q_zipf_fit" -> ((s, dir) => CorpusOps.zipfFit(Tables.documents(s, dir))),
    "q_epoch_order" -> ((s, dir) => CorpusOps.epochOrder(Tables.documents(s, dir))),
    "q_ngram_counts" -> ((s, dir) => CorpusOps.ngramCounts(Tables.documents(s, dir))),
    "q_tfidf" -> ((s, dir) => CorpusOps.tfidf(Tables.spread(Tables.documents(s, dir)))),
    "q_rollup" -> ((s, dir) => CorpusOps.rollup(Tables.documents(s, dir))),
    "q_cube" -> ((s, dir) => CorpusOps.cube(Tables.documents(s, dir))),
    "q_corpus_filter" -> ((s, dir) => CorpusOps.corpusFilter(Tables.documents(s, dir))),
    "q_curate" -> ((s, dir) => CorpusOps.curate(Tables.documents(s, dir))),
    "q_curate_full" -> ((s, dir) => CorpusOps.curateFull(Tables.spread(Tables.documents(s, dir)))),
    "q_pdf_text" -> ((s, dir) => PdfOps.pdfText(Tables.spread(Tables.documents(s, dir)))),
    "q_epub_text" -> ((s, dir) => EpubOps.epubText(Tables.spread(Tables.documents(s, dir)))),
    "q_contamination" -> ((s, dir) => CorpusOps.contamination(Tables.documents(s, dir))),
    "q_contamination_ngram" -> ((s, dir) => CorpusOps.contaminationNgram(Tables.spread(Tables.documents(s, dir)))),
    "q_contamination_bloom" -> ((s, dir) => CorpusOps.contaminationBloom(Tables.spread(Tables.documents(s, dir)))),
    "q_repetition" -> ((s, dir) => CorpusOps.repetition(Tables.spread(Tables.documents(s, dir)))),
    "q_chunks" -> ((s, dir) => CorpusOps.chunks(Tables.documents(s, dir))),
    "q_pack" -> ((s, dir) => CorpusOps.pack(Tables.documents(s, dir))),
    "q_group_sample" -> ((s, dir) => CorpusOps.groupSample(Tables.documents(s, dir))),
    "q_token_budget" -> ((s, dir) => CorpusOps.tokenBudgetSample(Tables.documents(s, dir))),
    "q_token_budget_weighted" -> ((s, dir) => CorpusOps.tokenBudgetSampleWeighted(Tables.documents(s, dir))),
    "q_split" -> ((s, dir) => CorpusOps.split(Tables.documents(s, dir))),
    "q_upsample" -> ((s, dir) => CorpusOps.upsample(Tables.documents(s, dir))),
    "q_source_overlap" -> ((s, dir) => CorpusOps.sourceOverlap(Tables.spread(Tables.documents(s, dir)))),
    "q_split_leakage" -> ((s, dir) => CorpusOps.splitLeakage(Tables.documents(s, dir))),
    "q_lm_score" -> ((s, dir) => CorpusOps.lmScore(Tables.documents(s, dir))),
    "q_bm25" -> ((s, dir) => CorpusOps.bm25(Tables.spread(Tables.documents(s, dir)))),
    "q_bm25_multi" -> ((s, dir) => CorpusOps.bm25Multi(Tables.spread(Tables.documents(s, dir)))),
    // --- trained tokenizer (§2 rows 97-98) ---
    "q_bpe_train" -> ((s, dir) => BpeOps.train(Tables.spread(Tables.documents(s, dir)))),
    "q_bpe_encode" -> ((s, dir) => BpeOps.encodeSelf(Tables.spread(Tables.documents(s, dir)))),
    // --- composed end-to-end manifest (§2 row 99) ---
    "q_pipeline" -> ((s, dir) => CorpusOps.pipelineManifest(Tables.spread(Tables.documents(s, dir)))),
    // --- profile drift (§2 row 100) ---
    "q_profile_drift" -> ((s, dir) => CorpusOps.profileDriftSynthetic(Tables.documents(s, dir))),
    // --- multimodal plumbing (§2 rows 35, 131) ---
    "q_multimodal_meta" -> ((s, dir) => MultimodalOps.multimodalMeta(Tables.documents(s, dir))),
    "q_mime_sniff" -> ((s, dir) => MultimodalOps.mimeSniff(Tables.documents(s, dir))),
    "q_contamination_image" -> ((s, dir) =>
      MultimodalOps.contaminationImage(Tables.documents(s, dir))),
    "q_contamination_audio" -> ((s, dir) =>
      MultimodalOps.contaminationAudio(Tables.documents(s, dir))),
    "q_contamination_video" -> ((s, dir) =>
      AviOps.contaminationVideo(Tables.documents(s, dir))),
    "q_image_dedup_representative" -> ((s, dir) =>
      MultimodalOps.imageDedupRepresentative(Tables.spread(Tables.documents(s, dir)))),
    "q_audio_dedup_representative" -> ((s, dir) =>
      MultimodalOps.audioDedupRepresentative(Tables.spread(Tables.documents(s, dir)))),
    "q_video_dedup_representative" -> ((s, dir) =>
      AviOps.videoDedupRepresentativeQuery(Tables.spread(Tables.documents(s, dir)))),
    "q_mp4_meta" -> ((s, dir) => Mp4Ops.mp4Meta(Tables.documents(s, dir))),
    "q_mp3_meta" -> ((s, dir) => Mp3Ops.mp3Meta(Tables.documents(s, dir))),
    "q_webp_meta" -> ((s, dir) => WebpOps.webpMeta(Tables.documents(s, dir))),
    "q_ogg_meta" -> ((s, dir) => OggOps.oggMeta(Tables.documents(s, dir))),
    "q_media_inventory" -> ((s, dir) =>
      MediaOps.mediaInventory(Tables.documents(s, dir))),
    "q_url_filter" -> ((s, dir) => UrlOps.urlFilter(Tables.documents(s, dir))),
    "q_surt" -> ((s, dir) => UrlOps.surtQuery(Tables.documents(s, dir))),
    // --- §2-D: no SQL-expressible oracle (driver rows-only check) ---
    "q_summary_approx" -> ((s, dir) => EventOps.summaryApprox(Tables.events(s, dir))),
    "q_percentile_approx" -> ((s, dir) => StatsOps.percentileApprox(Tables.events(s, dir))),
    "q_profile_approx" -> ((s, dir) => CorpusOps.profileApprox(Tables.documents(s, dir))),
    "q_compress_ratio" -> ((s, dir) =>
      TextOps.compressRatio(Tables.documents(s, dir))),
    "q_frame_sample" -> ((s, dir) => MultimodalOps.frameSample(
      Tables.documents(s, dir).withColumn(
        "payload", org.apache.spark.sql.functions.col("text").cast("binary"))))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * Aliases must match the Spark output exactly (driver hash-compares by
    * column name); every query has a deterministic ORDER BY on both sides.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventOps.oracles ++ StatsOps.oracles ++
      SessionOps.oracles ++ GeometryOps.oracles ++ DedupOps.oracles ++
      AnnOps.oracles ++ TextOps.oracles ++ MultimodalOps.oracles ++
      CorpusOps.oracles ++ Skew.oracles ++ BpeOps.oracles ++
      ClassifierOps.oracles ++ HtmlOps.oracles ++ UrlOps.oracles ++
      GraphOps.oracles ++ CrawlOps.oracles ++ AviOps.oracles ++
      PdfOps.oracles ++ Mp4Ops.oracles ++ Mp3Ops.oracles ++
      WebpOps.oracles ++ OggOps.oracles ++ MediaOps.oracles ++
      EpubOps.oracles
}
