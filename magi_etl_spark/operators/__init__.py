"""Distributed operators the built-in DataFrame API doesn't ship directly:
the dedup family (exact, MinHash+LSH + persistent incremental index,
SimHash, n-gram, embedding, SemDeDup, paragraph-boilerplate,
sorted-neighborhood), similarity search (brute-force, SRP-LSH, IVF +
persistent partitioned index, PQ with exact refine), mixing & sampling
(weighted, temperature-scaled, splits, exact-n per group), text
analysis and ranking (quality, language-ID, PII scan/redaction,
unigram-LM scoring, BM25, TF-IDF, RRF fusion), decontamination
(n-gram + embedding-space), warehouse ETL (SCD2, CDC, upsert, gapfill,
rolling, profiling, expectations, incremental extract, backfill,
versioned tables), link analysis (connected components, PageRank,
degree-ordered triangle counting), behavior analytics (funnels, cohort
retention, Markov transitions, RFM, last-touch attribution),
drift/audit monitoring (PSI, MAD outliers, Benford screening),
closed-form statistics (grouped OLS, Wilson intervals, A/B z-tests,
mutual information, correlation matrices, concentration indices,
seasonal indices), mergeable sketches (KMV + set algebra, HLL,
Count-Min), embedding projection (JL), perceptual image hashing,
experimentation readouts (CUPED variance reduction, delta-method ratio
CIs, stratified log-rank, exact two-sample KS, exact group ROC-AUC /
Mann-Whitney, Cochran-Mantel-Haenszel stratified 2x2,
Benjamini-Hochberg FDR control), exact distributed order statistics
(histogram-narrowing selection), inverted-index retrieval and graded
ranking evaluation (NDCG@k), time-series autocorrelation, spatial
grid-blocked epsilon joins, and engine services (cardinality
estimation, skew tooling, z-order / bucketed layout).  Each is a
``DataFrame -> DataFrame`` composition of built-in ops (SURVEY.md §2
+ §2.14)."""
