"""SURVEY §2 operator inventory, grouped by family.

Importing this package registers every query key in the registry.

IMPORT ORDER IS THE BASE REGISTRY ORDER: the driver's correctness sweep
walks keys front-to-back under a fixed window (r1 and r2 each certified
exactly the first 50 registered keys), so ordering IS the certification
schedule. Since round 3, ``registry.all_specs()`` SELF-ROTATES this
base order on the accumulated CORRECTNESS_r*.json evidence — stale-ERR
keys first, never-swept keys next (in the import order below: cheapest
hash families lead, expensive iterative/streaming keys last so a budget
cut costs rows-only keys), already-certified keys at the back where a
re-sweep would certify nothing new. See ``registry._sweep_order``.
"""

from . import joins  # noqa: F401
from . import windows  # noqa: F401
from . import relational  # noqa: F401
from . import scalar_funcs  # noqa: F401
from . import time_windows  # noqa: F401
from . import udfs  # noqa: F401
from . import reshape  # noqa: F401
from . import aggregations  # noqa: F401  (6 keys re-flattened in r2 → re-certify)
from . import wave4  # noqa: F401  (r2 additions: cheap hash keys, 1 rows-only)
from . import wave5  # noqa: F401  (r2 additions: cheap hash keys, 1 rows-only)
from . import wave6  # noqa: F401  (r2 additions: cheap hash keys, 2 rows-only)
from . import wave7  # noqa: F401  (r2 additions: cheap hash keys, 1 rows-only)
from . import wave8  # noqa: F401  (r2 additions: cheap hash keys, 2 rows-only)
from . import wave11  # noqa: F401  (r2 additions: 4 cheap hash keys)
from . import wave12  # noqa: F401  (r2 additions: line dedup + BPE)
from . import wave13  # noqa: F401  (r2 additions: 4 cheap hash keys)
from . import text_extra  # noqa: F401
from . import llm_pipeline  # noqa: F401
from . import multimodal  # noqa: F401
from . import curation  # noqa: F401
from . import behavior  # noqa: F401
from . import flows_analytics  # noqa: F401
from . import dedup_extra  # noqa: F401
from . import ann  # noqa: F401
from . import wave10  # noqa: F401  (binary decode + SQL surface)
from . import wave14  # noqa: F401  (binary retrieval + dedup bake-off)
from . import wave16  # noqa: F401  (r4: sessionization, windowed funnel,
#   DQ rules, behavioral entropy — all cheap hash keys)
from . import wave17  # noqa: F401  (r4: k-anonymity, repeat-factor mixing,
#   SRM chi2, k-core peeling)
from . import wave18  # noqa: F401  (r4: unigram-LM tokenizer EM + ZCA
#   whitening — iterative/eigen rows-only keys, register late)
from . import wave19  # noqa: F401  (r4: interval-overlap join, ANOVA,
#   multiline-quoted CSV robustness)
from . import wave20  # noqa: F401  (r4: CUPED variance reduction +
#   freshness SLA)
from . import wave22  # noqa: F401  (r5: flow stitching, URL dedup, rank
#   stats, perplexity filter, DP release)
from . import wave23  # noqa: F401  (r5: spatial grid join, forecast
#   backtest, HLL intersection, grouped splits, vocab economics)
from . import wave24  # noqa: F401  (r5: mergeable quantile sketches,
#   bloom contamination screen, power analysis, feature hashing, Hill tail)
from . import wave25  # noqa: F401  (r5: k-center coreset, novelty curve,
#   NDCG, Benjamini-Hochberg FDR, flow traffic matrix)
from . import wave26  # noqa: F401  (r5: filter funnel, skew report,
#   incremental minhash, ANN recall report, cache reuse)
from . import wave27  # noqa: F401  (r5: SQL scripting, IDENTIFIER params,
#   listagg, keyword salience, try_* safety)
from . import wave28  # noqa: F401  (r5: LTTB downsampling, association
#   rules, WoE binning, raw-log parse, ANALYZE stats)
from . import wave29  # noqa: F401  (r5: canonical-doc selection,
#   silhouette, ratio delta method, port services, Neyman allocation)
from . import wave30  # noqa: F401  (r5: Spearman rho, regression eval,
#   feature scaling, circular time-of-day stats, Zipf slope)
from . import wave31  # noqa: F401  (r5: PPS-WOR sampling, Levene test,
#   lift/gains table, CUSUM drift, WordPiece encode)
from . import wave32  # noqa: F401  (r5: Theil decomposition, interarrival
#   profile, multi-class confusion, t-closeness, whole-file text scan)
from . import wave33  # noqa: F401  (r5: Wilcoxon signed-rank, Adamic-Adar,
#   rolling correlation, exporter dedup, compression-ratio filter)
from . import wave34  # noqa: F401  (r5: Wilson CI, frequency capping,
#   retrieval MRR, Benford screen, dedup threshold curve)
from . import wave35  # noqa: F401  (r5: Bollinger bands, sentence stats,
#   embedding-dimension screen, conversion latency, gzip CSV scan)
from . import wave36  # noqa: F401  (r5: JL projection, hour-dow heatmap,
#   runs test, DISTRIBUTE/SORT BY layout, cart abandonment)
from . import wave37  # noqa: F401  (r5: audience overlap, G-test, PACF,
#   pseudonymization, effect sizes)
from . import wave38  # noqa: F401  (r5: two-var OLS, retention matrix,
#   balanced downsample, phonetic blocking, price elasticity)
from . import wave39  # noqa: F401  (r5: decimal money, prefix rollup,
#   A/B contamination, Hampel filter, sketch calibration)
from . import wave40  # noqa: F401  (r5: recency scoring, generalization
#   ladder, Pareto 80/20, median-of-means, Jarque-Bera)
from . import wave41  # noqa: F401  (r5: EB shrinkage, SPRT, burstiness,
#   Brier decomposition, log histograms)
from . import wave42  # noqa: F401  (r5: NN matching, entity resolution,
#   cell suppression, growth accounting, CSV column drift)
from . import wave43  # noqa: F401  (r5: PMI collocations, 95th billing,
#   adoption curves, Mann-Kendall, dedup provenance)
from . import wave44  # noqa: F401  (r5: fixed-width scan, kv parse,
#   LSH S-curve, index rebase, elephant/mice)
from . import wave45  # noqa: F401  (r5: embedding drift, Breusch-Pagan,
#   scan taxonomy, seasonality strength, daily Gini)
from . import wave46  # noqa: F401  (r5: best send hour, Ljung-Box,
#   Hurst exponent, overlap duration, McNemar)
from . import wave47  # noqa: F401  (r5: readability, flow asymmetry,
#   deseasonalized anomalies, capture-recapture, Cochran-Armitage)
from . import wave48  # noqa: F401  (r5: Hodges-Lehmann, systematic
#   sampling, trimmed mean, Theil-Sen, dose-response)
from . import wave49  # noqa: F401  (r5: dynamic partition overwrite,
#   hapax ratio, sign test, distance histogram, Cohen's kappa)
from . import wave50  # noqa: F401  (r5: exact join cardinality, lang
#   divergence, shingle-size curve, Grubbs, block bootstrap)
from . import wave51  # noqa: F401  (r5: average precision, Friedman,
#   Durbin-Watson, repeat purchase, multi-measure unpivot)
from . import wave52  # noqa: F401  (r5: Tukey fences, MASE, one-sample t,
#   embedding anisotropy, lateral aliases)
from . import wave53  # noqa: F401  (r10: the §17.2 growth key —
#   nfdump extended filter primaries end-to-end; cheap hash key, so it
#   rides mid-list ahead of the stream_*/scans expensive tail)
from . import wave21  # noqa: F401  (r5: nfdump on-disk nffile-v2 decode +
#   its STREAMING source — hosts a stream_* lifecycle demo, so it rides
#   the expensive tail; RULE for future waves: any module registering a
#   stream_* key goes in this tail block, never mid-list)
from . import wave9  # noqa: F401  (hash keys + pricier rows-only demos
#   incl. the stream_state_reader full-lifecycle demo — rides the same
#   expensive tail as wave15/scans)
from . import wave15  # noqa: F401  (r3 additions: v9/IPFIX decode, IVF-PQ
#   training pipelines, streaming curation — the priciest integration keys
#   register LAST so a sweep budget cut costs them, not cheap hash keys;
#   wave15's cheap hash keys ride the same tail, which rotation still
#   reaches rounds before any re-certification)
from . import scans  # noqa: F401  (streaming queries at the very back:
#   the expensive StreamingQuery-lifecycle demos stay BEHIND every cheap
#   hash family in raw registration order — wave15 and scans re-moved
#   here when registry growth past 348 keys diluted their old mid-list
#   positions below the pinned 0.6 tail fraction)
