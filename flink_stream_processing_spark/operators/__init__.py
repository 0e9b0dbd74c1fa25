"""Operator library — one module per SURVEY.md §2 group.

- ``window_metrics`` : flagship tumbling-window aggregate (A1-A5)
- ``risk``           : per-event risk labeling + format-string sink prep (P2, P3)
- ``json_ops``       : JSON parse/serialize between operators (P1, P4, P5)
- ``relational``     : capability-parity relational core (§2.6)
- ``dedup``          : exact + fuzzy deduplication (LLM extension)
- ``similarity``     : embedding similarity search (LLM extension)
- ``text``           : text analysis — lang-id, quality, tokens, fingerprints
- ``multimodal``     : binary-column plumbing for image/audio/video payloads
- ``clustering``     : distributed k-means (full Lloyd's loop)
- ``graph``          : pagerank, triangle counts
- ``pq``             : product quantization (codebook train/encode/ADC)
- ``setsim``         : exact set-similarity joins
- ``temporal``       : as-of/SCD2/interval temporal operators
- ``bloom``          : mergeable Bloom-filter state (lossless shard merge)
- ``sampling``       : mergeable weighted reservoir (A-Res shard merge)
- ``histogram``      : mergeable bounded-domain histogram (quantile store)
"""
