"""Operator library — one module per SURVEY.md §2 group.

- ``window_metrics`` : flagship tumbling-window aggregate (A1-A5)
- ``risk``           : per-event risk labeling + format-string sink prep (P2, P3)
- ``json_ops``       : JSON parse/serialize between operators (P1, P4, P5)
- ``relational``     : capability-parity relational core (§2.6)
- ``dedup``          : exact + fuzzy deduplication (LLM extension)
- ``similarity``     : embedding similarity search (LLM extension)
- ``text``           : text analysis — lang-id, quality, tokens, fingerprints
- ``multimodal``     : binary-column plumbing for image/audio/video payloads
"""
