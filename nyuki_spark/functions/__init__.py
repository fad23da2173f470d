"""Column-level function library.

- :mod:`text`       — tokenization, quality scoring, language-ID heuristic,
  fingerprinting, simhash (LLM-pipeline text analysis).
- :mod:`transform`  — the reference's factory transform rules
  (extract/sub/set/unset/lookup) as Column combinators.
- :mod:`evaluate`   — the reference's safe condition DSL compiled to
  Column predicates.
- :mod:`multimodal` — opaque binary columns (image/audio/video) with typed
  metadata; decode/feature stubs over mapInPandas.
"""
