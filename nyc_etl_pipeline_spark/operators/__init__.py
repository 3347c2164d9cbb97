"""LLM-data-pipeline operators beyond the reference surface
(BASELINE.json north star): dedup (exact + near-dup), similarity
search, text analysis, multimodal column plumbing.

All hot paths are built-in Column expressions / higher-order functions
(JVM-side, whole-stage codegen) — no row-at-a-time Python. Pandas UDFs
appear only where semantics genuinely require Python (multimodal decode
stubs).
"""
