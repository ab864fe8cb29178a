"""galago_git_spark — a brand-new PySpark-native full-text index + retrieval
engine with the capabilities of the Galago structured search engine
(reference: jjfiv/galago-git, surveyed in SURVEY.md).

This is NOT a port: Galago's TupleFlow dataflow and document-at-a-time Java
iterator trees are re-expressed as Spark DataFrame plans (Catalyst-optimized
scans, shuffles, broadcast joins) plus vectorized numpy/pandas kernels for
the parts Spark lacks natively (delta+vbyte posting codec, block-max WAND
top-k).

Layout
------
- ``sources``   : corpus readers + deterministic synthetic corpus generators
- ``functions`` : tokenization and scalar text functions (vectorized)
- ``index``     : index build pipeline (postings/lengths/names/stats tables),
                  delta+vbyte codec, packed posting blocks, lineage/resume
- ``query``     : Galago query-language parser, rewrite traversals, scoring
                  formulas, and the top-k execution engines (relational
                  brute-force and block-max WAND kernel)
- ``operators`` : training-data-pipeline operators (dedup, similarity search,
                  text analysis) as first-class DataFrame ops
- ``plans``     : query AST -> physical plan compilation
"""

__version__ = "0.1.0"
