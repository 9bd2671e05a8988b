"""quantitative_database_and_visualization_platform_spark.

A brand-new PySpark-native analytics engine with the query and
data-processing capabilities of the reference quant platform
(Wangrzwrz/Quantitative-database-and-visualization-platform): relational
analytics (joins, rollups, top-k), per-stock time-series window operators,
cross-sectional operators, the Alpha101 factor pipeline, plus
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Architecture: everything is declared with the DataFrame / Spark SQL API so
Catalyst handles pushdown, pruning, join strategy and AQE; Python only
builds the logical plan. Pandas UDFs (`applyInPandas`) are used solely for
genuinely recursive semantics (EMA family).

Layers (see SURVEY.md §7):
  sources/    - table catalog, CSV/encoding ingest, lakehouse write
                conventions, compaction
  operators/  - time-series, cross-sectional, relational operator library
  functions/  - scalar expression helpers (parsing, codes, money text)
  factors/    - daily-bar panel, technical / momentum / value suites,
                recursive EMA family, Alpha101 P1-P5 pipeline
  pipeline/   - LLM-data ops: dedup (exact/MinHash-LSH/SimHash), text
                analysis, embedding ANN, multimodal binary plumbing
  plans/      - the named analytical queries + DuckDB oracle SQL registry
  streaming/  - tick->bar structured streaming (watermarked event time)
"""

__version__ = "0.1.0"
