"""Extension operators for large-scale training-data pipelines
(BASELINE.json north star): deduplication, similarity search, text
analysis, multimodal columns. All Catalyst-native compositions except
the multimodal decode plumbing (mapInPandas)."""
