"""Large-scale training-data pipeline operators.

Beyond the reference's ETL surface (BASELINE.json north star): exact and
near deduplication, similarity search over embeddings, text analysis, and
multimodal binary-column plumbing — all expressed as DataFrame
transformations that scale horizontally (no driver-side loops, no
row-at-a-time Python in hot paths).
"""

from onetl_spark.llm import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
