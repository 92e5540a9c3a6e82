"""Reusable operator library (SURVEY §7): composable column builders and
write-path helpers that the registered queries and user pipelines share.

    dedup      — MinHash-LSH / SimHash / n-gram-Jaccard near-dup building blocks
    mutation   — overwrite_matching & friends: UPDATE/UPSERT/DELETE emulation
                 over immutable storage (SURVEY §4 custom work #2)
    multimodal — mapInPandas decode/feature plumbing for binary media columns
"""
