"""Dedup-suite and similarity-search queries over documents/embeddings.
Filled in as the kernels land; see stages/neardup.py and
stages/similarity.py."""
from __future__ import annotations
