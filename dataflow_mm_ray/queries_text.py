"""Text-analysis queries over the documents table (rule filter, language
ID, quality scoring, token counting, fingerprinting). Filled in as the
kernels land; see functions/."""
from __future__ import annotations
