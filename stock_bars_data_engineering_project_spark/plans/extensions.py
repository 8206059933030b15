"""Scale-extension queries: dedup, similarity search, text analysis,
multimodal plumbing (BASELINE.json north star — beyond the reference's own
surface). Populated as the operators land."""

from __future__ import annotations
