"""Event-time windowed queries (batch-checkable analogs of the streaming
operators in streaming/). Populated as the operators land."""

from __future__ import annotations
