"""Training-data pipeline catalog queries (dedup / similarity / text
analysis / multimodal) over the ``documents`` and ``embeddings`` tables.
Filled in alongside operators/{dedup,similarity,textstats}.py."""

from __future__ import annotations
