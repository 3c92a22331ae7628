"""Extension operator catalog entries: dedup, similarity search, text
analysis, multimodal (BASELINE.json north-star ops).  Populated by the
operator modules; importing this module registers them."""

from __future__ import annotations

# Registration happens at import time in each module.
# (modules are added here as they are implemented)
