"""Shared token model for every text/dedup operator, in both dialects.

Registration-free by design: modules that only need the token
expressions (operators/jaccard.py, operators/dedup.py) can import them
without pulling in another module's operator registrations — the
registration ORDER in ``uforwarder_spark/__init__`` is what decides
which keys land inside the driver's correctness window.

    tokens := non-empty pieces of lower(text) split on [^a-z0-9]+
"""

from __future__ import annotations

# Spark / DuckDB dialect twins for the shared token expression.
TOKENS_SPARK = "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')"
TOKENS_DUCK = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "on", "for", "with"]
SW_SPARK = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
SW_DUCK = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
