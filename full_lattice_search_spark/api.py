"""ES-style query DSL façade — the switch-over surface for reference users.

A reference deployment issues ``match_lattice`` queries as JSON bodies
(``GET index/_search``).  This module is the analog of the plugin's
XContent layer (``index/query/MatchLatticeQueryBuilder.java:376-452``
``fromXContent`` and the serializer behind
``MatchLatticeQueryBuilderTests.java:129-178`` goldens): the same JSON
bodies parse to the engine's ``MatchLatticeParams``, serialize back to the
reference's canonical long form, and run via ``search(...)`` which returns
an ES-shaped response (``hits.total/max_score/hits[]._id/_score``).

Field names, defaults, error messages, and the accepted-key set mirror the
reference parser (both spellings: a bare value short form or the full
parameter object; exactly one field per query).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame

from full_lattice_search_spark.config import LatticeConfig, MatchLatticeParams

NAME = "match_lattice"

# keys accepted inside the per-field object (fromXContent dispatch table)
_KNOWN_KEYS = {
    "query",
    "analyzer",
    "boost",
    "slop",
    "slop_seconds",
    "_name",
    "in_order",
    "include_span_score",
    "payload_function",
    "payload_length_norm_factor",
    "zero_terms_query",
}

_ANALYZERS = ("default", "keyword")


@dataclass(frozen=True)
class ParsedMatchLattice:
    field: str
    query: Any
    params: MatchLatticeParams
    analyzer: str | None = None
    query_name: str | None = None

    def to_dict(self) -> dict:
        """Canonical long-form body (the reference's doXContent order —
        golden at MatchLatticeQueryBuilderTests.java:136-150)."""
        inner: dict[str, Any] = {"query": self.query}
        if self.analyzer is not None:
            inner["analyzer"] = self.analyzer
        p = self.params
        inner.update(
            {
                "slop": p.slop,
                "slop_seconds": p.slop_seconds,
                "zero_terms_query": p.zero_terms_query.upper(),
                "in_order": p.in_order,
                "include_span_score": p.include_span_score,
                "payload_function": p.payload_function,
                "payload_length_norm_factor": p.payload_length_norm_factor,
                "boost": p.boost,
            }
        )
        if self.query_name is not None:
            inner["_name"] = self.query_name
        return {NAME: {self.field: inner}}


def parse_match_lattice(body: dict) -> ParsedMatchLattice:
    """Parse an ES-style ``match_lattice`` body (short or long form)."""
    if NAME not in body:
        raise ValueError(f"expected a [{NAME}] query body")
    spec = body[NAME]
    if not isinstance(spec, dict) or len(spec) == 0:
        raise ValueError(f"[{NAME}] requires fieldName")
    if len(spec) > 1:
        raise ValueError(
            f"[{NAME}] query doesn't support multiple fields, found "
            f"{sorted(spec)}"
        )
    (field, val), = spec.items()
    if field is None:
        raise ValueError(f"[{NAME}] requires fieldName")

    analyzer = None
    query_name = None
    kwargs: dict[str, Any] = {}
    if isinstance(val, dict):
        unknown = set(val) - _KNOWN_KEYS
        if unknown:
            raise ValueError(
                f"[{NAME}] query does not support [{sorted(unknown)[0]}]"
            )
        query = val.get("query")
        analyzer = val.get("analyzer")
        query_name = val.get("_name")
        if "slop" in val:
            kwargs["slop"] = int(val["slop"])
        if "slop_seconds" in val:
            kwargs["slop_seconds"] = float(val["slop_seconds"])
        if "in_order" in val:
            kwargs["in_order"] = bool(val["in_order"])
        if "include_span_score" in val:
            kwargs["include_span_score"] = bool(val["include_span_score"])
        if "payload_function" in val:
            kwargs["payload_function"] = str(val["payload_function"])
        if "payload_length_norm_factor" in val:
            kwargs["payload_length_norm_factor"] = float(
                val["payload_length_norm_factor"]
            )
        if "boost" in val:
            kwargs["boost"] = float(val["boost"])
        if "zero_terms_query" in val:
            z = str(val["zero_terms_query"])
            if z.lower() not in ("none", "all"):
                raise ValueError(f"Unsupported zero_terms_query value [{z}]")
            kwargs["zero_terms_query"] = z.lower()
    else:
        query = val
    if query is None:
        raise ValueError(f"[{NAME}] requires query value")
    if analyzer is not None and analyzer not in _ANALYZERS:
        raise ValueError(f"analyzer [{analyzer}] not found")
    return ParsedMatchLattice(
        field=str(field),
        query=query,
        params=MatchLatticeParams(**kwargs),
        analyzer=analyzer,
        query_name=query_name,
    )


def search(
    docs: DataFrame,
    body: dict,
    config: LatticeConfig | None = None,
    size: int = 10,
    doc_id_col: str = "doc_id",
    spans_col: str = "spans",
    similarity: str | None = None,
) -> dict:
    """Run an ES-style search body over an interleaved-documents table and
    return an ES-shaped response.

    The ``field`` in the body addresses the lattice-mapped field — in the
    engine's table model that is the ``spans`` column (single lattice field
    per table, like a single mapped field per index); pass ``spans_col`` to
    point elsewhere.

    ``similarity``: 'engine' | 'lucene' — the per-index similarity
    SETTING (in ES this lives in the index settings/mapping, not the
    query DSL, which is why it's a call argument rather than a body
    key).  'lucene' ranks with the reconstructed reference scoring
    (FIXTURES.md §6)."""
    import dataclasses

    from full_lattice_search_spark.operators.match import match_lattice

    parsed = parse_match_lattice(body)
    if similarity is not None:
        parsed = dataclasses.replace(
            parsed,
            params=dataclasses.replace(parsed.params, similarity=similarity),
        )
    t0 = time.time()
    # Collect one row beyond `size`: if it exists, the corpus has more
    # matches than the page and the ES contract requires relation 'gte'
    # rather than asserting the page length as the exact total.
    # a list-shaped query is a multi-phrase slot list — pass through
    # untouched (str() would flatten it into analyzable text)
    query = (
        parsed.query
        if isinstance(parsed.query, list)
        else str(parsed.query)
    )
    overfetch = match_lattice(
        docs,
        query,
        config or LatticeConfig(),
        parsed.params,
        top_k=size + 1,
        doc_id_col=doc_id_col,
        spans_col=spans_col,
        query_analyzer=parsed.analyzer or "default",
    ).collect()
    took_ms = int((time.time() - t0) * 1000)
    truncated = len(overfetch) > size
    hits = overfetch[:size]
    return {
        "took": took_ms,
        "timed_out": False,
        "hits": {
            "total": {
                "value": len(hits),
                "relation": "gte" if truncated else "eq",
            },
            "max_score": max((r["score"] for r in hits), default=None),
            "hits": [
                {
                    "_id": r["doc_id"],
                    "_score": r["score"],
                    "_source": {"n_spans": r["n_spans"]},
                }
                for r in hits
            ],
        },
    }
