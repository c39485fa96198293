"""Query modules self-register into the registry on import."""

from __future__ import annotations

_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    # Imports are for registration side effects.
    from pangenomesasgraphdatabases_spark.queries import (  # noqa: F401
        flagship,
        relational,
        windows_q,
        functions_q,
        similarity_q,
        text_q,
        vectors_q,
        events_q,
        graph_q,
        analytics_q,
        sources_q,
        sql_surface_q,
    )

    _LOADED = True
