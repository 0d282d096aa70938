"""Scoped DataFrame staging: persist a multi-consumer subtree while keeping
cache usage bounded across repeated invocations.

`stage_scoped(df, scope)` persists `df` and unpersists whatever the SAME
scope staged on a previous call — so a long-lived session (the driver's
oracle harness iterating every contract query, a notebook re-running an
operator) holds at most ONE staged cache pair per scope instead of leaking
one per call. Within a single query execution the cache serves all
consumers of the subtree; the next invocation of that operator releases it.

At 100 TB the same role is played by a bucketed intermediate TABLE write
(explicit lifecycle), not executor cache — this helper is the local-session
equivalent with the lifecycle made explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_STAGED: dict[str, list[DataFrame]] = {}


def stage_scoped(df: DataFrame, scope: str) -> DataFrame:
    for prev in _STAGED.pop(scope, []):
        try:
            prev.unpersist()
        except Exception:
            pass  # session may be gone; nothing to release
    df = df.persist()
    _STAGED[scope] = [df]
    return df


def release(scope: str | None = None) -> None:
    """Explicitly unpersist one scope (or all scopes)."""
    scopes = [scope] if scope is not None else list(_STAGED)
    for sc in scopes:
        for prev in _STAGED.pop(sc, []):
            try:
                prev.unpersist()
            except Exception:
                pass
