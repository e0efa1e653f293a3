"""Custom stateful streaming operators (applyInPandasWithState).

Spark's native streaming ops cover windowed aggregation, session
windows and dropDuplicates; a *running per-group budget* — keep
accepting a source's documents until its token budget is exhausted,
forever after dropping that source's arrivals — needs custom keyed
state. That is the per-domain cap step of a crawl-curation pipeline
(bound each domain's contribution to the training mix regardless of
how many micro-batches its documents arrive in).

``stream_source_cap`` keeps, per group, the documents lying inside the
first ``cap`` tokens of the group's ordered input stream: state is the
cumulative INPUT token count consumed so far; each micro-batch sorts
its group slice by ``id_col`` (deterministic within a batch; batches
arrive in stream order), computes the running total vectorized, and
keeps the rows whose cumulative position fits. Dropped rows still
consume budget — the cap is a window over the stream, not a best-fit
packing — so the decision for every row is independent of later
arrivals and the operator is deterministic and restart-safe (state
checkpoints with the query).

Everything per batch is pandas/numpy over the group's slice; no
per-row Python. State schema: a single ``consumed long``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def stream_source_cap(
    stream_df: DataFrame,
    cap: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    count_col: str = "n_tok",
) -> DataFrame:
    """Cap each group's accepted documents at ``cap`` cumulative input
    tokens across the whole stream. Returns the kept rows with the
    input schema (append output mode).
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    for c in (group_col, id_col, count_col):
        if c not in stream_df.columns:
            raise ValueError(f"column {c!r} not in stream DataFrame")
    out_schema = stream_df.schema
    state_schema = "consumed long"

    def fn(key, pdf_iter, state):
        consumed = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values(id_col, kind="mergesort")
            cum = pdf[count_col].astype("int64").cumsum()
            keep = pdf[consumed + cum <= cap]
            consumed += int(cum.iloc[-1]) if len(cum) else 0
            if len(keep):
                yield keep
        state.update((consumed,))

    return (
        stream_df.groupBy(group_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
