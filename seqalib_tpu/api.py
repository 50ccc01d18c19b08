"""Public alignment API.

``align``: one pair.  ``align_batch``: many pairs through the bucketed
dispatcher (SURVEY.md §3.2).  Sequences may be strings (DNA by default,
protein when the scoring uses a substitution matrix sized for proteins)
or pre-encoded uint8 code arrays.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .types import (
    PROTEIN_SIZE,
    AlignConfig,
    AlignResult,
    ScoringParams,
    encode_dna,
    encode_protein,
)


def _coerce(seq, sp: ScoringParams) -> np.ndarray:
    if isinstance(seq, np.ndarray):
        if seq.dtype != np.uint8:
            return seq.astype(np.uint8)
        return seq
    if sp.matrix is not None and sp.matrix.shape[0] >= PROTEIN_SIZE:
        return encode_protein(seq)
    return encode_dna(seq)


def align(
    query,
    target,
    scoring: Optional[ScoringParams] = None,
    mode: str = "global",
    band: Optional[int] = None,
    backend: str = "xla",
) -> AlignResult:
    """Align one query/target pair and return score, coords, CIGAR."""
    sp = scoring if scoring is not None else ScoringParams.linear()
    cfg = AlignConfig(mode=mode, band=band, backend=backend)
    q = _coerce(query, sp)
    t = _coerce(target, sp)

    if cfg.backend == "oracle":
        from .oracle import align_oracle

        return align_oracle(q, t, sp, mode=cfg.mode, band=cfg.band)

    if cfg.backend in ("xla", "pallas"):
        res = align_batch(
            [q], [t], scoring=sp, mode=cfg.mode, band=cfg.band, backend=cfg.backend
        )
        return res[0]

    raise ValueError(f"unknown backend {cfg.backend!r}")


def align_batch(
    queries: Sequence,
    targets: Sequence,
    scoring: Optional[ScoringParams] = None,
    mode: str = "local",
    band: Optional[int] = None,
    backend: str = "pallas",
    traceback: bool = True,
    mesh=None,
) -> List[AlignResult]:
    """Align pairs[i] = (queries[i], targets[i]) through the batched
    length-bucketed dispatcher (device-parallel when a mesh is given)."""
    sp = scoring if scoring is not None else ScoringParams.linear()
    qs = [_coerce(q, sp) for q in queries]
    ts = [_coerce(t, sp) for t in targets]
    if len(qs) != len(ts):
        raise ValueError("queries and targets must have equal length")

    if backend == "oracle":
        from .oracle import align_oracle

        return [align_oracle(q, t, sp, mode=mode, band=band) for q, t in zip(qs, ts)]

    from .parallel.dispatch import dispatch_batch

    return dispatch_batch(
        qs,
        ts,
        sp,
        mode=mode,
        band=band,
        backend=backend,
        traceback=traceback,
        mesh=mesh,
    )


def align_all_vs_all(
    queries: Sequence,
    references: Sequence,
    scoring: Optional[ScoringParams] = None,
    mode: str = "local",
    backend: str = "pallas",
    mesh=None,
    chunk_pairs: int = 4096,
):
    """All-vs-all alignment (BASELINE.json config 5): every query against
    every reference, streamed through the bucketed dispatcher in chunks
    (optionally shard_map'ed over a device mesh).

    Returns a dict of (n_queries, n_references) int32 arrays:
    score, qs, qe, ts, te.  Tracebacks are deliberately excluded at this
    scale; realign the hits you care about with `align`.
    """
    import itertools

    import numpy as np

    sp = scoring if scoring is not None else ScoringParams.linear()
    qs = [_coerce(q, sp) for q in queries]
    rs = [_coerce(r, sp) for r in references]
    nq, nr = len(qs), len(rs)
    fields = ("score", "qs", "qe", "ts", "te")
    out = {f: np.zeros((nq, nr), np.int32) for f in fields}

    # the (i, j) product is streamed lazily: at config-5 scale (10k x 1k =
    # 10M pairs) materializing the index list up front stalls in pure
    # Python before any kernel runs (VERDICT.md round-1 item 6)
    it = itertools.product(range(nq), range(nr))
    while True:
        chunk = list(itertools.islice(it, chunk_pairs))
        if not chunk:
            break
        res = align_batch(
            [qs[i] for i, _ in chunk],
            [rs[j] for _, j in chunk],
            scoring=sp,
            mode=mode,
            backend=backend,
            traceback=False,
            mesh=mesh,
        )
        for (i, j), r in zip(chunk, res):
            out["score"][i, j] = r.score
            out["qs"][i, j] = r.query_start
            out["qe"][i, j] = r.query_end
            out["ts"][i, j] = r.target_start
            out["te"][i, j] = r.target_end
    return out
