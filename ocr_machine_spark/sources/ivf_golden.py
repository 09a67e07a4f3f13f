"""Golden k-means statistics for the ivf_train oracle twin.

k-means is iterative — not expressible as one DuckDB query — so the twin
follows the repo's committed-golden pattern (sources/dedup_golden.py, the
XXH64 signatures; sources/pages.py golden_parquet, the extraction goldens):
an INDEPENDENT pure-numpy reimplementation of the spec computes the expected
final-iteration statistics per known corpus and persists them as parquet; the
DuckDB twin is then a plain SELECT keyed by a corpus fingerprint it computes
itself from the embeddings table (md5 over the fixed-point e6 rendering of
every element in (vec_id, ordinal) order — see _corpus_fp / the twin SQL in
__spark_entry__, prototyped to agree byte-for-byte).

Spec parity notes (must match operators/similarity.py ivf_train exactly):
* init centroids: vectors with ``vec_id < k``, ascending id order;
* assignment: cosine with sequential (cumsum) summation; ties -> lowest cell
  id (argmax-first over ascending cids);
* stats: per-element fixed-point ``floor(x*scale + 0.5)`` int64, exact sums;
* means between iterations: ``sum_e6 / (scale * n)`` in exact-int Python
  division (correctly-rounded double);
* output: LAST iteration's (cell, pos, sum_e6, n).
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np

_SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


def _corpus_fp(mat: np.ndarray) -> str:
    """md5 over floor(x*1e6+0.5) of every element, rows in vec_id order —
    byte-identical to the DuckDB twin's string_agg fingerprint."""
    e6 = np.floor(mat * 1e6 + 0.5).astype(np.int64)
    return hashlib.md5(",".join(str(x) for x in e6.reshape(-1)).encode()).hexdigest()


def kmeans_stats_py(
    ids: np.ndarray, mat: np.ndarray, k: int, iters: int, scale: int
) -> list[tuple[int, int, int, int]]:
    """(cell, pos, sum_e, n) rows of the last iteration — the numpy twin of
    ivf_train (sequential-order cosines via cumsum, exact int64 stats)."""
    sel = ids < k
    order = np.argsort(ids[sel])
    cids = ids[sel][order].astype(np.int64)
    cmat = mat[sel][order].astype(np.float64)

    rows: list[tuple[int, int, int, int]] = []
    for _ in range(iters):
        cn = np.array([_seq_l2(c) for c in cmat])
        vn = np.sqrt(np.cumsum(mat * mat, axis=1)[:, -1])
        sims = np.cumsum(mat[:, None, :] * cmat[None, :, :], axis=2)[:, :, -1] / (
            vn[:, None] * cn[None, :]
        )
        cell = cids[np.argmax(sims, axis=1)]
        e = np.floor(mat * scale + 0.5).astype(np.int64)
        rows = []
        next_cids, next_cent = [], []
        for ci in np.unique(cell):
            members = e[cell == ci]
            sums = members.sum(axis=0)
            n = len(members)
            rows.extend((int(ci), p, int(sums[p]), n) for p in range(mat.shape[1]))
            next_cids.append(int(ci))
            next_cent.append([int(s) / (scale * n) for s in sums])
        cids = np.array(next_cids, dtype=np.int64)
        cmat = np.array(next_cent, dtype=np.float64)
    return rows


def _seq_l2(vec: np.ndarray) -> float:
    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def ivf_golden_parquet(
    sf_dirs: tuple[str, ...] = _SF_DIRS,
    k: int = 8,
    iters: int = 2,
    scale: int = 1_000_000,
    base_dir: str = "/tmp/ocr_machine_spark_goldens",
) -> str:
    """Parquet of (corpus_fp, cell, pos, sum_e6, n) covering every sf dir the
    gates use. Built once, atomic write."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tag = hashlib.md5(f"{'|'.join(sf_dirs)}|{k}|{iters}|{scale}".encode()).hexdigest()[:8]
    path = os.path.join(base_dir, f"ivf_goldens_v1_{tag}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(base_dir, exist_ok=True)

    fps, cells, poss, sums, ns = [], [], [], [], []
    for d in sf_dirs:
        tbl = pq.read_table(os.path.join(d, "embeddings.parquet"), columns=["vec_id", "embedding"])
        ids = np.array(tbl.column("vec_id").to_pylist(), dtype=np.int64)
        mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        fp = _corpus_fp(mat)
        for cell, pos, s, n in kmeans_stats_py(ids, mat, k, iters, scale):
            fps.append(fp)
            cells.append(cell)
            poss.append(pos)
            sums.append(s)
            ns.append(n)
    out = pa.Table.from_pydict(
        {"corpus_fp": fps, "cell": cells, "pos": poss, "sum_e6": sums, "n": ns},
        schema=pa.schema(
            [
                ("corpus_fp", pa.string()),
                ("cell", pa.int64()),
                ("pos", pa.int64()),
                ("sum_e6", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(out, tmp)
    os.replace(tmp, path)
    return path
