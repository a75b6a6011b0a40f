"""Consumer-side CSR assembly from the engine's ``csr_entries`` output.

The reference ships ``AbstractGraphBuilder`` (fscrawler/util/abstract_graph.py:
18-163; demo examples/demo_status_updates.py) — a consumer seam that receives
vertex/edge callbacks plus progress/status updates and materializes an
in-memory red-black CSR matrix. SURVEY.md §1.5 scopes CSR materialization to
the consumer, so the engine stops at the columnar (row, col, val) hand-off;
this example is that consumer: ONE Arrow transfer out of the JVM
(``DataFrame.toArrow``), then pure-numpy CSR assembly — no per-row Python
anywhere, and the optional ``progress``/``status`` callbacks mirror the
reference builder's reporting seam.

Run:  python examples/csr_consumer.py
"""

from __future__ import annotations

import numpy as np


def build_csr(entries, n_vertices: int | None = None, progress=None, status=None):
    """(row, col, val) adjacency-entry DataFrame -> CSR arrays.

    Returns ``(indptr, indices, data)`` — the standard CSR triple; wrap with
    ``scipy.sparse.csr_matrix((data, indices, indptr), shape=(n, n))`` when
    scipy is available (it is not required). ``progress(done, total)`` and
    ``status(msg)`` follow the reference's AbstractGraphBuilder callbacks.

    The Arrow transfer moves each partition as a columnar batch; for graphs
    too large for one driver, run this per ``position``-range slice instead
    (csr_entries rows are independent) and concatenate the indptr spans.
    """
    if status:
        status("collecting adjacency entries via Arrow")
    tbl = entries.toArrow()  # single columnar hand-off, no Row objects
    row = np.asarray(tbl.column("row").to_numpy(zero_copy_only=False), dtype=np.int64)
    col = np.asarray(tbl.column("col").to_numpy(zero_copy_only=False), dtype=np.int64)
    val = np.asarray(tbl.column("val").to_numpy(zero_copy_only=False), dtype=np.int64)
    n = (int(row.max()) + 1 if len(row) else 0) if n_vertices is None else n_vertices

    if status:
        status(f"assembling {n}x{n} CSR from {len(row)} entries")
    order = np.lexsort((col, row))
    row, col, val = row[order], col[order], val[order]
    counts = np.bincount(row, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    if progress:
        progress(len(row), len(row))
    return indptr, col.astype(np.int32), val.astype(np.int32)


def to_dense(indptr, indices, data, n: int):
    """Tiny-graph helper (tests/demos): CSR triple -> dense numpy matrix."""
    m = np.zeros((n, n), dtype=np.int64)
    for r in range(n):
        for j in range(indptr[r], indptr[r + 1]):
            m[r, indices[j]] = data[j]
    return m


def main() -> None:
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from fs_crawler_spark.operators.graph import csr_entries, with_positions
    from fs_crawler_spark.session import get_spark

    spark = get_spark(cores=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    vertices = spark.createDataFrame(
        [("V1", -1), ("V2", 1), ("V3", -1), ("V4", 0)],
        "id string, color int",
    )
    edges = spark.createDataFrame(
        [
            ("V1", "V2", "BiologicalParent", "E1"),
            ("V1", "V3", "UnspecifiedParentType", "E2"),
            ("V3", "V4", "BiologicalParent", "E3"),
        ],
        "source string, destination string, type string, id string",
    )
    vp = with_positions(vertices)
    indptr, indices, data = build_csr(
        csr_entries(vp, edges),
        n_vertices=4,
        progress=lambda done, total: print(f"progress: {done}/{total} entries"),
        status=print,
    )
    print("indptr :", indptr.tolist())
    print("indices:", indices.tolist())
    print("data   :", data.tolist())
    print(to_dense(indptr, indices, data, 4))


if __name__ == "__main__":
    main()
