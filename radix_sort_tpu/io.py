"""Columnar persistence: save/load Tables and sorted runs.

The reference has no checkpoint/resume at all (SURVEY.md §5 — its closest
artifact is benchmark capture files); a production query engine needs to
spill and reload columnar batches, so this module provides:

- save_table / load_table — one Table ↔ one .npz (column arrays + num_rows).
- BatchWriter / iter_batches — chunked spill of a stream of Tables to a
  directory, reloadable in order (the substrate for out-of-core sorts and
  shuffle spills in later rounds).

Format: plain numpy .npz — portable, mmap-able, no extra deps.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .table import Table

_META = "__num_rows__"


def save_table(table: Table, path: str) -> str:
    cols = {k: np.asarray(v) for k, v in table.columns.items()}
    cols[_META] = np.asarray([int(table.num_rows)], dtype=np.int64)
    np.savez(path if path.endswith(".npz") else path + ".npz", **cols)
    return path if path.endswith(".npz") else path + ".npz"


def load_table(path: str, device: bool = True) -> Table:
    with np.load(path) as z:
        num_rows = int(z[_META][0])
        cols = {k: z[k] for k in z.files if k != _META}
        if device:
            import jax.numpy as jnp

            cols = {k: jnp.asarray(v) for k, v in cols.items()}
        return Table(cols, num_rows=num_rows)


class BatchWriter:
    """Spill a sequence of Tables to numbered files in a directory."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self._count = 0

    def write(self, table: Table) -> str:
        path = os.path.join(self.directory, f"batch_{self._count:06d}.npz")
        save_table(table, path)
        self._count += 1
        return path

    def finish(self) -> str:
        manifest = os.path.join(self.directory, "manifest.json")
        with open(manifest, "w") as f:
            json.dump({"num_batches": self._count, "format": "npz-v1"}, f)
        return manifest


def iter_batches(directory: str, device: bool = True):
    manifest = os.path.join(directory, "manifest.json")
    with open(manifest) as f:
        meta = json.load(f)
    for i in range(meta["num_batches"]):
        yield load_table(os.path.join(directory, f"batch_{i:06d}.npz"),
                         device=device)
