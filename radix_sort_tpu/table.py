"""Columnar batch abstraction — HBM-resident tables.

The reference's data model is a single key vector plus a (vestigial)
permutation vector in ``HostBuffers``/``ComputeDeviceData``
(``src/HostData.h:16-64``, ``src/ComputeDeviceData.h:12-28``).  The engine
generalizes this to a named-column batch over which the operator set (sort,
filter, aggregate, join) runs — the "columnar batches over HBM" demanded by
the north star (BASELINE.json).

Design for XLA: a Table has a *static* row capacity (the physical array
length, known at trace time) and a *dynamic* ``num_rows`` (an int32 scalar
array), so operators with data-dependent output sizes (filter, aggregate,
join) stay shape-static under jit.  Rows at index >= num_rows are padding and
must be ignored; :meth:`to_numpy` slices them off at the host boundary.

Table is a registered pytree, so it flows through jit/vmap/shard_map.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .status import EngineError, OperationStatus


@jax.tree_util.register_pytree_node_class
class Table:
    """An immutable batch of named, equal-length 1-D device columns."""

    def __init__(self, columns: Mapping[str, jnp.ndarray],
                 num_rows: jnp.ndarray | int | None = None):
        if not columns:
            raise EngineError(OperationStatus.HOST_BUFFERS_FAILED,
                              "Table needs at least one column")
        cols = dict(columns)
        lengths = {c.shape[0] for c in cols.values()}
        if len(lengths) != 1:
            raise EngineError(OperationStatus.HOST_BUFFERS_FAILED,
                              f"ragged columns: lengths {sorted(lengths)}")
        for name, c in cols.items():
            if c.ndim != 1:
                raise EngineError(OperationStatus.HOST_BUFFERS_FAILED,
                                  f"column {name!r} must be 1-D")
        self.columns = cols
        self._capacity = next(iter(lengths))
        if num_rows is None:
            num_rows = self._capacity
        self.num_rows = jnp.asarray(num_rows, dtype=jnp.int32)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        names = tuple(sorted(self.columns))
        children = tuple(self.columns[n] for n in names) + (self.num_rows,)
        return children, names

    @classmethod
    def tree_unflatten(cls, names, children):
        obj = object.__new__(cls)
        obj.columns = dict(zip(names, children[:-1]))
        obj.num_rows = children[-1]
        caps = [c.shape[0] for c in obj.columns.values()
                if hasattr(c, "shape") and len(getattr(c, "shape", ())) == 1]
        obj._capacity = caps[0] if caps else 0
        return obj

    # -- accessors ---------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self._capacity

    @property
    def column_names(self):
        return tuple(sorted(self.columns))

    def column(self, name: str) -> jnp.ndarray:
        return self.columns[name]

    def __getitem__(self, name: str) -> jnp.ndarray:
        return self.columns[name]

    def with_columns(self, **new_cols) -> "Table":
        cols = dict(self.columns)
        cols.update(new_cols)
        return Table(cols, self.num_rows)

    def select(self, names) -> "Table":
        return Table({n: self.columns[n] for n in names}, self.num_rows)

    def valid_mask(self) -> jnp.ndarray:
        """Boolean mask of real (non-padding) rows."""
        return jnp.arange(self._capacity, dtype=jnp.int32) < self.num_rows

    def head(self, n: int) -> "Table":
        """First min(n, num_rows) rows (LIMIT n).  ``n`` is static, so the
        capacity shrinks to n — a static slice, jit-safe."""
        if n < 0:
            raise EngineError(OperationStatus.HOST_BUFFERS_FAILED,
                              f"head(n) needs n >= 0, got {n}")
        if n >= self._capacity:
            return Table(dict(self.columns), self.num_rows)
        return Table({k: v[:n] for k, v in self.columns.items()},
                     jnp.minimum(self.num_rows, n))

    # -- host boundary -----------------------------------------------------
    @classmethod
    def from_numpy(cls, columns: Mapping[str, np.ndarray]) -> "Table":
        return cls({k: jnp.asarray(v) for k, v in columns.items()})

    def to_numpy(self) -> dict:
        n = int(self.num_rows)
        return {k: np.asarray(v)[:n] for k, v in self.columns.items()}

    def __repr__(self):
        cols = ", ".join(f"{k}:{v.dtype}" for k, v in sorted(self.columns.items()))
        return f"Table[{cols}; capacity={self._capacity}]"
