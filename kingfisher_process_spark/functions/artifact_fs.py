"""Filesystem listing seam for the persisted artifact families.

Every artifact read that needs to LIST state — the ANN index
(``ann_index.py``), the BM25 inverted index (``text_index.py``), the
sketch store (``sketch_store.py``, via the shared tree helpers), and
the LSH bucket history (``dedup.incremental_lsh_step``) — goes through
the three functions here instead of calling ``glob`` directly. The
local filesystem is an implementation detail: an object-store port
(SCALE.md §6) swaps THIS module for a prefix-listing client (e.g. an
S3 ``ListObjectsV2`` pager keyed on the same ``cell=`` / ``*.parquet``
/ ``.compact_trash-`` name shapes) without touching any family's
logic. Results are sorted so callers are deterministic regardless of
the backing store's enumeration order.

The WRITE side (rename/exchange/rmtree) intentionally stays with the
families — atomic publish needs store-specific primitives (renameat2
locally, copy+delete or manifest commits on an object store) that the
staged-swap helpers already isolate.
"""

from __future__ import annotations

import glob as _glob
import os


def list_parquet(d: str) -> list[str]:
    """Parquet data files directly under ``d`` (no recursion)."""
    return sorted(_glob.glob(os.path.join(d, "*.parquet")))


def list_cell_dirs(tree_dir: str) -> list[str]:
    """``cell=*`` partition directories of a cell-partitioned tree."""
    return sorted(_glob.glob(os.path.join(tree_dir, "cell=*")))


def list_trash_dirs(tree_dir: str) -> list[str]:
    """Crash-stranded ``.compact_trash-*`` dirs owed to deletion."""
    return sorted(_glob.glob(os.path.join(tree_dir, ".compact_trash-*")))
