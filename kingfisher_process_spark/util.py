"""Canonical JSON serialization + content hashing + decimal-faithful parsing.

The reference deduplicates JSON blobs by the MD5 of a canonical
serialization — sorted keys, compact ``,``/``:`` separators, decimals
rendered as plain JSON numbers (reference behavior: process/util.py:93-110,
``use_decimal=True``; numbers parsed as Decimal by ijson,
process/management/commands/file_worker.py:281,306).

Spark's built-in ``to_json``/``from_json`` would round-trip ``1.10`` through
a double and emit ``1.1`` — that breaks hash stability and byte fidelity
(SURVEY §7 watchlist #1). So payloads stay raw strings in the store, and the
canonical form is produced by this pure-Python serializer, applied inside
Arrow-batched Pandas UDFs.
"""

from __future__ import annotations

import hashlib
import json
import math
from decimal import Decimal
from typing import Any


def parse_json(text: str) -> Any:
    """Parse JSON preserving decimal literals exactly (1.10 stays Decimal('1.10'))."""
    return json.loads(text, parse_float=Decimal)


def _encode(obj: Any, out: list[str]) -> None:
    if obj is None:
        out.append("null")
    elif obj is True:
        out.append("true")
    elif obj is False:
        out.append("false")
    elif isinstance(obj, str):
        out.append(json.dumps(obj))  # exact escaping parity with json.dumps
    elif isinstance(obj, int):
        out.append(str(obj))
    elif isinstance(obj, Decimal):
        out.append(str(obj))  # '1.10' stays '1.10', like simplejson use_decimal
    elif isinstance(obj, float):
        if math.isnan(obj) or math.isinf(obj):
            raise ValueError(f"non-finite float not representable in JSON: {obj!r}")
        out.append(json.dumps(obj))  # shortest repr, like json.dumps
    elif isinstance(obj, dict):
        out.append("{")
        first = True
        for k in sorted(obj):
            if not isinstance(k, str):
                raise TypeError(f"non-string JSON key: {k!r}")
            if not first:
                out.append(",")
            first = False
            out.append(json.dumps(k))
            out.append(":")
            _encode(obj[k], out)
        out.append("}")
    elif isinstance(obj, (list, tuple)):
        out.append("[")
        for i, item in enumerate(obj):
            if i:
                out.append(",")
            _encode(item, out)
        out.append("]")
    else:
        raise TypeError(f"not JSON-serializable: {type(obj)}")


def canonical_json(obj: Any) -> str:
    """Deterministic canonical JSON: sorted keys, compact separators,
    decimals as numbers. The dedup hash input (process/util.py:98-100)."""
    out: list[str] = []
    _encode(obj, out)
    return "".join(out)


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def content_hash(obj: Any) -> str:
    """hash_md5 of a payload, as the reference computes it (process/util.py:93-110)."""
    return md5_hex(canonical_json(obj))


def strip_control_codes(raw: str) -> str:
    r"""Remove literal backslash-u-0-0-0-0 escape sequences before parsing.

    PostgreSQL rejects NUL escapes inside JSONB, so the reference filters
    the six-character sequence out of the byte stream pre-parse
    (file_worker.py:245-252). We keep the same semantics so hashes and
    stored payloads match.
    """
    return raw.replace("\\u0000", "")


MAX_JSON_BYTES = 268_435_455
"""Documents larger than this are skipped with an ERROR note — the
reference inherits the limit from PostgreSQL JSONB
(file_worker.py:132-144)."""


def walk_files(paths: list[str]) -> list[str]:
    """Expand a mixed list of file and directory paths into a sorted file
    list, recursing into directories and skipping dotfiles — the
    reference's directory-walk ingest source (process/util.py:30-38, used
    by commands/load.py:145-154). Explicit file paths pass through even
    when dot-named (matching the reference: the dotfile filter applies
    only to directory enumeration)."""
    import os

    out: list[str] = []
    for path in paths:
        if os.path.isfile(path):
            out.append(path)
        elif os.path.isdir(path):
            for root, dirs, files in os.walk(path):
                # prune hidden directories too (.git/.cache trees must not
                # be enumerated, let alone ingested)
                dirs[:] = [d for d in dirs if not d.startswith(".")]
                for name in files:
                    if not name.startswith("."):
                        out.append(os.path.join(root, name))
        else:
            raise FileNotFoundError(path)
    return sorted(out)
